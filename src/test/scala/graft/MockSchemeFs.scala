package graft

/** A local-backed Hadoop FileSystem registered under the `mockfs:` scheme —
  * lets tests prove the checkpoint pipeline resolves storage purely through
  * the Hadoop FileSystem factory (no java.nio / `file:` assumptions). */
class MockSchemeFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("mockfs:///")
  override def getScheme: String = "mockfs"
}
