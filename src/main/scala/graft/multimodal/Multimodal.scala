package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque binary columns
  * with typed metadata. The DECODE step is a clearly-marked deterministic
  * STUB (the real image/audio codecs aren't in this container); everything
  * Spark-side — schema, batch shape, partition-preserving typed map,
  * feature-vector layout — is real and tested, so swapping a real decoder
  * in changes one function.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, modality: String, bytes: Array[Byte])
  case class DecodedRow(
      doc_id: Long, modality: String, byte_len: Int,
      width: Int, height: Int, n_frames: Int, features: Array[Float])

  /** STUB decoder — deterministic fake standing in for a real
    * image/audio/video decode (e.g. via javacv / a Pandas UDF in a PySpark
    * deployment). Width/height/frames derive purely from the byte content
    * so tests are reproducible; `features` is an 8-dim byte-histogram
    * sketch (a real pipeline would emit a model embedding here).
    */
  def stubDecode(r: MediaRow): DecodedRow = {
    val n = r.bytes.length
    // 64-bit arithmetic: n * 104729 overflows Int for payloads over ~20 KB
    // and Scala's % preserves sign, while the q30 DuckDB oracle evaluates
    // the same formula in 64-bit — so compute in Long, narrow at the end.
    val width = (16L + (n.toLong * 7919L) % 1024L).toInt
    val height = (16L + (n.toLong * 104729L) % 768L).toInt
    val frames = if (r.modality == "video") 1 + n % 32 else 1
    val feats = new Array[Float](8)
    var i = 0
    while (i < n) { feats(r.bytes(i) & 7) += 1f; i += 1 }
    if (n > 0) { var j = 0; while (j < 8) { feats(j) /= n; j += 1 } }
    DecodedRow(r.doc_id, r.modality, n, width, height, frames, feats)
  }

  /** Batch decode: typed partition-preserving map (no shuffle); the batch
    * shape (one partition = one decode task working set) is exactly what a
    * mapInPandas/mapInArrow deployment would see. */
  def decodeAll(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(stubDecode))
  }

  /** Frame sampling for "video" blobs: every strideth 256-byte window as a
    * fake frame — demonstrates the explode-side plumbing (frame rows carry
    * (doc_id, frame_idx, frame_bytes)) without a codec. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 4): DataFrame = {
    import media.sparkSession.implicits._
    media
      .filter(_.modality == "video")
      .flatMap { r =>
        val frameSize = 256
        val nFrames = math.max(r.bytes.length / frameSize, 1)
        (0 until nFrames by stride).map { f =>
          val from = math.min(f * frameSize, r.bytes.length)
          val until = math.min(from + frameSize, r.bytes.length)
          (r.doc_id, f, java.util.Arrays.copyOfRange(r.bytes, from, until))
        }
      }
      .toDF("doc_id", "frame_idx", "frame_bytes")
  }

  /** STUB resize — deterministic nearest-neighbor resample of the flat
    * payload to a `width`×`height` byte grid, standing in for a real image
    * resize (no codecs in this container). The Spark plumbing is the real
    * deployment shape: typed partition-preserving map, no shuffle, explicit
    * (doc_id, width, height, pixels) output schema sized w·h per row. */
  def resizeImages(media: Dataset[MediaRow], width: Int, height: Int): DataFrame = {
    require(width > 0 && height > 0 && width.toLong * height <= Int.MaxValue,
      s"target $width x $height must be positive and fit an Int pixel count")
    import media.sparkSession.implicits._
    media
      .filter(_.modality == "image")
      .map { r =>
        val out = new Array[Byte](width * height)
        val n = r.bytes.length
        if (n > 0) {
          var i = 0
          while (i < out.length) {
            out(i) = r.bytes((i.toLong * n / out.length).toInt)
            i += 1
          }
        }
        (r.doc_id, width, height, out)
      }
      .toDF("doc_id", "width", "height", "pixels")
  }

  /** Build a media table from documents: bytes = utf8(text) as the opaque
    * payload (deterministic; real tables carry actual media bytes). */
  def mediaFromDocs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
      col("text").cast("binary").as("bytes"))
}
