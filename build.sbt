ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "tracesspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// forked runMain output goes RAW to stdout (no sbt "[info]" prefix) so the
// driver can parse Bench's one-line JSON from the process output directly
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 16g default. History: 8g OOMs the 80M scale probe; 12g was fastest
  // under the pre-r6 GC geometry but a full bench run still heap-OOM'd
  // the 8M rollup leg ONCE this round (broadcast/cache residue after the
  // 165-query battery — the round-5-documented pressure class, fatal to
  // the whole artifact when it hits). Re-measured under G1 32 MiB
  // regions: 16g is within noise of 12g on the big legs (rollup 80M
  // 34.3 s vs 36.7 s, merge 200M 44.6 s vs 41.5 s) and buys the OOM
  // headroom; the periodicGC cleaner below drains the residue besides.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // Tungsten's TaskMemoryManager hands every sort/aggregate/window task
  // 8 MiB pages (maxMemory/cores/16 clamped); at 12g, G1 picks 4 MiB
  // regions, so EVERY page is a humongous allocation — BenchExtra stage
  // metrics showed run-time 5-10x cpu-time with "Retried waiting for
  // GCLocker" warnings (allocation stalls), e.g. q164's window stage:
  // 12.4 s summed run vs 1.4 s cpu across 32 tasks. 32 MiB regions put
  // the humongous threshold at 16 MiB, making task pages ordinary
  // region allocations (guide §5: look at what tasks hold in memory).
  s"-XX:G1HeapRegionSize=${sys.env.getOrElse("SPARK_GRAFT_G1_REGION", "32m")}",
  // Shuffle/spill directory on the fast local volume (guide §2.1: "local
  // disk bandwidth for shuffle files can be the tighter limit — check
  // both"; §6/§9: shuffle belongs on fast local disks). On this box the
  // root ext4 takes ~280 µs per file CREATE (multi-ms under 32-thread
  // journal contention) while tmpfs takes ~9 µs — and a 128-reduce-
  // partition stage with ~25 map tasks creates 3,200 shuffle files, so
  // thread dumps showed FileOutputStream.open0 as THE hot frame of every
  // exchange (~1 s/stage of pure file creation). Pointing spark.local.dir
  // at tmpfs removes that tax: measured q110 2.99→1.49 s, q164 3.78→1.60 s,
  // q108 3.55→1.46 s at sf0.1. Production analogue: local NVMe scratch for
  // shuffle, never a journaled network/root volume. Bench shuffle volume
  // (≤ a few GB at the 200M-row legs) is far under the 126 GiB tmpfs;
  // override with SPARK_GRAFT_LOCAL_DIR for disks-only environments.
  s"-Dspark.local.dir=${sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local")}",
  // Streaming temp checkpoints (q221) suffer the same many-small-files tax.
  // (java.io.tmpdir must exist; created below at build load.)
  s"-Djava.io.tmpdir=${sys.env.getOrElse("SPARK_GRAFT_TMPDIR", "/dev/shm/jvm-tmp")}",
  // Broadcast HashedRelations and cached blocks are reclaimed only when a
  // GC collects their weak refs and ContextCleaner reaps them; after a
  // 165-query battery the mostly-idle 12g heap can reach the next big
  // window sort with the pool still full (round-5 note; one heap-OOM of
  // the 8M rollup leg reproduced this round). A periodic driver GC keeps
  // the reference queue draining during long multi-query runs.
  "-Dspark.cleaner.periodicGC.interval=2min",
)
// the JVM does not create java.io.tmpdir (and Spark only mkdirs its own
// blockmgr subdirs) — ensure both roots exist before any forked run
Global / onLoad := {
  Seq(
    sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local"),
    sys.env.getOrElse("SPARK_GRAFT_TMPDIR", "/dev/shm/jvm-tmp"),
  ).foreach(p => new java.io.File(p).mkdirs())
  (Global / onLoad).value
}
