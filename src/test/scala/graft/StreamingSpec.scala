package graft

import graft.streaming.StreamingRollup
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {

  test("streaming hourly rollup over the events stream equals the batch aggregate") {
    val batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_type").as("key"), col("ts").cast("timestamp").as("ts"), col("value").as("v"))
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    batch.write.mode("overwrite").parquet(s"$dir/in")
    val src = spark.readStream.schema(batch.schema).parquet(s"$dir/in")

    val q = StreamingRollup
      .hourlyStats(src, "0 seconds")
      .writeStream.format("memory").queryName("hourly_out").outputMode("append").start()
    q.processAllAvailable(); q.stop()

    val got = spark.table("hourly_out")
      .select(col("key"), unix_micros(col("bin_start")).as("bin_start"), col("n_points"))
    val exp = batch
      .groupBy(col("key"), window(col("ts"), "1 hour")("start").as("bin_start"))
      .agg(count(lit(1)).as("n_points"))
      .select(col("key"), unix_micros(col("bin_start")).as("bin_start"), col("n_points"))
    // append-mode emission only covers windows closed by the final watermark;
    // with delay 0 everything before the max event time is emitted — compare
    // the emitted subset for equality and require substantial coverage
    assert(got.count() > 0, "streaming emitted nothing")
    assert(got.exceptAll(exp).isEmpty, "streaming rows disagree with batch")
    assert(got.count() >= exp.count() - 5 * 2, s"${got.count()} vs ${exp.count()}")
  }

  test("stateful carry-forward emits previous value per key") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream2").toString
    Seq(
      StreamingRollup.PointEvent("a", 1L, 1.0),
      StreamingRollup.PointEvent("a", 2L, 2.0),
      StreamingRollup.PointEvent("b", 1L, 5.0)).toDS()
      .write.mode("overwrite").parquet(s"$dir/in")
    val src = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[StreamingRollup.PointEvent]].schema)
      .parquet(s"$dir/in").as[StreamingRollup.PointEvent]
    val q = StreamingRollup.withPrevious(src)
      .writeStream.format("memory").queryName("carried_out").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("carried_out").as[StreamingRollup.Carried].collect()
      .map(c => (c.key, c.t, c.v, c.prev)).sortBy(x => (x._1, x._2))
    assert(got.toSeq == Seq(
      ("a", 1L, 1.0, None), ("a", 2L, 2.0, Some(1.0)), ("b", 1L, 5.0, None)))
  }
}
