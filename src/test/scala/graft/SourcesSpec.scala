package graft

import graft.sources.Sources
import org.apache.spark.sql.functions._

class SourcesSpec extends SparkSpec {

  test("from_csv parses the reference's default time format") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/ts.csv"),
      "time,watts\n2024-01-01 00:00:00,0\n2024-01-01 00:10:30,45\n2024-01-01 01:00:00,0\n")
    val df = Sources.fromCsv(spark, s"$dir/ts.csv", "time", "watts")
    val got = collectTVL(df)
    assert(got == Seq(
      (1704067200000000L, Some(0.0)),
      (1704067830000000L, Some(45.0)),
      (1704070800000000L, Some(0.0))))
  }

  test("from_json parses ISO-8601 with Z suffix; to_json round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/in.json"),
      """[{"time": "2024-01-01T00:00:00Z", "value": 1.5},
        | {"time": "2024-01-01T06:30:00Z", "value": 2.25}]""".stripMargin)
    val df = Sources.fromJson(spark, s"$dir/in.json")
    assert(collectTVL(df) == Seq(
      (1704067200000000L, Some(1.5)), (1704090600000000L, Some(2.25))))
    Sources.toJson(df, s"$dir/out")
    val back = Sources.fromJson(spark, s"$dir/out", multiLine = false)
    assert(collectTVL(back) == collectTVL(df))
  }

  test("from_csv/to_json transforms replace the default parses (timeseries.py:1178-1235,1358-1380)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_transforms").toString
    // epoch-SECONDS times and percent-suffixed values: neither parses with
    // the defaults; the transforms must take over completely
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/ts.csv"),
      "when,load\n1704067200,25%\n1704067830,50%\n")
    val df = Sources.fromCsv(spark, s"$dir/ts.csv", "when", "load",
      timeTransform = Some(c => c.cast("long") * 1000000L),
      valueTransform = Some(c => regexp_replace(c, "%$", "").cast("double") / 100.0))
    assert(collectTVL(df) == Seq(
      (1704067200000000L, Some(0.25)), (1704067830000000L, Some(0.5))))
    // export-side transforms: numeric epoch seconds (the docstring's
    // dt.timestamp() example) and re-scaled values; inverse pair reads back
    Sources.toJson(df, s"$dir/out",
      timeTransform = Some(c => c / 1000000L),
      valueTransform = Some(c => c * 100.0))
    val back = Sources.fromJson(spark, s"$dir/out", multiLine = false,
      timeTransform = Some(c => c.cast("long") * 1000000L),
      valueTransform = Some(c => c.cast("double") / 100.0))
    assert(collectTVL(back) == collectTVL(df))
  }
  test("WARC record build -> parse roundtrip; malformed records parse, not throw") {
    val s = spark
    import s.implicits._
    import graft.sources.Warc
    val df = Seq((7L, "https://d0.example.org/page/1", "<p>hello &amp; bye</p>"))
      .toDF("id", "uri", "payload")
      .select(col("id"), Warc.parseRecord(Warc.buildRecord(
        col("uri"), timestamp_micros(lit(1704067200000000L)), col("payload"))).as("w"))
      .select(col("id"), col("w.*"))
    val r = df.head()
    assert(r.getAs[String]("warc_type") == "response")
    assert(r.getAs[String]("uri") == "https://d0.example.org/page/1")
    assert(r.getAs[Long]("ts_us") == 1704067200000000L)
    assert(r.getAs[Long]("content_length") == 22L)
    assert(r.getAs[String]("payload") == "<p>hello &amp; bye</p>")
    // CRLF payload bytes survive framing: only the FIRST blank line splits
    val multi = Seq((1L, "a\r\n\r\nb")).toDF("id", "p")
      .select(Warc.parseRecord(Warc.buildRecord(
        lit("u"), timestamp_micros(lit(0L)), col("p"))).getField("payload"))
      .head().getString(0)
    assert(multi == "a\r\n\r\nb", multi)
    val bad = Seq((1L, "not a warc record")).toDF("id", "r")
      .select(Warc.parseRecord(col("r")).as("w")).select(col("w.*")).head()
    assert(bad.getAs[String]("warc_type") == "" && bad.isNullAt(bad.fieldIndex("ts_us")))
  }
  test("WARC: payload HTTP headers never leak into WARC fields; date is TZ-independent") {
    val s = spark
    import s.implicits._
    import graft.sources.Warc
    // payload is a full HTTP response with its own Content-Length; record
    // built WITHOUT relying on header order -- parse must read only the
    // block before the first blank line
    val httpPayload = "HTTP/1.1 200 OK\r\nContent-Length: 999\r\n\r\n<p>x</p>"
    val r = Seq(1L).toDF("id")
      .select(Warc.parseRecord(Warc.buildRecord(
        lit("u"), timestamp_micros(lit(1704067200000000L)), lit(httpPayload))).as("w"))
      .select(col("w.*")).head()
    assert(r.getAs[Long]("content_length") == httpPayload.length.toLong)
    assert(r.getAs[String]("payload") == httpPayload)
    // a truncated record missing its WARC Content-Length must yield null,
    // not the HTTP payload's 999
    val trunc = "WARC/1.0\r\nWARC-Type: response\r\n\r\n" + httpPayload
    val t = Seq(trunc).toDF("r").select(Warc.parseRecord(col("r")).as("w"))
      .select(col("w.*")).head()
    assert(t.isNullAt(t.fieldIndex("content_length")), t.toString)
    assert(t.getAs[String]("warc_type") == "response")
    // roundtrip is exact under a non-UTC session time zone
    val tzBefore = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val ny = Seq(1L).toDF("id")
        .select(Warc.parseRecord(Warc.buildRecord(
          lit("u"), timestamp_micros(lit(1704067200000000L)), lit("p"))).as("w"))
        .select(col("w.ts_us")).head().getLong(0)
      assert(ny == 1704067200000000L, ny.toString)
    } finally spark.conf.set("spark.sql.session.timeZone", tzBefore)
  }
}
