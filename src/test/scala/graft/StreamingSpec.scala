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

  test("streaming HLL registers equal the batch sketch; estimate carries over") {
    val batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_type").as("key"), col("ts").cast("timestamp").as("ts"),
        col("user_id").cast("string").as("u"))
    val dir = java.nio.file.Files.createTempDirectory("graft_hll_stream").toString
    batch.write.mode("overwrite").parquet(s"$dir/in")
    val src = spark.readStream.schema(batch.schema).parquet(s"$dir/in")
    val q = StreamingRollup.hllRegistersStream(src, "u", "0 seconds")
      .writeStream.format("memory").queryName("hll_out").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("hll_out")
      .select(col("key"), unix_micros(col("bin_start")).as("hour"),
        col("idx"), col("rho"))
    val exp = graft.sketch.Hll.registers(
      batch.select(col("key"),
        (unix_micros(col("ts")) - unix_micros(col("ts")) % 3600000000L).as("hour"),
        col("u")),
      Seq("key", "hour"), "u")
    assert(got.count() > 0, "streaming emitted nothing")
    // emitted register rows must be bit-identical to the batch sketch
    // (max is order-insensitive); append mode may withhold the final
    // unclosed hours, hence subset + coverage
    assert(got.exceptAll(exp).isEmpty, "streaming registers disagree with batch")
    assert(got.count() >= exp.count() - 512 * 5 * 2, s"${got.count()} vs ${exp.count()}")
    // the emitted rows feed the batch estimator unchanged: estimates on
    // any fully-emitted (key, hour) agree exactly
    val est = graft.sketch.Hll.estimate(got, Seq("key", "hour"))
      .withColumnRenamed("est_distinct", "e1").withColumnRenamed("n_regs", "n1")
    val bst = graft.sketch.Hll.estimate(exp, Seq("key", "hour"))
    val joined = est.join(bst, Seq("key", "hour"))
      .filter(col("n1") =!= col("n_regs") || col("e1") =!= col("est_distinct"))
    assert(joined.isEmpty, "estimates diverge on an emitted (key, hour)")
  }

  test("watermark drops late events: closed hourly windows never re-emit") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, java.sql.Timestamp, Double)]
    val src = mem.toDF().toDF("key", "ts", "v")
    val q = StreamingRollup.hourlyStats(src, "30 minutes")
      .writeStream.format("memory").queryName("late_out").outputMode("append").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // batch 1: two points in hour 0; one in hour 3 advances the watermark
    // to 02:30, closing and emitting the hour-0 window
    mem.addData(("k", ts("2024-01-01 00:10:00"), 1.0),
      ("k", ts("2024-01-01 00:40:00"), 2.0), ("k", ts("2024-01-01 03:00:00"), 3.0))
    q.processAllAvailable()
    // batch 2: a LATE hour-0 point (behind the watermark, must be dropped)
    // plus an hour-4 point that closes the hour-3 window
    mem.addData(("k", ts("2024-01-01 00:20:00"), 9.0),
      ("k", ts("2024-01-01 04:45:00"), 4.0))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("late_out")
      .select(date_format(col("bin_start"), "HH").cast("int").as("h"), col("n_points"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toList.sorted
    // hour 0 emitted ONCE with the 2 on-time points — the late 00:20 event
    // neither re-emits the window nor inflates the count; hour 3 emitted
    assert(rows.count(_._1 == 0) == 1 && rows.contains((0, 2L)), s"$rows")
    assert(rows.contains((3, 1L)), s"$rows")
  }

  test("streaming mergeSum equals the batch delta-form merge after compaction") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val rows = for {
      sid <- Seq("a", "b", "c")
      t <- Seq.fill(40)(rnd.nextInt(500).toLong).distinct
    } yield StreamingRollup.SidEvent("g", sid, t, if (rnd.nextInt(6) == 0) None else Some(rnd.nextInt(5).toDouble))
    val dir = java.nio.file.Files.createTempDirectory("graft_stream3").toString
    rows.toDS().write.mode("overwrite").parquet(s"$dir/in")
    val src = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[StreamingRollup.SidEvent]].schema)
      .parquet(s"$dir/in").as[StreamingRollup.SidEvent]
    val q = StreamingRollup.mergeSumStream(src)
      .writeStream.format("memory").queryName("merged_out").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    // resolve the upsert stream (last seq wins per (key, t)), then compact
    // like batch mergeSum does
    val resolved = spark.table("merged_out")
      .groupBy(col("key"), col("t"))
      .agg(max_by(col("v"), col("seq")).as("v"))
    val got = collectTV(graft.core.SeriesOps.compact(resolved))
    val batchIn = rows.map(e => ("g", e.sid, e.t, e.v.map(Double.box).orNull.asInstanceOf[java.lang.Double]))
      .toDF("key", "sid", "t", "v").withColumn("v", col("v").cast("double"))
    val exp = collectTV(graft.merge.MergeOps.mergeSum(batchIn, strict = false))
    approxEq(got, exp, 1e-9)
  }

  test("same-t transitions straddling a batch boundary resolve by seq upsert") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream5").toString
    // two parquet files + maxFilesPerTrigger=1 => two micro-batches, both
    // carrying a transition at the SAME event time t=10
    Seq(StreamingRollup.SidEvent("g", "a", 10L, Some(1.0))).toDS()
      .coalesce(1).write.parquet(s"$dir/in/f1")
    Seq(StreamingRollup.SidEvent("g", "b", 10L, Some(2.0))).toDS()
      .coalesce(1).write.parquet(s"$dir/in/f2")
    val src = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[StreamingRollup.SidEvent]].schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(s"$dir/in").as[StreamingRollup.SidEvent]
    val q = StreamingRollup.mergeSumStream(src)
      .writeStream.format("memory").queryName("upsert_out").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("upsert_out").as[StreamingRollup.MergedPoint]
      .collect().sortBy(_.seq).toSeq
    // both emissions present (append mode cannot retract)...
    assert(rows.map(r => (r.t, r.v)) == Seq((10L, 1.0), (10L, 3.0)), rows.toString)
    // ...and the upsert resolution yields the single corrected point
    val resolved = spark.table("upsert_out")
      .groupBy(col("key"), col("t")).agg(max_by(col("v"), col("seq")).as("v"))
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(resolved == Seq((10L, 3.0)), resolved.toString)
  }

  test("cross-batch late event repairs within lateness, fails loudly beyond it") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // (a) repair: batch 2 delivers t=15 AFTER batch 1 reached t=30; with
    // allowedLatenessUs=25 the buffered suffix is replayed and every
    // affected time re-emits corrected (upsert by seq)
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[StreamingRollup.SidEvent]
    val q = StreamingRollup.mergeSumStream(mem.toDS(), allowedLatenessUs = 25L)
      .writeStream.format("memory").queryName("repair_out").outputMode("append").start()
    mem.addData(
      StreamingRollup.SidEvent("g", "a", 10L, Some(1.0)),
      StreamingRollup.SidEvent("g", "a", 20L, Some(2.0)),
      StreamingRollup.SidEvent("g", "b", 30L, Some(3.0)))
    q.processAllAvailable()
    mem.addData(StreamingRollup.SidEvent("g", "b", 15L, Some(10.0))) // late!
    q.processAllAvailable(); q.stop()
    val resolved = spark.table("repair_out")
      .groupBy(col("t")).agg(max_by(col("v"), col("seq")).as("v"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    // equals the batch merge over ALL four events in time order
    assert(resolved == Seq((10L, 1.0), (15L, 11.0), (20L, 12.0), (30L, 5.0)), resolved.toString)
    // the repair re-emitted exactly the affected times (>= 15) with new seqs
    val reemits = spark.table("repair_out").filter(col("seq") > 3).select("t")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(reemits == Seq(15L, 20L, 30L), reemits.toString)

    // (b) beyond the horizon: detect-and-fail instead of silent corruption
    val mem2 = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[StreamingRollup.SidEvent]
    val q2 = StreamingRollup.mergeSumStream(mem2.toDS(), allowedLatenessUs = 5L)
      .writeStream.format("memory").queryName("repair_fail").outputMode("append").start()
    mem2.addData(StreamingRollup.SidEvent("g", "a", 100L, Some(1.0)))
    q2.processAllAvailable()
    mem2.addData(StreamingRollup.SidEvent("g", "a", 10L, Some(9.0))) // far too late
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
    }
    assert(err.getMessage.contains("older than the repair horizon") ||
      Option(err.getCause).exists(_.getMessage.contains("older than the repair horizon")),
      err.getMessage)
    q2.stop()
  }

  test("streaming exact dedup keeps one doc per digest") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream4").toString
    Seq((1L, "alpha"), (2L, "alpha"), (3L, "beta"), (4L, "alpha"), (5L, "beta"), (6L, "gamma"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/in")
    val src = spark.readStream
      .schema("doc_id LONG, text STRING").parquet(s"$dir/in")
    val q = StreamingRollup.dedupStream(src)
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("dedup_out").select("text").collect().map(_.getString(0)).sorted.toSeq
    assert(got == Seq("alpha", "beta", "gamma"), got.toString)
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

  test("stateless curation gates (C4 + Gopher) run unchanged on a stream") {
    // c4Clean/gopherRules are pure scan projections (no shuffle, no state),
    // so the SAME operator drops onto readStream — the ingest-time deploy
    // shape for per-document gates in a continuous crawl pipeline
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val src = mem.toDF().toDF("doc_id", "text")
    val gated = graft.text.TextOps.gopherRules(
      graft.text.TextOps.c4Clean(src), minWords = 3)
      .select(col("doc_id"), col("keep"), col("gopher_keep"), col("n_words"))
    val q = gated.writeStream.format("memory").queryName("gates_out")
      .outputMode("append").start()
    val page = "The first proper sentence has plenty of that words.\n" +
      "He said the second line of it ends with good words.\n" +
      "A third full sentence closes out the page today!"
    mem.addData((1L, page), (2L, "short { text"))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("gates_out")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(rows.keySet == Set(1L, 2L), rows.toString)
    assert(rows(1L) == ((1, 1)), rows.toString) // 3 sentences, stops present
    assert(rows(2L) == ((0, 0)), rows.toString) // brace page; '{' not alphabetic
  }

  test("streaming session_window sessionization == batch sessionize incl. exact-gap boundary") {
    import spark.implicits._
    // session_window merges windows that TOUCH: an event at exactly
    // prev + gap stays in the session; only gap > g splits — the same
    // boundary contract as the batch operator at the same gap.
    val handPts = Seq( // exact 10s gap -> same; 10.000001s gap -> split
      ("a", 0L), ("a", 5000000L), ("a", 15000000L), ("a", 25000001L))
    val rnd = new scala.util.Random(42)
    val randPts = (1 to 3).flatMap { k =>
      var t = 0L
      (1 to 100).map { _ =>
        t += rnd.nextInt(20000000).toLong + 1 // 1µs .. 20s gaps
        (s"r$k", t)
      }
    }
    val all = handPts ++ randPts
    val maxT = all.map(_._2).max
    // a far-future flush event per key advances the watermark past every
    // real session (append mode only emits sessions the watermark closed)
    val flushT = maxT + 86400000000L
    val df = (all ++ all.map(_._1).distinct.map((_, flushT)))
      .zipWithIndex.map { case ((k, t), i) => (k, t, (i % 7).toDouble) }
      .toDF("key", "t", "v")
    val dir = java.nio.file.Files.createTempDirectory("graft_sess").toString
    val staged = df.select(col("key"), timestamp_micros(col("t")).as("ts"), col("v"))
    staged.write.mode("overwrite").parquet(s"$dir/in")
    val src = spark.readStream.schema(staged.schema).parquet(s"$dir/in")
    val q = StreamingRollup.sessionizeStream(src, "10 seconds", "0 seconds")
      .writeStream.format("memory").queryName("sess_out").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    def norm(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
    val got = spark.table("sess_out")
      .select(col("key"), unix_micros(col("t_start")), unix_micros(col("t_end")),
        col("n_events"), round(col("v_sum"), 6))
      .collect().map(norm).toSet
    val exp = graft.events.EventOps.sessionize(df, gap = 10000000L)
      .filter(col("t_start") < flushT) // flush sessions never close
      .select(col("key"), col("t_start"), col("t_end"), col("n_events"),
        round(col("v_sum"), 6))
      .collect().map(norm).toSet
    assert(exp.size > 20, s"fixture too small: ${exp.size}")
    assert(got == exp,
      s"streaming-only: ${got -- exp}\nbatch-only: ${exp -- got}")
    // the hand case pins the boundary semantics: the exact-gap event
    // extends the session; the gap+1µs event opens a new one
    assert(got.exists(r => r._1 == "a" && r._2 == 0L && r._3 == 15000000L && r._4 == 3L))
    assert(got.exists(r => r._1 == "a" && r._2 == 25000001L && r._4 == 1L))
  }

  test("streaming downtime slices sum to the batch SLA report") {
    import spark.implicits._
    val rnd = new scala.util.Random(97)
    // in-order per key across micro-batches (lateness 0 contract)
    val ts = (1 to 200).scanLeft(50L)((acc, _) => acc + 5 + rnd.nextInt(90)).toSeq
    val rows = ts.map(t => StreamingRollup.DownEvent("a", t)) ++
      ts.map(t => StreamingRollup.DownEvent("b", t * 2 + 13))
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_dt").toString
    // three files in event-time order => three micro-batches, gaps
    // straddling batch boundaries exercise the cross-batch carry
    rows.sortBy(_.t).grouped((rows.size + 2) / 3).zipWithIndex.foreach {
      case (chunk, i) =>
        chunk.toDS().coalesce(1).write.parquet(s"$dir/in/f$i")
    }
    val src = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[StreamingRollup.DownEvent]].schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(s"$dir/in").as[StreamingRollup.DownEvent]
    val q = StreamingRollup.downtimeStream(src, heartbeatUs = 40L, dayUs = 1000L)
      .writeStream.format("memory").queryName("dt_out").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("dt_out")
      .groupBy("key", "day").agg(sum("downUs").as("down_us"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val exp = graft.events.EventOps.downtime(
      rows.map(e => (e.key, e.t)).toDF("key", "t"), 40L, 1000L)
      .select(col("key"), col("day"), col("down_us"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(exp.nonEmpty && got == exp,
      s"streaming-only: ${got -- exp}\nbatch-only: ${exp -- got}")
  }

  test("streaming downtime: out-of-order inside the budget splices; older fails loudly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_dt2").toString
    // batch 1 ends at t=500; the t=180 arrival in batch 2 is inside the
    // 400-lateness budget and SPLITS the open [100, 500] gap
    Seq(100L, 500L).map(StreamingRollup.DownEvent("k", _)).toDS()
      .coalesce(1).write.parquet(s"$dir/in/f0")
    Seq(180L, 900L).map(StreamingRollup.DownEvent("k", _)).toDS()
      .coalesce(1).write.parquet(s"$dir/in/f1")
    val src = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[StreamingRollup.DownEvent]].schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(s"$dir/in").as[StreamingRollup.DownEvent]
    val q = StreamingRollup.downtimeStream(src, heartbeatUs = 50L,
      dayUs = 1000000L, allowedLatenessUs = 400L)
      .writeStream.format("memory").queryName("dt2_out").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("dt2_out")
      .groupBy("key", "day").agg(sum("downUs").as("down_us"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    // the (500, 900) gap is NOT final at stream end (900 is within the
    // lateness budget of itself), so parity is against the batch over
    // the finalized prefix only
    val exp = graft.events.EventOps.downtime(
      Seq(("k", 100L), ("k", 180L), ("k", 500L)).toDF("key", "t"),
      50L, 1000000L)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got == exp, s"got $got vs $exp")
    // an arrival older than the horizon is a loud failure, not corruption
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      Seq(200L, 800L).map(StreamingRollup.DownEvent("k", _)).toDS()
        .coalesce(1).write.parquet(s"$dir/late/f0")
      Seq(300L).map(StreamingRollup.DownEvent("k", _)).toDS()
        .coalesce(1).write.parquet(s"$dir/late/f1")
      val src2 = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[StreamingRollup.DownEvent]].schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(s"$dir/late").as[StreamingRollup.DownEvent]
      val q2 = StreamingRollup.downtimeStream(src2, heartbeatUs = 50L,
        dayUs = 1000000L, allowedLatenessUs = 100L)
        .writeStream.format("memory").queryName("dt3_out").outputMode("append").start()
      try { q2.processAllAvailable() } finally q2.stop()
    }
    assert(ex.getMessage.contains("downtimeStream") ||
      Option(ex.getCause).exists(_.getMessage.contains("downtimeStream")))
  }

  test("streaming debounce equals batch across batch splits; stale input fails") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[StreamingRollup.DownEvent]
    val q = StreamingRollup.debounceStream(mem.toDS(), cooldownUs = 100L)
      .writeStream.format("memory").queryName("deb_out").outputMode("append").start()
    // batch 1 ends mid-cooldown for both keys
    mem.addData(Seq(0L, 0L, 50L, 100L).map(StreamingRollup.DownEvent("a", _)) :+
      StreamingRollup.DownEvent("b", 5L): _*)
    q.processAllAvailable()
    mem.addData(StreamingRollup.DownEvent("a", 160L),
      StreamingRollup.DownEvent("a", 210L), StreamingRollup.DownEvent("b", 90L))
    q.processAllAvailable(); q.stop()
    val got = spark.table("deb_out").collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    // the batch operator over the union decides identically
    val all = Seq(("a", 0L), ("a", 0L), ("a", 50L), ("a", 100L), ("a", 160L),
      ("a", 210L), ("b", 5L), ("b", 90L)).toDF("key", "t")
    val exp = graft.events.EventOps.debounce(all, cooldownUs = 100L)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(got == exp, s"got $got vs $exp")
    assert(got == Seq(("a", 0L), ("a", 100L), ("a", 210L), ("b", 5L)))

    // an arrival older than the key's max seen time could rewrite the
    // already-emitted chain -> loud failure, never a silent divergence
    val mem2 = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[StreamingRollup.DownEvent]
    val q2 = StreamingRollup.debounceStream(mem2.toDS(), cooldownUs = 100L)
      .writeStream.format("memory").queryName("deb_fail").outputMode("append").start()
    mem2.addData(StreamingRollup.DownEvent("a", 1000L))
    q2.processAllAvailable()
    mem2.addData(StreamingRollup.DownEvent("a", 500L)) // stale
    val ex2 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
    }
    assert(ex2.getMessage.contains("debounceStream") ||
      Option(ex2.getCause).exists(_.getMessage.contains("debounceStream")))
    q2.stop()
  }

  test("streaming burn rate equals batch across batch splits; stale input fails") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(53)
    // strictly increasing per-key times with duplicate-t multiplicities
    val evs = Seq("a", "b").flatMap { k =>
      var t = 0L
      (0 until 80).flatMap { _ =>
        t += 1 + rnd.nextInt(20)
        Seq.fill(1 + rnd.nextInt(3))(
          StreamingRollup.ReqEvent(k, t, rnd.nextInt(3) == 0))
      }
    }
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[StreamingRollup.ReqEvent]
    val q = StreamingRollup.burnRateStream(mem.toDS(), budget = 0.5,
      shortUs = 13L, longUs = 47L, burnThreshold = 0.4)
      .writeStream.format("memory").queryName("burn_out")
      .outputMode("append").start()
    // split into per-key time-ordered batches at an arbitrary cut
    val (b1, b2) = (evs.filter(_.t <= 400), evs.filter(_.t > 400))
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable(); q.stop()
    val got = spark.table("burn_out").collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5),
          r.getLong(6), r.getDouble(7), r.getLong(8)))).toMap
    val all = evs.map(e => (e.key, e.t, if (e.bad) 60.0 else 10.0))
      .toDF("key", "t", "v")
    val exp = graft.events.EventOps.burnRate(all, col("v") >= 50,
      budget = 0.5, shortUs = 13L, longUs = 47L, burnThreshold = 0.4)
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5),
          r.getLong(6), r.getDouble(7), r.getLong(8)))).toMap
    assert(got == exp)

    val mem2 = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[StreamingRollup.ReqEvent]
    val q2 = StreamingRollup.burnRateStream(mem2.toDS(), budget = 0.5,
      shortUs = 13L, longUs = 47L, burnThreshold = 0.4)
      .writeStream.format("memory").queryName("burn_fail")
      .outputMode("append").start()
    mem2.addData(StreamingRollup.ReqEvent("a", 100L, bad = false))
    q2.processAllAvailable()
    mem2.addData(StreamingRollup.ReqEvent("a", 100L, bad = true)) // same-t
    val ex2 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
    }
    assert(ex2.getMessage.contains("burnRateStream") ||
      Option(ex2.getCause).exists(_.getMessage.contains("burnRateStream")))
    q2.stop()
  }

  test("streaming deadband equals batch across batch splits; same-t re-delivery fails") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[StreamingRollup.PointEvent]
    val q = StreamingRollup.deadbandStream(mem.toDS(), delta = 0.5)
      .writeStream.format("memory").queryName("db_out").outputMode("append").start()
    // batch 1 ends with the chain mid-band for key a
    mem.addData(
      StreamingRollup.PointEvent("a", 0L, 10.0),   // kept (first)
      StreamingRollup.PointEvent("a", 1L, 10.4),   // dropped
      StreamingRollup.PointEvent("a", 2L, 10.5),   // kept
      StreamingRollup.PointEvent("b", 0L, 1.0))    // kept (first)
    q.processAllAvailable()
    mem.addData(
      StreamingRollup.PointEvent("a", 3L, 10.2),   // vs 10.5: dropped
      StreamingRollup.PointEvent("a", 4L, 9.9),    // vs 10.5: kept
      StreamingRollup.PointEvent("b", 1L, 1.2))    // dropped
    q.processAllAvailable(); q.stop()
    val got = spark.table("db_out").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    val all = Seq(("a", 0L, 10.0), ("a", 1L, 10.4), ("a", 2L, 10.5),
      ("a", 3L, 10.2), ("a", 4L, 9.9), ("b", 0L, 1.0), ("b", 1L, 1.2))
      .toDF("key", "t", "v")
    val exp = graft.events.EventOps.deadband(all, delta = 0.5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sorted.toSeq
    assert(got == exp, s"got $got vs $exp")
    assert(got == Seq(("a", 0L, 10.0), ("a", 2L, 10.5), ("a", 4L, 9.9),
      ("b", 0L, 1.0)))

    // same-t re-delivery is a value correction -> loud failure
    val mem2 = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[StreamingRollup.PointEvent]
    val q2 = StreamingRollup.deadbandStream(mem2.toDS(), delta = 0.5)
      .writeStream.format("memory").queryName("db_fail").outputMode("append").start()
    mem2.addData(StreamingRollup.PointEvent("a", 100L, 5.0))
    q2.processAllAvailable()
    mem2.addData(StreamingRollup.PointEvent("a", 100L, 9.0)) // correction
    val ex2 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
    }
    assert(ex2.getMessage.contains("deadbandStream") ||
      Option(ex2.getCause).exists(_.getMessage.contains("deadbandStream")))
    q2.stop()
  }
}
