package graft

import graft.core.{BucketedOps, SeriesOps}
import graft.events.EventOps
import graft.merge.MergeOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Equivalence of the skew-safe bucketed running-window paths against the
  * plain per-key windows, on seeded random series — including empty
  * buckets, constant keys (the round-1 single-partition trap), duplicate
  * times across sids, nulls, and strict/ignorant merge modes. Bucket width
  * 137 deliberately does not divide the time range.
  */
class BucketedSpec extends SparkSpec {
  val rnd = new scala.util.Random(20260816)
  val bucket = Some(floor(col("t") / 137L).cast("long"))

  def same(a: DataFrame, b: DataFrame, label: String): Unit = {
    val extra = a.exceptAll(b).collect()
    val missing = b.exceptAll(a).collect()
    assert(extra.isEmpty && missing.isEmpty,
      s"$label: bucketed extra=${extra.mkString(",")} missing=${missing.mkString(",")}")
  }

  def randSidRows(keys: Seq[String], sids: Int, maxLen: Int): DataFrame = {
    val s = spark
    import s.implicits._
    val rows = for {
      k <- keys
      sid <- 0 until sids
      t <- Seq.fill(1 + rnd.nextInt(maxLen))(rnd.nextInt(1000).toLong).distinct
    } yield (k, s"s$sid", t,
      if (rnd.nextInt(6) == 0) null else java.lang.Double.valueOf(rnd.nextInt(5).toDouble))
    rows.toDF("key", "sid", "t", "v").withColumn("v", col("v").cast("double"))
  }

  test("mergeSum bucketed ≡ plain (ignorant + strict, with/without defaults, 12 trials)") {
    val s = spark
    import s.implicits._
    (1 to 12).foreach { trial =>
      val df = randSidRows(Seq("all"), 1 + rnd.nextInt(4), 20).persist()
      val strict = trial % 2 == 0
      val defaults =
        if (trial % 3 == 0) None
        else Some((0 until 4).map(i => (s"s$i",
          if (rnd.nextBoolean()) null else java.lang.Double.valueOf(rnd.nextInt(3).toDouble)))
          .toDF("sid", "default").withColumn("default", col("default").cast("double")))
      val plain = MergeOps.mergeSum(df, strict, defaults)
      val bucketed = MergeOps.mergeSum(df, strict, defaults, bucket)
      same(bucketed, plain, s"mergeSum trial $trial strict=$strict")
      df.unpersist()
    }
  }

  test("countActive + cumulativeSum bucketed ≡ plain (constant key, 6 trials)") {
    val s = spark
    import s.implicits._
    (1 to 6).foreach { trial =>
      def events(n: Int) =
        Seq.fill(n)(("all", rnd.nextInt(1000).toLong)).toDF("key", "t")
      val open = events(80).persist(); val closed = events(80).persist()
      same(EventOps.countActive(open, closed, bucket),
        EventOps.countActive(open, closed), s"countActive trial $trial")
      same(EventOps.cumulativeSum(open, bucket),
        EventOps.cumulativeSum(open), s"cumsum trial $trial")
      open.unpersist(); closed.unpersist()
    }
  }

  test("countByValue bucketed ≡ plain (few hot values, defaults, 6 trials)") {
    val s = spark
    import s.implicits._
    (1 to 6).foreach { trial =>
      val rows = for {
        sid <- 0 until 5
        t <- Seq.fill(1 + rnd.nextInt(30))(rnd.nextInt(1000).toLong).distinct
      } yield (s"s$sid", t,
        if (rnd.nextInt(8) == 0) null else java.lang.Double.valueOf(rnd.nextInt(2).toDouble))
      val df = rows.toDF("sid", "t", "v").withColumn("v", col("v").cast("double")).persist()
      val defaults =
        if (trial % 2 == 0) None
        else Some((0 until 5).map(i => (s"s$i",
          if (rnd.nextBoolean()) null else java.lang.Double.valueOf(rnd.nextInt(2).toDouble)))
          .toDF("sid", "default").withColumn("default", col("default").cast("double")))
      same(MergeOps.countByValue(df, defaults, bucket),
        MergeOps.countByValue(df, defaults), s"countByValue trial $trial")
      df.unpersist()
    }
  }

  test("operate/difference bucketed ≡ plain (nulls + scalar defaults, 8 trials)") {
    (1 to 8).foreach { trial =>
      def side() = {
        val s = spark
        import s.implicits._
        Seq.fill(1 + rnd.nextInt(25))((
          "pair", rnd.nextInt(500).toLong,
          if (rnd.nextInt(6) == 0) null else java.lang.Double.valueOf(rnd.nextInt(5).toDouble)))
          .distinct.toDF("key", "t", "v").withColumn("v", col("v").cast("double"))
          .groupBy("key", "t").agg(max("v").as("v"))
      }
      val a = side().persist(); val b = side().persist()
      val (da, db) = if (trial % 2 == 0) (lit(0.0), lit(0.0))
        else (lit(null).cast("double"), lit(null).cast("double"))
      same(MergeOps.difference(a, b, da, db, bucket),
        MergeOps.difference(a, b, da, db), s"difference trial $trial")
      a.unpersist(); b.unpersist()
    }
  }

  test("compactBucketed ≡ compact (runs of equal + null values, 8 trials)") {
    val s = spark
    import s.implicits._
    (1 to 8).foreach { trial =>
      val rows = (0 until 4).flatMap { k =>
        Seq.fill(1 + rnd.nextInt(40))(rnd.nextInt(1000).toLong).distinct.map(t =>
          (s"k$k", t, if (rnd.nextInt(4) == 0) null else java.lang.Double.valueOf(rnd.nextInt(2).toDouble)))
      }
      val df = rows.toDF("key", "t", "v").withColumn("v", col("v").cast("double")).persist()
      same(SeriesOps.compactBucketed(df, bucket.get), SeriesOps.compact(df), s"compact trial $trial")
      df.unpersist()
    }
  }

  test("bucketed plans have no unpartitioned window") {
    val s = spark
    import s.implicits._
    val df = (0L until 200L).map(t => ("all", s"s${t % 3}", t, (t % 7).toDouble))
      .toDF("key", "sid", "t", "v")
    val plan = MergeOps.mergeSum(df, strict = false, bucketBy = bucket)
      .queryExecution.executedPlan.toString
    // every WindowExec must carry a partition spec — the single-partition
    // running sum ("No Partition Defined") is exactly what this path removes
    assert(!plan.contains("windowspecdefinition(t"), plan)
  }

  test("gridSeq times == gridLongs times (awkward inner chunking)") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 0L, 1.0), ("b", 0L, 2.0)).toDF("key", "t", "v")
    for ((start, end, period, inner) <- Seq(
        (0L, 1000L, 7L, 16L), (5L, 5000L, 13L, 8192L), (100L, 101L, 1L, 4L))) {
      val exec = graft.regularize.Regularize.gridSeq(df, start, end, period, inner)
        .filter(col("key") === "a").select("t").collect().map(_.getLong(0)).sorted.toSeq
      val drv = graft.regularize.Regularize.gridLongs(start, end, period)
      assert(exec == drv, s"grid mismatch for ($start,$end,$period,$inner)")
    }
  }

  test("LSH bucket cap bounds degenerate buckets without a pair explosion") {
    val s = spark
    import s.implicits._
    // 5000 identical docs (one giant bucket per band) + 6 near-dup docs
    val words = (1 to 30).map(i => s"w$i").mkString(" ")
    val docs = ((0 until 5000).map(i => (i.toLong, "same text in every one of these documents " + "pad " * 10)) ++
      (0 until 6).map(i => (9000L + i, words + (if (i % 2 == 0) "" else " tail"))))
      .toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val pairs = graft.dedup.Dedup.minhashCandidates(docs, maxBucket = 100).collect()
    val sec = (System.nanoTime() - t0) / 1e9
    // without the cap this would be ~12.5M pairs from the giant bucket
    assert(pairs.length < 100, s"cap leaked ${pairs.length} pairs")
    assert(pairs.forall(r => r.getLong(0) >= 9000L), "giant-bucket ids escaped the cap")
    val audit = graft.dedup.Dedup.lshOversizedBuckets(docs, maxBucket = 100).collect()
    assert(audit.nonEmpty && audit.forall(_.getLong(2) == 5000L), s"audit: ${audit.mkString(",")}")
    assert(sec < 120, s"cap did not bound runtime: $sec s")
  }

  test("setManyCompact drops the leading run equal to the default") {
    val df = seriesD(Seq(1.0 -> Some(5.0), 2.0 -> Some(5.0), 3.0 -> Some(2.0), 4.0 -> Some(5.0)))
    assert(collectTV(SeriesOps.setManyCompact(df, lit(5.0))) ==
      Seq(3.0 -> Some(2.0), 4.0 -> Some(5.0)))
    // null default: null first values compact away (None != None is False)
    val df2 = seriesD(Seq(1.0 -> None, 2.0 -> Some(1.0)))
    assert(collectTV(SeriesOps.setManyCompact(df2, lit(null).cast("double"))) ==
      Seq(2.0 -> Some(1.0)))
    // differing first value is kept
    assert(collectTV(SeriesOps.setManyCompact(df, lit(9.0))).head == (1.0 -> Some(5.0)))
  }

  test("weekdayNumber resolves names and numbers like the reference") {
    import graft.regularize.CalendarFloor.weekdayNumber
    assert(weekdayNumber("monday") == 0 && weekdayNumber("Sunday") == 6)
    assert(weekdayNumber(0) == 0 && weekdayNumber(3) == 3)
    intercept[IllegalArgumentException](weekdayNumber("notaday"))
    intercept[IllegalArgumentException](weekdayNumber(7))
  }

  test("removePoint and seriesEquals (reference remove/__eq__)") {
    val df = seriesD(Seq(1.0 -> Some(1.0), 2.0 -> Some(2.0)))
    assert(collectTV(SeriesOps.removePoint(df, lit(1.0))) == Seq(2.0 -> Some(2.0)))
    assert(SeriesOps.seriesEquals(df, df.orderBy(col("t").desc)))
    assert(!SeriesOps.seriesEquals(df, SeriesOps.removePoint(df, lit(1.0))))
  }

  test("seriesEqualsBy: per-key __eq__ distinguishes null-valued from absent points") {
    val a = seriesD(Seq(1.0 -> Some(1.0), 2.0 -> None), key = "k1")
      .unionByName(seriesD(Seq(1.0 -> Some(3.0)), key = "k2"))
      .unionByName(seriesD(Seq(1.0 -> Some(9.0), 2.0 -> Some(9.0)), key = "k3"))
    val b = seriesD(Seq(2.0 -> None, 1.0 -> Some(1.0)), key = "k1") // same, reordered
      .unionByName(seriesD(Seq(1.0 -> Some(4.0)), key = "k2")) // value differs
      .unionByName(seriesD(Seq(1.0 -> Some(9.0)), key = "k3")) // point missing
    val got = SeriesOps.seriesEqualsBy(a, b).collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got == Map("k1" -> true, "k2" -> false, "k3" -> false))
    // a null-VALUED point is not the same as an absent point
    val c = seriesD(Seq(1.0 -> Some(1.0)), key = "k1")
    val d = seriesD(Seq(1.0 -> Some(1.0), 2.0 -> None), key = "k1")
    assert(SeriesOps.seriesEqualsBy(c, d).head().getBoolean(1) == false)
    // null-keyed series (countByValue's None-value series) compare equal to
    // themselves — the join must be null-safe on the key
    val n = seriesD(Seq(1.0 -> Some(1.0), 2.0 -> Some(2.0)), key = "k1")
      .withColumn("key", lit(null).cast("string"))
    val eqN = SeriesOps.seriesEqualsBy(n, n).collect()
    assert(eqN.length == 1 && eqN.head.isNullAt(0) && eqN.head.getBoolean(1))
    // the null-safe (<=>) join condition must still plan as an equi-join
    val plan = SeriesOps.seriesEqualsBy(a, b).queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"null-safe __eq__ join fell back to a non-equi join:\n$plan")
  }

  test("explodeRangeChunked equals a plain sequence explode at every chunk boundary") {
    val s = spark; import s.implicits._
    // (c0, c1) ranges crossing each edge: empty-ish single id, exactly one
    // chunk, one-past a chunk, several chunks with a short tail
    val ranges = Seq((0L, 0L), (5L, 9L), (0L, 4L), (0L, 5L), (3L, 23L), (-7L, 6L))
    for ((c0, c1) <- ranges; inner <- Seq(1L, 5L, 1024L)) {
      val df = Seq(("k", c0, c1)).toDF("key", "c0", "c1")
      val got = SeriesOps
        .explodeRangeChunked(df, col("c0"), col("c1"), "id", innerLen = inner)
        .select("id").as[Long].collect().sorted.toSeq
      assert(got == (c0 to c1), s"range ($c0,$c1) innerLen=$inner: $got")
    }
    // inverted range drops the row (sequence with a positive step would
    // throw; the plain form emitted a descending range callers filtered)
    val inv = Seq(("k", 5L, 4L)).toDF("key", "c0", "c1")
    assert(SeriesOps.explodeRangeChunked(inv, col("c0"), col("c1"), "id").count() == 0)
  }

  test("adaptive bucket width: bucketing-invariant results at extreme spans") {
    val s2 = spark
    import s2.implicits._
    // century span in micros-like units and an hour-scale span: same merge
    // answer for plain, fixed-DAY-style, and adaptive bucketing
    val spans = Seq(3155760000000000L /* ~100y */, 3600000000L /* 1h */)
    spans.foreach { span =>
      val df = spark.range(600)
        .select(
          lit("g").as("key"),
          (col("id") % 4).cast("string").as("sid"),
          (col("id") * (span / 600)).as("t"),
          (col("id") % 5).cast("double").as("v"))
      val width = graft.core.BucketedOps.adaptiveWidth(df)
      assert(width >= 1L && width <= span, s"width $width for span $span")
      val plain = collectTVL(graft.merge.MergeOps.mergeSum(df, strict = false))
      val fixed = collectTVL(graft.merge.MergeOps.mergeSum(df, strict = false,
        bucketBy = Some(floor(col("t") / 86400000000L).cast("long"))))
      val adaptive = collectTVL(graft.merge.MergeOps.mergeSum(df, strict = false,
        bucketBy = Some(graft.core.BucketedOps.adaptiveBucket(df))))
      assert(fixed == plain, s"fixed-bucket merge diverged at span $span")
      assert(adaptive == plain, s"adaptive-bucket merge diverged at span $span")
    }
  }

  test("adaptiveWidth targets ~factor x parallelism buckets and floors at 1") {
    val s2 = spark
    import s2.implicits._
    val df = spark.range(1000).select(lit("k").as("key"), col("id").as("t"), lit(1.0).as("v"))
    val w = graft.core.BucketedOps.adaptiveWidth(df, factor = 4)
    val buckets = 1000.0 / w
    val target = 4.0 * spark.sparkContext.defaultParallelism
    assert(buckets <= target * 2 + 1, s"too many buckets: $buckets vs target $target")
    // degenerate span: width never 0
    val tiny = spark.range(3).select(lit("k").as("key"), col("id").as("t"), lit(1.0).as("v"))
    assert(graft.core.BucketedOps.adaptiveWidth(tiny) == 1L)
    val empty = tiny.filter(col("t") < 0)
    assert(graft.core.BucketedOps.adaptiveWidth(empty) == 1L)
  }
}
