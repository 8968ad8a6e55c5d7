package graft

import graft.events.EventOps
import graft.merge.MergeOps
import graft.rollup.Rollup
import graft.text.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hand-checked semantics for the analytics extensions: tier
  * percentiles, M4 downsampling, rolling z-score, as-of enrichment join
  * (plain == bucketed), per-source quantile calibration.
  */
class AnalyticsOpsSpec extends SparkSpec {

  test("tierPercentiles: interpolated ranks, bin assignment, end-exclusive") {
    val df = seriesL(Seq(
      (10L, Some(1.0)), (20L, Some(2.0)), (30L, Some(3.0)), (40L, Some(4.0)),
      (150L, Some(10.0)),
      (250L, Some(99.0)))) // >= end, dropped
    val out = Rollup.tierPercentiles(df, 0L, 200L, 100L, Seq(0.5, 1.0))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toSeq.sortBy(x => (x._1, x._3))
    assert(out == Seq(
      (0L, 4L, 0.5, 2.5), // rank 0.5*(4-1)=1.5 -> 2 + 0.5*(3-2)
      (0L, 4L, 1.0, 4.0),
      (100L, 1L, 0.5, 10.0),
      (100L, 1L, 1.0, 10.0)))
  }

  test("tierPercentiles: null values carry no sample; all-null bin emits nothing") {
    val df = seriesL(Seq(
      (10L, Some(1.0)), (20L, None), (30L, Some(3.0)), // mixed bin
      (150L, None))) // all-null bin
    val out = Rollup.tierPercentiles(df, 0L, 200L, 100L, Seq(0.5))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(4))).toSeq
    assert(out == Seq((0L, 2L, 2.0))) // n_points counts measurements only
  }

  test("m4: first/last by (t, v) tiebreak, min/max, singleton bin") {
    val df = seriesL(Seq(
      (10L, Some(5.0)), (10L, Some(1.0)), (20L, Some(3.0)),
      (150L, Some(7.0))))
    val out = Rollup.m4(df, 0L, 100L)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5), r.getDouble(6), r.getDouble(7), r.getDouble(8)))
      .toSeq.sortBy(_._1)
    assert(out == Seq(
      (0L, 3L, 10L, 20L, 1.0, 3.0, 1.0, 5.0),
      (100L, 1L, 150L, 150L, 7.0, 7.0, 7.0, 7.0)))
  }

  test("rollingZscore: warm-up nulls, exact z, anomaly flag, zero variance") {
    val df = seriesL(Seq(
      (1L, Some(1.0)), (2L, Some(3.0)), (3L, Some(1.0)),
      (4L, Some(3.0)), (5L, Some(10.0))))
    val out = EventOps.rollingZscore(df, lookback = 2, threshold = 1.0)
      .collect()
      .map(r => (r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getInt(4)))
      .toSeq.sortBy(_._1)
    assert(out == Seq(
      (1L, None, 0), (2L, None, 0),
      (3L, Some(-0.707107), 0), // (1-2)/sqrt(2)
      (4L, Some(0.707107), 0),
      (5L, Some(5.656854), 1))) // (10-2)/sqrt(2)
    // constant history -> sd = 0 -> null z, never a division blow-up
    val const = seriesL(Seq((1L, Some(2.0)), (2L, Some(2.0)), (3L, Some(9.0))))
    val z3 = EventOps.rollingZscore(const, lookback = 2, threshold = 1.0)
      .filter(col("t") === 3).head()
    assert(z3.isNullAt(3) && z3.getInt(4) == 0)
  }

  test("asofJoin: inclusive at-or-before, null before first, payload kept") {
    val s = spark
    import s.implicits._
    val right = seriesL(Seq((10L, Some(1.0)), (20L, Some(2.0))))
    val left = Seq(("s", 5L, "a"), ("s", 10L, "b"), ("s", 15L, "c"),
      ("s", 25L, "d"), ("other", 30L, "e"))
      .toDF("key", "t", "tag")
    val out = MergeOps.asofJoin(left, right, outCol = "rv")
      .collect()
      .map(r => (r.getString(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toSeq.sortBy(_._1)
    assert(out == Seq(
      ("a", None), ("b", Some(1.0)), ("c", Some(1.0)), ("d", Some(2.0)),
      ("e", None))) // key with no right series at all
  }

  test("asofJoin: bucketed path == plain path at several widths") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(20260818)
    val right = (1 to 3).flatMap { k =>
      (1 to 80).map(_ => (s"k$k", rnd.nextInt(2000).toLong, rnd.nextDouble()))
    }.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // unique (key, t)
      .toDF("key", "t", "v")
    val left = (1 to 3).flatMap { k =>
      (1 to 120).map(i => (s"k$k", rnd.nextInt(2200).toLong, i))
    }.toDF("key", "t", "tag")
    def norm(df: DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toSeq.sorted(Ordering.by((x: (String, Long, Int, Option[Double])) =>
        (x._1, x._2, x._3, x._4.getOrElse(Double.NaN).toString)))
    val plain = norm(MergeOps.asofJoin(left, right))
    for (width <- Seq(7L, 100L, 512L, 10000L)) {
      val bk = Some(floor(col("t") / width).cast("long"))
      assert(norm(MergeOps.asofJoin(left, right, bucketBy = bk)) == plain,
        s"bucket width $width diverged")
    }
  }

  test("counterRate: increase, reset handling, zero-duration pair dropped") {
    val df = seriesL(Seq(
      (1L, Some(10.0)), (3L, Some(14.0)), // +4 over 2us
      (5L, Some(2.0)), // drop -> reset: increase = new value
      (5L, Some(7.0)), // equal-t pair: dropped (no zero-duration rate)
      (8L, Some(9.0)))) // +2 over 3us from (5, 7)
    val out = EventOps.counterRate(df)
      .collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq.sortBy(_._1)
    assert(out == Seq(
      (3L, 4.0, 2000000.0),
      (5L, 2.0, 1000000.0),
      (8L, 2.0, 666666.666667)))
  }

  test("shardManifest: numeric-order digest, doc/token accounting, partition invariance") {
    val s = spark
    import s.implicits._
    val df = (1L to 20L).map(id => (id, id * 10)).toDF("doc_id", "n_tokens")
    // nShards=1: digest must be md5 over NUMERICALLY sorted ids — the
    // "1,10,11,...,2,20,..." lexicographic trap would change the bytes
    val one = graft.pack.Packing.shardManifest(df, nShards = 1).head()
    val canonical = (1L to 20L).mkString(",")
    val md = java.security.MessageDigest.getInstance("MD5")
    val expDigest = md.digest(canonical.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert((one.getLong(1), one.getLong(2), one.getString(3)) ==
      ((20L, 2100L, expDigest)))
    val m3 = graft.pack.Packing.shardManifest(df, nShards = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSet
    assert(m3.map(_._2).sum == 20L && m3.map(_._1).forall(sh => sh >= 0 && sh < 3))
    val m3r = graft.pack.Packing.shardManifest(df.repartition(7), nShards = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSet
    assert(m3r == m3, "manifest must not depend on input partitioning")
  }

  test("seasonalResidual: per-bin baseline, zero-variance guard, sigma flag") {
    val df = seriesL(Seq(
      (0L, Some(1.0)), (20L, Some(3.0)), // bin 0: mean 2, sd 1.414214
      (10L, Some(5.0)), (30L, Some(5.0)))) // bin 1: sd 0 -> null residual
    def run(nSigma: Double) =
      EventOps.seasonalResidual(df, periodUs = 20L, binUs = 10L, nSigma = nSigma)
        .collect()
        .map(r => (r.getLong(1), r.getInt(3), r.getDouble(4),
          if (r.isNullAt(5)) None else Some(r.getDouble(5)), r.getInt(6)))
        .toSeq.sortBy(_._1)
    assert(run(3.0) == Seq(
      (0L, 0, 2.0, Some(-1.0), 0), (10L, 1, 5.0, None, 0),
      (20L, 0, 2.0, Some(1.0), 0), (30L, 1, 5.0, None, 0)))
    // |residual| = 1 > 0.5 * 1.414214 -> flags with the tighter sigma
    assert(run(0.5).map(_._5) == Seq(1, 0, 1, 0))
  }

  test("psiDrift: exact smoothed terms; identical windows give psi 0") {
    val df = seriesL(Seq(
      (1L, Some(0.5)), (2L, Some(0.5)), (3L, Some(1.5)), // window A
      (11L, Some(1.5)), (12L, Some(1.5)))) // window B
    val out = EventOps.psiDrift(df, splitT = 10L, lo = 0.0, hi = 2.0, nBins = 2)
      .head()
    def term(ca: Long, cb: Long, na: Long, nb: Long): Long = {
      val pa = (ca + 0.5) / (na + 0.5 * 2); val pb = (cb + 0.5) / (nb + 0.5 * 2)
      math.round((pa - pb) * math.log(pa / pb) * 1e6)
    }
    val exp = (term(2, 0, 3, 2) + term(1, 2, 3, 2)) / 1e6
    assert((out.getLong(1), out.getLong(2), out.getDouble(3)) == ((3L, 2L, exp)))
    val same = seriesL(Seq((1L, Some(0.5)), (2L, Some(1.5)),
      (11L, Some(0.5)), (12L, Some(1.5))))
    assert(EventOps.psiDrift(same, 10L, 0.0, 2.0, 2).head().getDouble(3) == 0.0)
  }

  test("intervalOverlapJoin: half-open boundaries, single attribution, any bucket width") {
    val s = spark
    import s.implicits._
    val a = Seq(("s", 0L, 100L, 1.0), ("s", 200L, 300L, 2.0),
      ("o", 0L, 50L, 3.0)).toDF("key", "a0", "a1", "av")
    val b = Seq(("s", 50L, 150L, 9.0), ("s", 100L, 200L, 8.0),
      ("s", 250L, 260L, 7.0), ("o", 400L, 500L, 6.0))
      .toDF("key", "b0", "b1", "bv")
    for (w <- Seq(7L, 64L, 1000L)) {
      val out = graft.core.SeriesOps.intervalOverlapJoin(a, b, w)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(4), r.getLong(7)))
        .toSet
      // (0,100)x(100,200) and (200,300)x(100,200) touch but do not
      // overlap (half-open); each real overlap appears exactly once
      assert(out == Set(("s", 0L, 50L, 50L), ("s", 200L, 250L, 10L)),
        s"width $w: $out")
    }
  }

  test("cohortRetention: first-week cohorts, offsets, retained fractions") {
    val s = spark
    import s.implicits._
    val df = Seq(("u1", 5L), ("u1", 15L), ("u1", 35L), ("u2", 3L),
      ("u3", 12L), ("u3", 17L), ("u3", 25L))
      .toDF("key", "t")
    val out = EventOps.cohortRetention(df, originUs = 0L, weekUs = 10L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(out == Set(
      (0L, 0L, 2L, 1.0), (0L, 1L, 1L, 0.5), (0L, 3L, 1L, 0.5),
      (1L, 0L, 1L, 1.0), (1L, 1L, 1L, 1.0)))
  }

  test("funnel: strictly-after ordering, partial completion, equal-time excluded") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("u1", 1L, "A"), ("u1", 5L, "B"), ("u1", 3L, "C"), // C before B -> stops at 2
      ("u2", 1L, "B"), ("u2", 2L, "A"), ("u2", 4L, "B"), ("u2", 6L, "C"),
      ("u3", 1L, "C"), // never signs up
      ("u4", 1L, "A"), ("u4", 1L, "B")) // B not strictly after A
      .toDF("key", "t", "step")
    val out = EventOps.funnel(df, Seq("A", "B", "C"))
      .collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        r.getInt(4)))
      .toSeq.sortBy(_._1)
    assert(out == Seq(
      ("u1", 1L, 5L, -1L, 2),
      ("u2", 2L, 4L, 6L, 3),
      ("u3", -1L, -1L, -1L, 0),
      ("u4", 1L, -1L, -1L, 1)))
  }

  test("ewma: equals the sequential recurrence at several bucket widths") {
    val tau = 100.0
    def seqEwma(pts: Seq[(Long, Double)]): Map[Long, Double] = {
      var y = 0.0
      var prev = Option.empty[Long]
      pts.sortBy(identity).map { case (t, x) =>
        val a = prev.map(p => math.exp((p - t) / tau)).getOrElse(0.0)
        y = a * y + (1 - a) * x
        prev = Some(t)
        t -> y
      }.toMap // fixture times are unique per key
    }
    val rnd = new scala.util.Random(20260818)
    val byKey = (1 to 3).map { k =>
      var t = 0L
      val pts = (1 to 300).map { i =>
        // mixed gaps: dense (<tau), moderate, and occasional huge
        // (cross-bucket, decays the carry to ~0)
        t += (if (i % 37 == 0) 5000 + rnd.nextInt(20000)
              else 1 + rnd.nextInt(300)).toLong
        (t, rnd.nextDouble() * 10 - 5)
      }.groupBy(_._1).map(_._2.head).toSeq // unique t
      s"k$k" -> pts
    }.toMap
    val s = spark
    import s.implicits._
    val df = byKey.toSeq.flatMap { case (k, pts) =>
      pts.map { case (t, x) => (k, t, x) }
    }.toDF("key", "t", "v")
      // a null measurement must be dropped, not smoothed over
      .unionByName(Seq(("k1", 7L)).toDF("key", "t")
        .withColumn("v", lit(null).cast("double")))
    val exp = byKey.map { case (k, pts) => k -> seqEwma(pts) }
    for (width <- Seq(200L, 5000L, 30000L)) {
      val out = graft.regularize.Regularize.ewma(df, tauUs = tau,
        bucketMicros = width).collect()
      assert(out.length == byKey.values.map(_.size).sum, s"width $width")
      out.foreach { r =>
        val (k, t, y) = (r.getString(0), r.getLong(1), r.getDouble(3))
        val ref = exp(k).getOrElse(t,
          fail(s"unexpected point ($k, $t) — the null row leaked through"))
        assert(math.abs(y - ref) <= 1e-9 * (1 + math.abs(ref)),
          s"width $width at ($k, $t): $y vs $ref")
      }
    }
  }

  test("sourceQuantileKeep: per-source ranks, tie-break, singleton source") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "A", 0.9), (2L, "A", 0.8), (3L, "A", 0.8), (4L, "A", 0.7),
      (5L, "B", 0.1))
      .toDF("doc_id", "source", "quality")
    val out = TextOps.sourceQuantileKeep(df, frac = 0.4)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(3), r.getInt(4)))
      .toSeq.sortBy(_._1)
    assert(out == Seq(
      (1L, 0.0, 1), (2L, 0.333333, 1), (3L, 0.666667, 0), (4L, 1.0, 0),
      (5L, 0.0, 1))) // single-row source: percent_rank 0 -> kept
  }

  test("cusum: closed form equals the sequential max(0, s+d) recurrence") {
    val rnd = new scala.util.Random(421)
    // step up at i=200: a textbook level shift the chart must flag
    val pts = (1 to 400).map(i => (i.toLong * 7,
      Some(rnd.nextGaussian() + (if (i > 200) 3.0 else 0.0))))
    val df = seriesL(pts)
    val out = EventOps.cusum(df, slackSd = 0.5, nSd = 4.0)
      .select(col("t"), col("cusum_pos"), col("cusum_neg"), col("changepoint"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getInt(3)))
      .toSeq.sortBy(_._1)
    // sequential reference on the SAME quantized grid: μ/σ taken from the
    // engine's own rounded aggregate (the contract), then the literal
    // recurrence over exact 1e-6-grid longs — zero float ambiguity
    val agg = df.agg(round(avg("v"), 6), round(stddev_samp("v"), 6)).head()
    val (mu, sd) = (agg.getDouble(0), agg.getDouble(1))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def grid(x: Double) =
      BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val slack = r6(sd * 0.5)
    val h = r6(sd * 4.0)
    var (sp, sn) = (0L, 0L)
    val ref = pts.map { case (t, Some(v)) =>
      sp = math.max(0L, sp + grid(v - mu - slack))
      sn = math.max(0L, sn + grid(mu - slack - v))
      (t, r6(sp / 1e6), r6(sn / 1e6),
        if (sp / 1e6 > h || sn / 1e6 > h) 1 else 0)
    }
    assert(out == ref)
    // the shift is flagged; with a GLOBAL μ the chart is retrospective —
    // post-shift values sit above μ, so s⁺ grows monotonically-ish to its
    // maximum at the series end (and the pre-shift region mirrors on s⁻)
    assert(out.exists(_._4 == 1))
    assert(out.last._4 == 1 &&
      out.indexWhere(_._2 == out.map(_._2).max) >= 200)
  }

  test("cusum: zero-variance and singleton keys emit null scores, flag 0") {
    val df = seriesL(Seq((1L, Some(2.0)), (2L, Some(2.0)), (3L, Some(2.0))))
      .unionByName(seriesL(Seq((5L, Some(9.0))), key = "one"))
    val out = EventOps.cusum(df).collect()
    assert(out.length == 4)
    out.foreach { r =>
      assert(r.isNullAt(3) && r.isNullAt(4) && r.getInt(5) == 0)
    }
  }

  private def events(ts: Seq[Long], key: String = "a"): DataFrame = {
    val s = spark
    import s.implicits._
    ts.map(t => (key, t)).toDF("key", "t")
  }

  test("downtime: dead-man's-switch gap, multi-day split, day fractions") {
    // heartbeat 10, day 100: one event at 0, next at 350 -> down [10, 350)
    val out = graft.events.EventOps.downtime(events(Seq(0L, 350L)),
      heartbeatUs = 10L, dayUs = 100L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sortBy(_._1)
    assert(out == Seq((0L, 90L, 0.9), (1L, 100L, 1.0), (2L, 100L, 1.0),
      (3L, 50L, 0.5)))
  }

  test("downtime: multiple gaps aggregate per day; exact-heartbeat gap is up") {
    // gaps 0->30 (down [10,30)) and 30->80 (down [40,80)), then 80->90
    // exactly the heartbeat -> no downtime
    val out = graft.events.EventOps.downtime(events(Seq(0L, 30L, 80L, 90L)),
      heartbeatUs = 10L, dayUs = 100L)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((0L, 60L)))
  }

  test("downtime: plain == bucketed at three widths incl. sparse buckets") {
    val rnd = new scala.util.Random(511)
    val ts = (1 to 300).scanLeft(0L)((acc, _) =>
      acc + rnd.nextInt(40) + 1).toSeq
    val df = events(ts).unionByName(events(ts.map(_ * 3 + 7), key = "b"))
    val plain = graft.events.EventOps.downtime(df, 12L, 100L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    for (width <- Seq(25L, 170L, 4000L)) {
      val b = graft.events.EventOps.downtime(df, 12L, 100L,
        bucketBy = Some(floor(col("t") / width)))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(b == plain, s"bucket width $width diverged")
    }
  }

  private def intervals(rows: Seq[(Long, Long)], key: String = "a"): DataFrame = {
    val s = spark
    import s.implicits._
    rows.map { case (a, b) => (key, a, b) }.toDF("key", "t0", "t1")
  }

  test("intervalUnion: nested interval extends nothing (running max, not lag)") {
    // [10,20) nests inside [0,100); [90,150) overlaps the OUTER end;
    // [150,160) touches; [200,210) is a separate island
    val out = graft.core.SeriesOps.intervalUnion(intervals(Seq(
      (0L, 100L), (10L, 20L), (90L, 150L), (150L, 160L), (200L, 210L))))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    assert(out == Seq((0L, 160L, 4L), (200L, 210L, 1L)))
  }

  test("intervalUnion: duplicates merge; single interval passes through") {
    val out = graft.core.SeriesOps.intervalUnion(intervals(Seq(
      (5L, 9L), (5L, 9L), (30L, 31L))))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    assert(out == Seq((5L, 9L, 2L), (30L, 31L, 1L)))
  }

  test("intervalDifference: punch-out, trim, swallow, untouched island") {
    // a-coverage [0,100) ∪ [200,300); b punches [20,40) out of the first
    // (split), trims its tail from 90, swallows nothing of the second
    val out = graft.core.SeriesOps.intervalDifference(
      intervals(Seq((0L, 60L), (50L, 100L), (200L, 300L))),
      intervals(Seq((20L, 30L), (25L, 40L), (90L, 120L))))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq.sortBy(_._1)
    assert(out == Seq((0L, 20L), (40L, 90L), (200L, 300L)))
  }

  test("intervalDifference: b fully covers / empty b / touching edges") {
    // full cover -> nothing survives
    assert(graft.core.SeriesOps.intervalDifference(
      intervals(Seq((10L, 20L))), intervals(Seq((0L, 30L)))).isEmpty)
    // empty b -> the union of a, unchanged
    val noB = graft.core.SeriesOps.intervalDifference(
      intervals(Seq((10L, 20L), (15L, 25L))),
      intervals(Seq.empty[(Long, Long)]))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(noB == Seq((10L, 25L)))
    // b touching a's edges removes nothing: [0,10) and [20,30) vs [10,20)
    val touch = graft.core.SeriesOps.intervalDifference(
      intervals(Seq((10L, 20L))),
      intervals(Seq((0L, 10L), (20L, 30L))))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(touch == Seq((10L, 20L)))
  }

  test("intervalDifference: random ≡ brute-force point-set difference") {
    val rnd = new scala.util.Random(41)
    def gen(n: Int) = (0 until n).map { _ =>
      val a = rnd.nextInt(500).toLong; (a, a + 1 + rnd.nextInt(60)) }
    val a = gen(60); val b = gen(25)
    val got = graft.core.SeriesOps.intervalDifference(
      intervals(a), intervals(b))
      .collect().flatMap(r => r.getLong(1) until r.getLong(2)).toSet
    val want = a.flatMap { case (x, y) => x until y }.toSet --
      b.flatMap { case (x, y) => x until y }.toSet
    assert(got == want)
  }

  /** Sequential in-memory Holt reference (Wright's irregular form) on
    * strictly-increasing times — the ground truth the distributed
    * matrix-affine scan must reproduce. */
  private def seqHolt(pts: Seq[(Long, Double)], tauL: Double, tauB: Double):
      Seq[(Long, Double, Double)] = {
    var l = 0.0; var b = 0.0; var prev = Long.MinValue; var init = false
    pts.sortBy(_._1).map { case (t, x) =>
      if (!init) { l = x; b = 0.0; init = true }
      else {
        val dt = (t - prev).toDouble
        if (dt > 0) {
          val u = math.exp(-dt / tauL); val w = math.exp(-dt / tauB)
          val lNew = (1 - u) * x + u * (l + dt * b)
          b = (1 - w) * (lNew - l) / dt + w * b
          l = lNew
        }
      }
      prev = t
      (t, l, b)
    }
  }

  test("holt: distributed matrix scan == sequential reference at 3 widths") {
    val rnd = new scala.util.Random(733)
    val keys = Seq("a", "b", "c")
    val pts = keys.map { k =>
      var t = 0L
      k -> (1 to 250).map { _ =>
        t += 1 + rnd.nextInt(500); (t, rnd.nextGaussian() * 3 + 10)
      }
    }.toMap
    val s = spark
    import s.implicits._
    val df = pts.toSeq.flatMap { case (k, ps) =>
      ps.map { case (t, x) => (k, t, x) }
    }.toDF("key", "t", "v")
    val ref = pts.map { case (k, ps) =>
      k -> seqHolt(ps, 700.0, 2100.0).map(x => x._1 -> (x._2, x._3)).toMap
    }
    for (width <- Seq(97L, 1500L, 1000000L)) {
      val out = graft.regularize.Regularize.holt(df, 700.0, 2100.0, width)
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getDouble(3), r.getDouble(4)))
      assert(out.length == 750)
      out.foreach { case (k, t, l, b) =>
        val (rl, rb) = ref(k)(t)
        assert(math.abs(l - rl) <= 1e-9 * math.max(1.0, math.abs(rl)),
          s"level $k@$t: $l vs $rl (width $width)")
        assert(math.abs(b - rb) <= 1e-9 * math.max(1.0, math.abs(rb)),
          s"trend $k@$t: $b vs $rb (width $width)")
      }
    }
  }

  test("holt: constant series keeps level constant and trend zero") {
    val df = seriesL((1 to 50).map(i => (i.toLong * 13, Some(4.25))))
    val out = graft.regularize.Regularize.holt(df, 50.0, 150.0, 100L)
      .collect().map(r => (r.getDouble(3), r.getDouble(4)))
    out.foreach { case (l, b) =>
      assert(math.abs(l - 4.25) < 1e-12 && math.abs(b) < 1e-12)
    }
  }

  test("holt: first point seeds (x, 0); duplicate timestamps keep state") {
    val s = spark
    import s.implicits._
    val df = Seq(("k", 10L, 7.0), ("k", 10L, 9.0), ("k", 30L, 8.0),
      ("k", 30L, 8.0)).toDF("key", "t", "v")
    val out = graft.regularize.Regularize.holt(df, 20.0, 60.0, 25L)
      .collect().map(r => (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).sortBy(x => (x._1, x._2))
    // row (10, 7) seeds; (10, 9) is a dup-time no-op; (30, 8) steps once;
    // the second (30, 8) is again a no-op sharing the stepped state
    assert(out(0) == ((10L, 7.0, 7.0, 0.0)))
    assert(out(1) == ((10L, 9.0, 7.0, 0.0)))
    val expect = seqHolt(Seq((10L, 7.0), (30L, 8.0)), 20.0, 60.0).last
    assert(out(2)._1 == 30L && math.abs(out(2)._3 - expect._2) < 1e-12 &&
      math.abs(out(2)._4 - expect._3) < 1e-12)
    assert(out(3) == out(2).copy(_2 = 8.0))
  }

  test("ewmaGrid/holtGrid: track the float scans and are partition-deterministic") {
    val rnd = new scala.util.Random(20260820)
    val keys = Seq("a", "b", "c")
    val pts = keys.map { k =>
      var t = 0L
      k -> (1 to 250).map { _ =>
        t += 1 + rnd.nextInt(500); (t, rnd.nextGaussian() * 3 + 10)
      }
    }.toMap
    val s = spark
    import s.implicits._
    val df = pts.toSeq.flatMap { case (k, ps) =>
      ps.map { case (t, x) => (k, t, x) }
    }.toDF("key", "t", "v")
    // grid quantization is O(2^-20) per step: the engine-exact variants
    // must track the float scans to well under the 6-dp output round
    val eF = graft.regularize.Regularize.ewma(df, 700.0, 2000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)) -> r.getDouble(3)).toMap
    val eG = graft.regularize.Regularize.ewmaGrid(df, 700.0, 2000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)) -> r.getDouble(3)).toMap
    assert(eG.keySet == eF.keySet)
    eG.foreach { case (k, y) =>
      assert(math.abs(y - eF(k)) <= 1e-4 * math.max(1.0, math.abs(eF(k))), s"ewmaGrid $k: $y vs ${eF(k)}")
    }
    val hF = graft.regularize.Regularize.holt(df, 700.0, 2100.0, 1500L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)) -> ((r.getDouble(3), r.getDouble(4)))).toMap
    val hG = graft.regularize.Regularize.holtGrid(df, 700.0, 2100.0, 1500L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)) -> ((r.getDouble(3), r.getDouble(4)))).toMap
    assert(hG.keySet == hF.keySet)
    hG.foreach { case (k, (l, b)) =>
      val (rl, rb) = hF(k)
      assert(math.abs(l - rl) <= 1e-4 * math.max(1.0, math.abs(rl)), s"holtGrid level $k")
      assert(math.abs(b - rb) <= 1e-4 * math.max(1.0, math.abs(rb)), s"holtGrid trend $k")
    }
    // the engine-exactness claim WITHIN Spark: different physical
    // partitionings must produce bit-identical doubles (the quantized
    // formulas leave no order-dependent float op outside a defined order)
    def bitsE(d: org.apache.spark.sql.DataFrame) =
      graft.regularize.Regularize.ewmaGrid(d, 700.0, 2000L).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSet
    assert(bitsE(df.repartition(7)) == bitsE(df.repartition(3)))
    def bitsH(d: org.apache.spark.sql.DataFrame) =
      graft.regularize.Regularize.holtGrid(d, 700.0, 2100.0, 1500L).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          java.lang.Double.doubleToLongBits(r.getDouble(3)),
          java.lang.Double.doubleToLongBits(r.getDouble(4)))).toSet
    assert(bitsH(df.repartition(7)) == bitsH(df.repartition(3)))
  }

  test("rdp: error bound holds, straight lines collapse, spikes survive") {
    val s = spark
    import s.implicits._
    // exact straight line -> only the endpoints survive any eps > 0
    val line = (1 to 50).map(i => ("k", i.toLong * 10, i.toDouble))
      .toDF("key", "t", "v")
    val flat = Rollup.rdp(line, binUs = 10L, epsMilli = 1)
      .collect().map(_.getInt(1)).sorted
    assert(flat.toSeq == Seq(1, 50))
    // a single spike must be kept at any eps below its height
    val spike = (1 to 50).map(i =>
      ("k", i.toLong * 10, if (i == 17) 9.0 else 1.0)).toDF("key", "t", "v")
    val kept = Rollup.rdp(spike, 10L, epsMilli = 500)
      .collect().map(_.getInt(1)).toSet
    assert(kept.contains(17))
    // error-bound property on random data: every dropped point is within
    // eps of the kept polyline (the RDP guarantee, checked in exact
    // rational arithmetic: |cross| <= eps * |segment| per covering seg)
    val rnd = new scala.util.Random(42)
    val xs = (1 to 200).map(_ => rnd.nextInt(2000).toLong)
    val df = xs.zipWithIndex.map { case (x, i) =>
      ("k", (i + 1).toLong * 10, x / 1000.0)
    }.toDF("key", "t", "v")
    val epsM = 300L
    val keptIdx = Rollup.rdp(df, 10L, epsM).collect().map(_.getInt(1)).sorted
    keptIdx.sliding(2).foreach { case Array(a, b) =>
      val (xa, xb) = (xs(a - 1), xs(b - 1))
      val (di, dx) = (BigInt(b - a), BigInt(xb - xa))
      val seg2 = di * di + dx * dx
      ((a + 1) until b).foreach { i =>
        val cross = di * BigInt(xs(i - 1) - xa) - dx * BigInt(i - a)
        assert(cross * cross <= BigInt(epsM) * BigInt(epsM) * seg2,
          s"dropped point $i violates the eps bound on segment ($a, $b)")
      }
    case _ => ()
    }
  }

  test("seasonalMannKendall: deseasonalized trend seen, cross-season trends cancel") {
    val s = spark
    import s.implicits._
    val HOUR = 3600000000L
    // strong 2-season cycle + small monotone drift: same-season pairs
    // all increase -> 'increasing'; plain MK would see the cycle noise
    val trended = (0 until 96).map { i =>
      ("k", i.toLong * HOUR, (if (i % 2 == 0) 100.0 else 10.0) + i * 0.5)
    }.toDF("key", "t", "v")
    val out = graft.events.Correlation
      .seasonalMannKendall(trended, seasons = 2, minBins = 24)
      .head()
    assert(out.getString(5) == "increasing" && out.getLong(3) > 0)
    // season 0 rises exactly as season 1 falls: same-season S's cancel
    val canceling = (0 until 96).map { i =>
      ("k", i.toLong * HOUR,
        if (i % 2 == 0) 100.0 + (i / 2) else 100.0 - (i / 2))
    }.toDF("key", "t", "v")
    val c = graft.events.Correlation
      .seasonalMannKendall(canceling, seasons = 2, minBins = 24)
      .head()
    assert(c.getLong(3) == 0L && c.getString(5) == "no_trend")
  }

  test("siegelSlope: exact on a line; majority-corrupted bins cannot move it") {
    val s = spark
    import s.implicits._
    val HOUR = 3600000000L
    // clean line: 2.5 units/hour
    val line = (0 until 40).map(i => ("k", i.toLong * HOUR, 10.0 + 2.5 * i))
      .toDF("key", "t", "v")
    val clean = graft.events.Correlation.siegelSlope(line).head()
    assert(math.abs(clean.getDouble(2) - 2.5) < 1e-5)
    // corrupt 45% of the bins with wild values: the repeated median's
    // 50% breakdown keeps the slope at 2.5 (Theil-Sen's 29% would not)
    val corrupted = (0 until 40).map { i =>
      ("k", i.toLong * HOUR,
        if (i % 9 < 4) 1e6 * (i % 3 - 1) else 10.0 + 2.5 * i)
    }.toDF("key", "t", "v")
    val rob = graft.events.Correlation.siegelSlope(corrupted).head()
    assert(math.abs(rob.getDouble(2) - 2.5) < 0.1,
      s"slope ${rob.getDouble(2)} moved under 45% corruption")
  }

  test("tfidfCosinePairs: identical docs rank 1 at cos 1; df cap prunes boilerplate") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "zeta eta theta iota kappa"),
      (4L, "alpha zeta lambda mu nu")).toDF("doc_id", "text")
    val out = TextOps.tfidfCosinePairs(docs, k = 3, maxDf = 50, minShared = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3), r.getInt(4)))).toMap
    assert(out((1L, 2L))._2 == 1.0 && out((1L, 2L))._3 == 1)
    assert(!out.contains((1L, 3L))) // no 3 shared terms
    // a term in every doc beyond the cap generates no pairs on its own
    val boiler = (1L to 6L).map(id => (id, s"common filler$id x$id y$id z$id"))
      .toDF("doc_id", "text")
    assert(TextOps.tfidfCosinePairs(boiler, maxDf = 5, minShared = 1)
      .count() == 0)
  }

  test("intervalUnion: plain == bucketed at three widths") {
    val rnd = new scala.util.Random(613)
    val rows = (1 to 400).map { _ =>
      val a = rnd.nextInt(5000).toLong; (a, a + 1 + rnd.nextInt(120))
    }
    val df = intervals(rows)
      .unionByName(intervals(rows.map { case (a, b) => (a + 13, b + 13) }, "b"))
    val plain = graft.core.SeriesOps.intervalUnion(df)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    for (width <- Seq(37L, 500L, 100000L)) {
      val b = graft.core.SeriesOps.intervalUnion(df,
        bucketBy = Some(floor(col("t0") / width)))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(b == plain, s"bucket width $width diverged")
    }
  }
}
