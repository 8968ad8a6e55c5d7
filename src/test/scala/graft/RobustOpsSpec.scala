package graft

import graft.categorical.CategoricalOps
import graft.events.{Correlation, EventOps}
import graft.regularize.Regularize
import org.apache.spark.sql.functions._

/** Hand-checked semantics for the robust/elastic analytics family:
  * staleness-bounded sampling, state dwell run-lengths, median/MAD
  * outliers, two-sided level shift, banded DTW.
  */
class RobustOpsSpec extends SparkSpec {

  private val nullD = lit(null).cast("double")

  test("samplePreviousStale: carried value expires past maxAge, inclusive") {
    val pts = seriesL(Seq((0L, Some(1.0)), (100L, Some(2.0))))
    val probes = seriesL(
      Seq((0L, None), (50L, None), (150L, None), (200L, None), (250L, None)))
      .select("key", "t")
    val out = collectTVL(
      Regularize.samplePreviousStale(pts, probes, nullD, maxAgeUs = 100L))
    assert(out == Seq(
      0L -> Some(1.0),   // age 0
      50L -> Some(1.0),  // age 50
      150L -> Some(2.0), // age 50 from the t=100 point
      200L -> Some(2.0), // age exactly maxAge still answers
      250L -> None))     // age 150 > maxAge -> stale
  }

  test("samplePreviousStale: before first measurement reads default") {
    val pts = seriesL(Seq((100L, Some(5.0))))
    val probes = seriesL(Seq((0L, None), (100L, None))).select("key", "t")
    val out = collectTVL(
      Regularize.samplePreviousStale(pts, probes, lit(-1.0), maxAgeUs = 50L))
    assert(out == Seq(0L -> Some(-1.0), 100L -> Some(5.0)))
  }

  test("samplePreviousStale with huge maxAge degenerates to samplePrevious") {
    val rnd = new scala.util.Random(777)
    val pts = seriesL((0 until 50).map(_ =>
      (rnd.nextInt(1000).toLong, Some(rnd.nextDouble() * 10))))
    val probes = seriesL((0 to 20).map(i => (i * 50L, None))).select("key", "t")
    val stale = collectTVL(
      Regularize.samplePreviousStale(pts, probes, nullD, maxAgeUs = 1000000L))
    val plain = collectTVL(Regularize.samplePrevious(pts, probes, nullD))
    assert(stale == plain)
  }

  test("dwellStats: repeated states compact into runs; last run open") {
    val s = spark
    import s.implicits._
    val pts = Seq(
      ("u", 0L, "A"), ("u", 10L, "A"), ("u", 30L, "B"),
      ("u", 50L, "A"), ("u", 70L, "B"))
      .toDF("key", "t", "sv")
    val out = CategoricalOps.dwellStats(pts)
      .collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .sortBy(_._1)
    // A: runs [0,30) and [50,70); B: run [30,50); B@70 is unterminated
    assert(out.toSeq == Seq(
      ("A", 2L, 50L, 30L, 25.0),
      ("B", 1L, 20L, 20L, 20.0)))
  }

  test("dwellStats: single-state series has no terminated run") {
    val s = spark
    import s.implicits._
    val pts = Seq(("u", 0L, "A"), ("u", 10L, "A")).toDF("key", "t", "sv")
    assert(CategoricalOps.dwellStats(pts).count() == 0L)
  }

  test("madAnomaly: Hampel rule on a hand-computed bucket") {
    val pts = seriesL((1 to 9).map(i => (i.toLong, Some(i.toDouble))) :+
      (10L, Some(100.0)))
    val out = EventOps.madAnomaly(pts, bucketUs = 1000L, nMad = 3.5, minN = 4)
      .collect()
      .map(r => (r.getLong(2), if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        r.getInt(5)))
      .sortBy(_._1)
    // milli-units: med = 5500, devs sorted twice -> mad = 2500
    val byT = out.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byT(10L) == ((Some(37.8), 1))) // 94500 / 2500
    assert(byT(5L) == ((Some(0.2), 0)))   // 500 / 2500
    assert(byT(1L) == ((Some(1.8), 0)))   // 4500 / 2500
    assert(out.count(_._3 == 1) == 1)
  }

  test("madAnomaly: zero MAD or tiny buckets emit null score, flag 0") {
    val const = seriesL((1 to 6).map(i => (i.toLong, Some(7.0))))
    val c = EventOps.madAnomaly(const, bucketUs = 1000L).collect()
    assert(c.forall(r => r.isNullAt(4) && r.getInt(5) == 0))
    val tiny = seriesL(Seq((1L, Some(1.0)), (2L, Some(99.0))))
    val t = EventOps.madAnomaly(tiny, bucketUs = 1000L, minN = 4).collect()
    assert(t.forall(r => r.isNullAt(4) && r.getInt(5) == 0))
  }

  test("levelShift: fires exactly at the step, warm-up rows are null") {
    val pts = seriesL((1 to 6).map(i =>
      (i.toLong, Some(if (i <= 3) 1.0 else 11.0))))
    val out = EventOps.levelShift(pts, w = 3, threshold = 5.0)
      .collect()
      .map(r => (r.getLong(1), if (r.isNullAt(5)) None else Some(r.getDouble(5)),
        r.getInt(6)))
      .sortBy(_._1)
    val byT = out.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byT(4L) == ((Some(10.0), 1))) // (33 - 3) / 3
    // every other position lacks a full window on one side
    assert(out.filter(_._1 != 4L).forall(r => r._2.isEmpty && r._3 == 0))
  }

  test("levelShift: sub-threshold step reports shift but no flag") {
    val pts = seriesL((1 to 6).map(i =>
      (i.toLong, Some(if (i <= 3) 1.0 else 3.0))))
    val out = EventOps.levelShift(pts, w = 3, threshold = 5.0)
      .filter(col("shift").isNotNull).head()
    assert(out.getDouble(5) == 2.0 && out.getInt(6) == 0)
  }

  test("dtwBanded matches the exact full DP when the band covers it") {
    val rnd = new scala.util.Random(31337)
    for (_ <- 0 until 20) {
      val x = Array.fill(3 + rnd.nextInt(20))(rnd.nextInt(1000).toLong)
      val y = Array.fill(3 + rnd.nextInt(20))(rnd.nextInt(1000).toLong)
      val full = exactDtw(x, y)
      val banded = Correlation.dtwBanded(x, y, band = x.length + y.length)
      assert(banded.contains(full), s"banded $banded != exact $full")
      // a narrow band can only restrict paths, never find a cheaper one
      Correlation.dtwBanded(x, y, band = 2)
        .foreach(b => assert(b >= full))
    }
  }

  test("dtwBanded: identity is zero, empty side is None") {
    val x = Array(5L, 9L, 1L, 4L)
    assert(Correlation.dtwBanded(x, x, band = 4).contains(0L))
    assert(Correlation.dtwBanded(x, Array.empty[Long], band = 4).isEmpty)
  }

  test("dtwPairs: phase-shifted identical sequences are distance zero") {
    val s = spark
    import s.implicits._
    // same values, bins shifted by one: the sparse grid skips gaps, so
    // the SEQUENCES are identical and DTW = 0
    val pts = (Seq(("a", 5L, 1.0), ("a", 15L, 2.0), ("a", 25L, 3.0)) ++
      Seq(("b", 15L, 1.0), ("b", 25L, 2.0), ("b", 35L, 3.0)))
      .toDF("key", "t", "v")
    val r = Correlation.dtwPairs(pts, binUs = 10L, band = 4).head()
    assert(r.getString(0) == "a" && r.getString(1) == "b")
    assert(r.getInt(2) == 3 && r.getInt(3) == 3)
    assert(r.getDouble(4) == 0.0)
  }

  test("dtwPairs: warped series beats any fixed-lag alignment shape") {
    val s = spark
    import s.implicits._
    // b stretches a's middle plateau: DTW should absorb it cheaply
    val a = Seq(1.0, 5.0, 5.0, 1.0)
    val b = Seq(1.0, 5.0, 5.0, 5.0, 5.0, 1.0)
    val pts = (a.zipWithIndex.map { case (v, i) => ("a", i * 10L + 5, v) } ++
      b.zipWithIndex.map { case (v, i) => ("b", i * 10L + 5, v) })
      .toDF("key", "t", "v")
    val r = Correlation.dtwPairs(pts, binUs = 10L, band = 6).head()
    assert(r.getDouble(4) == 0.0) // pure time warp, no value cost
  }

  test("burstRate: trailing RANGE baseline skips empty hours; warm-up gated") {
    val H = 3600000000L
    // hours 0..23: 1 event each (warm-up); hour 30: 6 events; base for
    // hour 30 covers hours 6..29 -> 18 events present
    val pts = seriesL((0 until 24).map(h => (h * H + 1, Some(1.0))) ++
      (0 until 6).map(i => (30 * H + i * 1000L, Some(1.0))))
    val out = EventOps.burstRate(pts, baseHours = 24, factor = 2,
      binUs = H).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)), r.getInt(5)))
      .sortBy(_._1)
    val byH = out.map(r => r._1 -> r).toMap
    // warm-up rows: no ratio, no flag
    assert(out.filter(_._1 < 24).forall(r => r._4.isEmpty && r._5 == 0))
    // hour 30: n=6, base=18 (hours 6..23 have one event each), ratio 8
    assert(byH(30L) == ((30L, 6L, 18L, Some(8.0), 1)))
  }

  test("olsTrend: exact fit on a perfect line; degenerate buckets null") {
    // v = 2 + 36/hour * x  ->  slope 36.0/hr, intercept 2, r2 = 1
    val pts = seriesL((0 until 10).map(i =>
      (i * 100000000L, Some(2.0 + i * 0.001)))) // 0.001 per 100s = 36/hr... no:
    // 0.001 per 100 s = 0.036/hr
    val out = EventOps.olsTrend(pts, bucketUs = 86400000000L, minN = 3).head()
    assert(out.getLong(2) == 10L)
    assert(out.getDouble(3) == 0.036) // slope per hour
    assert(out.getDouble(4) == 2.0)   // intercept at bucket start
    assert(out.getDouble(5) == 1.0)   // perfect fit
    val const = seriesL((0 until 5).map(i => (i * 1000000L, Some(3.0))))
    val c = EventOps.olsTrend(const, bucketUs = 86400000000L).head()
    assert(c.isNullAt(3) && c.isNullAt(4) && c.isNullAt(5))
  }

  test("debounce: greedy chain, duplicates collapse, per-key independence") {
    val s = spark
    import s.implicits._
    val pts = Seq(
      ("a", 0L), ("a", 0L), ("a", 50L), ("a", 100L), ("a", 160L), ("a", 210L),
      ("b", 5L))
      .toDF("key", "t")
    val out = EventOps.debounce(pts, cooldownUs = 100L)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(identity)
    // a: keep 0 (dup collapses), skip 50, keep 100, skip 160, keep 210
    assert(out.toSeq == Seq(("a", 0L), ("a", 100L), ("a", 210L), ("b", 5L)))
  }

  test("debounce matches a sequential reference on seeded data") {
    val rnd = new scala.util.Random(90210)
    val ts = (0 until 300).map(_ => rnd.nextInt(100000).toLong).distinct
    val pts = seriesL(ts.map(t => (t, Some(1.0)))).select("key", "t")
    val got = EventOps.debounce(pts, cooldownUs = 777L)
      .collect().map(_.getLong(1)).sorted.toSeq
    val expected = ts.sorted.foldLeft(List.empty[Long]) { (kept, t) =>
      if (kept.isEmpty || t >= kept.head + 777L) t :: kept else kept
    }.reverse
    assert(got == expected)
  }

  /** Classic unbanded O(nm) DTW on long costs — the test reference. */
  private def exactDtw(x: Array[Long], y: Array[Long]): Long = {
    val n = x.length
    val m = y.length
    val INF = Long.MaxValue / 4
    val d = Array.fill(n + 1, m + 1)(INF)
    d(0)(0) = 0L
    for (i <- 1 to n; j <- 1 to m)
      d(i)(j) = math.abs(x(i - 1) - y(j - 1)) +
        math.min(d(i - 1)(j), math.min(d(i)(j - 1), d(i - 1)(j - 1)))
    d(n)(m)
  }
}
