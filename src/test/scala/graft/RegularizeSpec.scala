package graft

import graft.core.SeriesOps
import graft.regularize.{CalendarFloor, Regularize}
import graft.rollup.Rollup
import org.apache.spark.sql.functions._

class RegularizeSpec extends SparkSpec {
  private val nullD = lit(null).cast("double")
  val ts5L = Seq((1L, Some(2.0)), (2L, Some(3.0)), (6L, Some(1.0)), (8L, Some(4.0)))

  def gridOf(times: Seq[Long]) = {
    val s = spark
    import s.implicits._
    times.toDF("t")
  }

  test("sample previous matches reference grid goldens (test_methods.py:128-134)") {
    val df = seriesL(ts5L)
    val out = Regularize.samplePrevious(df, Regularize.gridDf(df, gridOf(1L to 8L)), nullD)
    approxEq(collectTV(out), Goldens.sampleInt)
    val out0 = Regularize.samplePrevious(df, Regularize.gridDf(df, gridOf(0L to 10L)), nullD)
    approxEq(collectTV(out0), Goldens.sampleInt0)
  }

  test("sample linear matches reference get(t, linear)") {
    val df = seriesL(ts5L)
    val out = Regularize.sampleLinear(df, Regularize.gridDf(df, gridOf(0L to 10L)), nullD)
    approxEq(collectTV(out), Goldens.sampleLinInt)
  }

  test("sampleLinearBounded: ∞-gap limit equals sampleLinear; wide gaps null") {
    val df = seriesL(ts5L)
    val grid = Regularize.gridDf(df, gridOf(0L to 10L))
    // bound wider than any gap -> identical to the unbounded form
    val unbounded = collectTV(Regularize.sampleLinear(df, grid, nullD))
    approxEq(collectTV(
      Regularize.sampleLinearBounded(df, grid, nullD, maxGapUs = 100L)),
      unbounded)
    // bound 3: the 2->6 gap (width 4) nulls its INTERIOR probes only;
    // exact hits (t=2, t=6), before-first and after-last are untouched
    val got = collectTV(
      Regularize.sampleLinearBounded(df, grid, nullD, maxGapUs = 3L))
    val expect = unbounded.map {
      case (t, _) if t >= 3 && t <= 5 => (t, None)
      case other => other
    }
    approxEq(got, expect)
  }

  test("moving average center matches reference (test_methods.py:216-219)") {
    val df = seriesL(ts5L)
    val out = Regularize.movingAverage(df, Regularize.gridLongs(2, 8, 1), 2, "center", nullD)
      .withColumnRenamed("mean", "v")
    approxEq(collectTV(out), Goldens.movingAvgInt)
  }

  test("moving average left/right placements") {
    val df = seriesL(ts5L)
    val l = Regularize.movingAverage(df, Regularize.gridLongs(2, 8, 1), 2, "left", nullD)
      .withColumnRenamed("mean", "v")
    approxEq(collectTV(l), Goldens.movingAvgLeft)
    val r = Regularize.movingAverage(df, Regularize.gridLongs(2, 8, 1), 2, "right", nullD)
      .withColumnRenamed("mean", "v")
    approxEq(collectTV(r), Goldens.movingAvgRight)
  }

  test("moving average None handling (all-None window -> null)") {
    val df = seriesL(Seq((0L, Some(1.0)), (2L, None), (4L, Some(3.0)), (6L, Some(0.0))))
    val out = Regularize.movingAverage(df, Regularize.gridLongs(0, 6, 1), 2, "center", nullD)
      .withColumnRenamed("mean", "v")
    approxEq(collectTV(out), Goldens.movingAvgNone)
  }

  test("sample_interval daily mean/max match pandas goldens (test_traces_external.py:32-119)") {
    val us = 1000000L
    def dt(y: Int, m: Int, d: Int, h: Int = 0): Long =
      (java.time.LocalDateTime.of(y, m, d, h, 0).toEpochSecond(java.time.ZoneOffset.UTC)) * us
    var df = seriesL(Seq((dt(2012, 1, 1), Some(400.0)), (dt(2012, 3, 1), Some(400.0))))
    df = SeriesOps.setInterval(df, lit(dt(2012, 1, 4, 12)), lit(dt(2012, 1, 20, 12)), lit(10.0), nullD)
    df = SeriesOps.setInterval(df, lit(dt(2012, 1, 9, 12)), lit(dt(2012, 1, 15, 12)), lit(50.0), nullD)
    df = SeriesOps.setInterval(df, lit(dt(2012, 2, 1, 12)), lit(dt(2012, 2, 7, 12)), lit(100.0), nullD)
    val out = Regularize.sampleInterval(df, dt(2012, 1, 1), dt(2012, 2, 10), 86400L * us, nullD)
    val got = out.select(col("cell_start"), col("mean"), col("max")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    val expMean = Goldens.sampleIntervalMean.toMap
    val expMax = Goldens.sampleIntervalMax.toMap
    assert(got.length == expMean.size)
    got.foreach { case (t, mean, mx) =>
      assert(math.abs(mean - expMean(t).get) < 1e-9, s"mean at $t: $mean vs ${expMean(t)}")
      assert(mx == expMax(t).get, s"max at $t")
    }
  }

  test("sample_interval ffill fills all-null cells forward; leading nulls stay (timeseries.py:744-745)") {
    // segments with null default: [0,12) null, [12,18) 5, [18,32) null, [32,40) 7
    val df = seriesL(Seq(12L -> Some(5.0), 18L -> None, 32L -> Some(7.0)))
    def cells(ffill: Boolean): Map[Long, (Option[Double], Option[Double], Option[Double])] =
      Regularize.sampleInterval(df, 0L, 40L, 10L, nullD, ffill = ffill)
        .collect()
        .map { r =>
          def g(i: Int) = if (r.isNullAt(i)) None else Some(r.getDouble(i))
          r.getLong(1) -> ((g(2), g(3), g(4)))
        }.toMap
    val plain = cells(ffill = false)
    assert(plain(0L) == ((None, None, None)))          // all-null cell
    assert(plain(10L) == ((Some(3.0), Some(5.0), Some(5.0)))) // 5*6/10
    assert(plain(20L) == ((None, None, None)))         // all-null cell
    assert(plain(30L) == ((Some(5.6), Some(7.0), Some(7.0)))) // 7*8/10
    val filled = cells(ffill = true)
    assert(filled(0L) == ((None, None, None)))         // leading NaN stays (pandas ffill)
    assert(filled(20L) == ((Some(3.0), Some(5.0), Some(5.0)))) // carried from cell 1
    assert(filled(10L) == plain(10L) && filled(30L) == plain(30L))
  }

  test("sampleMasked restarts the grid per mask period, inclusive of each end (timeseries.py:592-614)") {
    // series: 0->1, 100->2; mask periods [0,25] and [40,45] (global mask)
    val df = seriesL(Seq(0L -> Some(1.0), 100L -> Some(2.0)))
    val s = spark; import s.implicits._
    val mask = Seq((0L, 25L), (40L, 45L)).toDF("m0", "m1")
    val got = collectTV(Regularize.sampleMasked(df, mask, 10L, nullD)).sortBy(_._1)
    // first period anchors 0,10,20 (25 not a multiple); second restarts at 40
    assert(got == Seq(0.0 -> Some(1.0), 10.0 -> Some(1.0), 20.0 -> Some(1.0),
      40.0 -> Some(1.0)))
    // inclusive end: period [0,20] emits t=20 (reference `while current <= end`)
    val inc = collectTV(Regularize.sampleMasked(df, Seq((0L, 20L)).toDF("m0", "m1"), 10L, nullD))
    assert(inc.map(_._1).sorted == Seq(0.0, 10.0, 20.0))
  }

  test("sampleIntervalAt with uniform cells equals sampleInterval; non-uniform widths divide correctly") {
    val s = spark; import s.implicits._
    val pts = seriesL(Seq(0L -> Some(2.0), 35L -> Some(6.0), 80L -> Some(1.0), 90L -> None))
    // uniform boundaries 0,20,...,100 must reproduce the arithmetic-grid path
    val uni = (0L to 100L by 20).toSeq
    val uniCells = uni.zip(uni.drop(1)).toDF("cell_start", "cell_end")
    val viaIdx = Regularize.sampleIntervalAt(pts, uniCells, 0L, 100L, nullD, 7L)
      .select("key", "cell_start", "mean", "min", "max")
    val viaGrid = Regularize.sampleInterval(pts, 0L, 100L, 20L, nullD)
      .select("key", "cell_start", "mean", "min", "max")
    assert(viaIdx.exceptAll(viaGrid).isEmpty && viaGrid.exceptAll(viaIdx).isEmpty,
      s"idx ${viaIdx.collect().toSeq} vs grid ${viaGrid.collect().toSeq}")
    // non-uniform cells [0,10) and [10,50): means divide by 10 and 40
    val cells = Seq((0L, 10L), (10L, 50L)).toDF("cell_start", "cell_end")
    val got = Regularize.sampleIntervalAt(pts, cells, 0L, 50L, nullD, 7L)
      .orderBy("cell_start")
      .collect().map(r => (r.getLong(1), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    // [0,10): constant 2.0; [10,50): 2.0 for 25µs then 6.0 for 15µs -> (25*2+15*6)/40
    assert(got == Seq((0L, 2.0, 2.0, 2.0), (10L, (25 * 2.0 + 15 * 6.0) / 40, 2.0, 6.0)), s"$got")
  }

  test("sampleMasked chunked grid is innerLen-invariant (incl. boundary-exact masks)") {
    // probes must not depend on the chunk size: innerLen=3 forces several
    // outer chunks, incl. a mask end landing exactly on an outer boundary
    // (m1 = m0 + k*innerLen*period) and a short tail chunk
    val df = seriesL(Seq(0L -> Some(1.0), 500L -> Some(2.0)))
    val s = spark; import s.implicits._
    val masks = Seq(
      Seq((0L, 90L)),           // 0..90: end on outer boundary at innerLen=3, period=10
      Seq((0L, 95L)),           // tail chunk shorter than innerLen
      Seq((5L, 5L)),            // degenerate single-probe period
      Seq((0L, 29L), (60L, 200L))) // multiple periods
    for (m <- masks) {
      val mask = m.toDF("m0", "m1")
      val small = collectTV(Regularize.sampleMasked(df, mask, 10L, nullD, innerLen = 3L)).sorted
      val big = collectTV(Regularize.sampleMasked(df, mask, 10L, nullD, innerLen = 1 << 20)).sorted
      assert(small == big, s"mask $m: innerLen=3 gave $small, unchunked gave $big")
    }
  }

  test("calendar floor weeks reproduces Python %W quirk (utils.py:91-128)") {
    // 2018-12-13 07:43:15 floors to Monday 2018-12-10 (test_methods.py:254-284)
    assert(CalendarFloor.floorMicros(Goldens.binStartUs, "weeks") == 1544400000000000L)
  }

  test("bin('weeks') with mask matches reference golden incl 30581 cell") {
    val points = seriesL(Goldens.binPoints)
    val maskSeries = seriesL(Goldens.binMask.map { case (t, b) => (t, Some(if (b) 1.0 else 0.0)) })
    val bounds = CalendarFloor.binBoundaries(Goldens.binStartUs, Goldens.binEndUs, "weeks")
    val mask = SeriesOps
      .trueIntervals(maskSeries, lit(bounds.head), lit(bounds.last), lit(0.0))
      .drop("key")
    val out = Rollup.bin(points, Goldens.binStartUs, Goldens.binEndUs, "weeks", 1, Some(mask))
    val got = out.select(col("bin_start"), col("v"), col("weight"))
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1)), r.getLong(2) / 1e6))
      .sortBy(x => (x._1, x._2.getOrElse(-1.0)))
    val exp = Goldens.binWeekly.sortBy(x => (x._1, x._2.getOrElse(-1.0)))
    assert(got.length == exp.length, s"got ${got.toSeq} vs $exp")
    got.zip(exp).foreach { case ((t, v, w), (te, ve, we)) =>
      assert(t == te && v == ve && math.abs(w - we) < 1e-6, s"($t,$v,$w) vs ($te,$ve,$we)")
    }
  }

  test("rebin daily<-hourly equals direct daily binning (cascade exactness)") {
    val us = 1000000L
    val df = seriesL(Seq(
      (0L, Some(1.0)), (3600L * us + 7, Some(2.0)), (86400L * us * 2 + 5000, Some(3.0)),
      (86400L * us * 3, Some(1.5))))
    val start = 0L
    val end = 86400L * us * 4
    val hourly = Rollup.bin(df, start, end, "hours")
    val dailyDirect = Rollup.bin(df, start, end, "days")
    val dailyCascade = Rollup.rebin(hourly, Rollup.floorTo(86400L * us))
    // bins drop the partial tail bucket (reference datetime_range quirk), so
    // the two tiers cover different spans near `end`; compare the common
    // fully-covered days only
    val cut = 86400L * us * 2
    val a = dailyDirect.filter(col("bin_start") < cut)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val b = dailyCascade.filter(col("bin_start") < cut)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(a == b && a.nonEmpty)
  }

  test("sampleMasked drops inverted mask intervals as empty ranges") {
    val s2 = spark
    import s2.implicits._
    val pts = seriesL(Seq(0L -> Some(1.0), 100L -> Some(2.0)))
    val mask = Seq(("s", 40L, 20L), ("s", 0L, 30L)).toDF("key", "m0", "m1")
    val got = collectTVL(graft.regularize.Regularize.sampleMasked(pts, mask, 10L, lit(null)))
    assert(got == Seq(0L, 10L, 20L, 30L).map(_ -> Some(1.0)), got.toString)
  }

  test("imputeSeasonal: tier hierarchy exact > linear > seasonal > null") {
    val s2 = spark
    import s2.implicits._
    import graft.regularize.Regularize
    // period 10, bin 2 -> bins 0..4. Points at t=0 (v=10), t=2 (v=20),
    // t=50 (v=40): the 2..50 gap is wider than maxGap=10.
    val pts = seriesL(Seq(0L -> Some(10.0), 2L -> Some(20.0),
      50L -> Some(40.0)))
    val probes = Seq(0L, 1L, 2L, 13L, 30L, 51L)
      .map(("s", _)).toDF("key", "t")
    val out = Regularize.imputeSeasonal(pts, probes, maxGapUs = 10L,
      periodUs = 10L, binUs = 2L)
      .collect()
      .map(r => r.getLong(1) -> (Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.getString(3)))).toMap
    assert(out(0L) == (Some(10.0), Some("exact")))
    // t=1: inside the 0..2 gap (width 2 <= 10) -> linear midpoint
    assert(out(1L) == (Some(15.0), Some("linear")))
    assert(out(2L) == (Some(20.0), Some("exact")))
    // t=13: inside the over-wide 2..50 gap; bin (13%10)//2 = 1 has no
    // points (points fall in bins 0, 1? 0->0, 2->1, 50->0) -> bin 1 has
    // the t=2 point (v=20) -> seasonal 20.0
    assert(out(13L) == (Some(20.0), Some("seasonal")))
    // t=30: bin (30%10)//2 = 0 holds t=0 (10) and t=50 (40) -> mean 25
    assert(out(30L) == (Some(25.0), Some("seasonal")))
    // t=51: after last -> hold last value, classed linear
    assert(out(51L) == (Some(40.0), Some("linear")))
  }

  test("imputeSeasonal: a bin with no observations yields null src") {
    val s2 = spark
    import s2.implicits._
    import graft.regularize.Regularize
    // single point at t=0; probe t=5 in an empty bin far past maxGap
    val pts = seriesL(Seq(0L -> Some(1.0), 100L -> Some(2.0)))
    val probes = Seq(("s", 5L)).toDF("key", "t")
    val out = Regularize.imputeSeasonal(pts, probes, maxGapUs = 10L,
      periodUs = 10L, binUs = 5L).collect().head
    assert(out.isNullAt(2) && out.isNullAt(3))
  }
}
