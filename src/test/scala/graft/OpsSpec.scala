package graft

import graft.core.SeriesOps
import graft.rollup.Rollup
import org.apache.spark.sql.functions._

class OpsSpec extends SparkSpec {
  val ts1 = Seq((0.0, Some(0.0)), (2.0, Some(5.0)), (3.0, Some(0.0)), (4.0, Some(7.0)), (10.0, Some(3.0)))

  test("to_bool / invert matches reference truthiness (test_operations.py:201-207)") {
    val df = seriesD(ts1)
    assert(collectTV(SeriesOps.toBool(df)) ==
      Seq((0.0, Some(0.0)), (2.0, Some(1.0)), (3.0, Some(0.0)), (4.0, Some(1.0)), (10.0, Some(1.0))))
    // a_not golden: [(0,T),(2,F),(3,T),(4,F),(10,F)]
    assert(collectTV(SeriesOps.toBool(df, invert = true)) ==
      Seq((0.0, Some(1.0)), (2.0, Some(0.0)), (3.0, Some(1.0)), (4.0, Some(0.0)), (10.0, Some(0.0))))
    // None stays None
    assert(collectTV(SeriesOps.toBool(seriesD(Seq((1.0, None))))) == Seq((1.0, None)))
  }

  test("threshold (test_operations.py scalar ops)") {
    val df = seriesD(Seq((0.0, Some(1.0)), (1.0, Some(0.0)), (2.0, Some(3.0)), (3.0, Some(2.0))))
    assert(collectTV(SeriesOps.threshold(df, lit(1.1))) ==
      Seq((0.0, Some(0.0)), (1.0, Some(0.0)), (2.0, Some(1.0)), (3.0, Some(1.0))))
  }

  test("is_not_none (timeseries.py:330-354)") {
    val df = seriesD(Seq((0.0, Some(1.0)), (1.0, None), (2.0, Some(0.0))))
    assert(collectTV(SeriesOps.isNotNone(df)) ==
      Seq((0.0, Some(1.0)), (1.0, Some(0.0)), (2.0, Some(1.0))))
  }

  test("scalar multiply via mapValues (test_operations.py:8-41)") {
    val df = seriesD(Seq((0.0, Some(1.0)), (1.0, Some(3.0))))
    assert(collectTV(SeriesOps.mapValues(df, _ * 0.5)) ==
      Seq((0.0, Some(0.5)), (1.0, Some(1.5))))
  }

  test("item_by_index / first / last (test_methods.py:242-252)") {
    val df = seriesD(Seq((0.0, Some(1.0)), (2.0, Some(3.0)), (5.0, Some(10.0))))
    assert(collectTV(SeriesOps.itemByIndex(df, 0)) == Seq((0.0, Some(1.0))))
    assert(collectTV(SeriesOps.itemByIndex(df, 1)) == Seq((2.0, Some(3.0))))
    assert(collectTV(SeriesOps.itemByIndex(df, -1)) == Seq((5.0, Some(10.0))))
    assert(collectTV(SeriesOps.lastItem(df)) == Seq((5.0, Some(10.0))))
  }

  test("sliding intervals n=2 and n=3 (test_iterators iterintervals)") {
    val df = seriesD(Seq((1.0, Some(2.0)), (2.0, Some(3.0)), (6.0, Some(1.0)), (8.0, Some(4.0))))
    val n2 = SeriesOps.slidingIntervals(df, 2)
      .select("t", "ts").collect().map(r => (r.getDouble(1-1+0), r.getSeq[Double](1)))
    assert(n2.map(_._2.toSeq).toSeq.sortBy(_.head) ==
      Seq(Seq(1.0, 2.0), Seq(2.0, 6.0), Seq(6.0, 8.0)))
    val n3 = SeriesOps.slidingIntervals(df, 3).collect()
    assert(n3.length == 2)
  }

  test("distribution_by_hour_of_day matches reference golden") {
    val df = seriesL(Goldens.hourOfDayPoints)
    val segs = SeriesOps.segmentsInRange(
      df, lit(Goldens.hourOfDayStartUs), lit(Goldens.hourOfDayEndUs), lit(null).cast("double"))
    val out = Rollup.distributionByHourOfDay(segs)
      .withColumn("w", col("weight") / sum("weight").over(
        org.apache.spark.sql.expressions.Window.partitionBy("key", "hour")))
      .select("hour", "v", "w").collect()
      .map(r => (r.getInt(0), Option(r.get(1)).map(_.asInstanceOf[Double]), r.getDouble(2)))
      .sortBy(x => (x._1, x._2.getOrElse(-1.0)))
    val exp = Goldens.hourOfDayGolden.sortBy(x => (x._1, x._2.getOrElse(-1.0)))
    assert(out.length == exp.length, s"${out.toSeq}")
    out.zip(exp).foreach { case ((h, v, w), (he, ve, we)) =>
      assert(h == he && v == ve && math.abs(w - we) < 1e-9, s"($h,$v,$w) vs ($he,$ve,$we)")
    }
  }

  test("distribution_by_day_of_week matches reference golden") {
    val df = seriesL(Goldens.hourOfDayPoints)
    val segs = SeriesOps.segmentsInRange(
      df, lit(Goldens.hourOfDayStartUs), lit(Goldens.hourOfDayEndUs), lit(null).cast("double"))
    val out = Rollup.distributionByDayOfWeek(segs)
      .withColumn("w", col("weight") / sum("weight").over(
        org.apache.spark.sql.expressions.Window.partitionBy("key", "weekday")))
      .select("weekday", "v", "w").collect()
      .map(r => (r.getInt(0), Option(r.get(1)).map(_.asInstanceOf[Double]), r.getDouble(2)))
      .sortBy(x => (x._1, x._2.getOrElse(-1.0)))
    val exp = Goldens.dayOfWeekGolden.sortBy(x => (x._1, x._2.getOrElse(-1.0)))
    assert(out.length == exp.length, s"${out.toSeq}")
    out.zip(exp).foreach { case ((h, v, w), (he, ve, we)) =>
      assert(h == he && v == ve && math.abs(w - we) < 1e-9, s"($h,$v,$w) vs ($he,$ve,$we)")
    }
  }

  test("weighted quantile over a distribution DataFrame (UDF path)") {
    val df = seriesD(Goldens.quantileData1.zipWithIndex.map { case (v, i) => (i.toDouble, Some(v)) })
    // build a histogram map: each point held for 1 time unit -> weight 1 each
    val segs = SeriesOps.segmentsInRange(df, lit(0.0), lit(Goldens.quantileData1.size.toDouble),
      lit(null).cast("double"))
    val hist = graft.agg.AggOps.distribution(segs, normalized = false)
      .filter(col("v").isNotNull)
      .groupBy("key")
      .agg(map_from_entries(collect_list(struct(col("v"), col("weight").cast("double")))).as("hist"))
    val qcol = graft.hist.WeightedQuantile
      .quantilesUdf(Goldens.quantileQs, 0.5, Some(1.0))(col("hist"))
    val got = hist.select(qcol.as("qs")).collect().head.getSeq[java.lang.Double](0)
    got.zip(Goldens.quantileGolden1).foreach { case (a, b) =>
      assert(math.abs(a.doubleValue - b) < 1e-12, s"$got vs ${Goldens.quantileGolden1}")
    }
  }
}
