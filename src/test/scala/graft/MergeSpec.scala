package graft

import graft.core.SeriesOps
import graft.events.EventOps
import graft.merge.MergeOps
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {

  def sidSeries(points: Seq[(Double, Option[Double])], sid: String, key: String = "g") = {
    val s = spark
    import s.implicits._
    points.map { case (t, v) => (key, sid, t, v.map(Double.box).orNull.asInstanceOf[java.lang.Double]) }
      .toDF("key", "sid", "t", "v")
      .withColumn("v", col("v").cast("double"))
  }

  test("merge ignorant sum of 3 datetime series (test_operations.py:44-84)") {
    val a = Seq((1425168000000000L, 1.0), (1425254400000000L, 0.0), (1425340800000000L, 1.0), (1425427200000000L, 0.0))
    val b = Seq((1425168000000000L, 0.0), (1425211200000000L, 1.0), (1425254400000000L, 0.0), (1425297600000000L, 1.0), (1425340800000000L, 0.0))
    val c = Seq((1425168000000000L, 0.0), (1425232800000000L, 1.0), (1425513600000000L, 0.0))
    def mk(p: Seq[(Long, Double)], sid: String) = sidSeries(p.map { case (t, v) => (t.toDouble, Some(v)) }, sid)
    val df = mk(a, "a").unionByName(mk(b, "b")).unionByName(mk(c, "c"))
    val out = MergeOps.mergeSum(df, strict = false)
    val got = collectTV(out).map { case (t, v) => (t.toLong, v) }
    assert(got == Goldens.mergeSumDt)
  }

  test("radd: sum of two default-0 series (test_methods.py radd golden)") {
    val s = spark
    import s.implicits._
    val df = sidSeries(Seq((0.0, Some(1.0)), (2.0, Some(0.0)), (3.0, Some(1.0)), (4.0, Some(0.0))), "a")
      .unionByName(sidSeries(Seq((-1.0, Some(1.0)), (2.0, Some(0.0)), (3.0, Some(1.0)), (4.0, Some(0.0))), "b"))
    val defaults = Seq(("a", 0.0), ("b", 0.0)).toDF("sid", "default")
    val out = MergeOps.mergeSum(df, strict = false, Some(defaults))
    approxEq(collectTV(out), Goldens.raddGolden)
  }

  test("strict vs ignorant sum with None values (tests/test_missing.py)") {
    val s = spark
    import s.implicits._
    val ra = sidSeries(Seq((-10.0, Some(0.0)), (-7.0, Some(1.0)), (-5.0, None), (0.0, Some(3.0)), (1.0, Some(3.0)), (5.0, None)), "a")
    val rb = sidSeries(Seq((-8.0, Some(0.0)), (-5.0, Some(0.0)), (-2.0, Some(1.0)), (5.0, Some(3.0))), "b")
    val df = ra.unionByName(rb)
    val defaults = Seq(("a", null.asInstanceOf[java.lang.Double]), ("b", java.lang.Double.valueOf(0.0)))
      .toDF("sid", "default").withColumn("default", col("default").cast("double"))
    approxEq(collectTV(MergeOps.mergeSum(df, strict = true, Some(defaults))), Goldens.strictSumGolden)
    approxEq(collectTV(MergeOps.mergeSum(df, strict = false, Some(defaults))), Goldens.ignorantSumGolden)
  }

  test("difference with default 0 (test_operations.py:114-119)") {
    val a = seriesD(Seq((0.0, Some(0.0)), (2.0, Some(2.0))))
    val b = seriesD(Seq((1.0, Some(1.0)), (3.0, Some(2.0))))
    val out = MergeOps.difference(a, b, lit(0.0), lit(0.0))
    approxEq(collectTV(out), Goldens.differenceGolden)
  }

  test("Python-truthiness logical or/and/xor (test_operations.py:179-207)") {
    val t1 = seriesD(Seq((0.0, Some(0.0)), (2.0, Some(5.0)), (3.0, Some(0.0)), (4.0, Some(7.0)), (10.0, Some(3.0))))
    val t2 = seriesD(Seq((0.0, Some(0.0)), (1.0, Some(1.0)), (2.0, Some(3.0)), (4.0, Some(0.0)), (5.0, Some(5.0)), (10.0, Some(1.0)), (11.0, Some(0.0))))
    approxEq(collectTV(MergeOps.logicalOr(t1, t2)), Goldens.orGolden)
    approxEq(collectTV(MergeOps.logicalAnd(t1, t2)), Goldens.andGolden)
    approxEq(collectTV(MergeOps.logicalXor(t1, t2)), Goldens.xorGolden)
  }

  test("count_by_value tracks per-value series counts") {
    val s = spark
    import s.implicits._
    // two boolean series: a: 0@0, 1@2; b: 1@0, 0@3
    val df = Seq(
      ("a", 0.0, 0.0), ("a", 2.0, 1.0), ("b", 0.0, 1.0), ("b", 3.0, 0.0))
      .toDF("sid", "t", "v")
    val out = MergeOps.countByValue(df).filter(col("key").isNotNull)
    val got = out.collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2))).toSet
    // value 1.0: count 1 at t=0 (b), 2 at t=2 (a joins), 1 at t=3 (b leaves)
    assert(got.contains((1.0, 0.0, 1.0)))
    assert(got.contains((1.0, 2.0, 2.0)))
    assert(got.contains((1.0, 3.0, 1.0)))
    // value 0.0: 1 at t=0, 0 at t=2, 1 at t=3
    assert(got.contains((0.0, 2.0, 0.0)))
    assert(got.contains((0.0, 3.0, 1.0)))
  }

  test("event series: count_active and cumulative_sum goldens") {
    val s = spark
    import s.implicits._
    val open = Seq(8.0, 9.0, 13.0, 7.0, 6.5, 13.0).map(("s", _)).toDF("key", "t")
    val closed = Seq(8.0, 8.5, 12.0, 12.0, 12.0).map(("s", _)).toDF("key", "t")
    approxEq(collectTV(EventOps.countActive(open, closed)), Goldens.countActiveGolden)

    val es = Seq(1.0, 1.0, 4.0, 5.0, 9.0, 6.0, 3.0, 9.0, 15.0).map(("s", _)).toDF("key", "t")
    approxEq(collectTV(EventOps.cumulativeSum(es)), Goldens.cumsumGolden)
    val n = EventOps.eventsBetween(es, lit(1.0), lit(3.0)).collect().head.getLong(1)
    assert(n == 3)
  }
}
