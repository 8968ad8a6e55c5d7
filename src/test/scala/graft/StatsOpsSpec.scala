package graft

import graft.events.EventOps
import graft.stats.StatsOps
import org.apache.spark.sql.functions._

/** Hand-checked semantics for the concentration / plausibility wave:
  * maximum drawdown, Gini concentration, Benford leading-digit screen.
  */
class StatsOpsSpec extends SparkSpec {

  test("maxDrawdown: deepest drop with peak/trough times") {
    // 10,12,8,11,5,9 -> running max 10,12,12,12,12,12; dd 0,0,4,1,7,3
    val pts = seriesL(Seq(0L -> Some(10.0), 1L -> Some(12.0),
      2L -> Some(8.0), 3L -> Some(11.0), 4L -> Some(5.0),
      5L -> Some(9.0)))
    val r = EventOps.maxDrawdown(pts).collect().head
    assert(r.getLong(1) == 6)
    assert(r.getDouble(2) == 7.0)
    assert(r.getLong(3) == 1L) // peak at the 12
    assert(r.getLong(4) == 4L) // trough at the 5
  }

  test("maxDrawdown: repeated peak value resolves to its EARLIEST time") {
    // 12,5,12,3: max dd = 9 at t=3; x=12 first attained at t=0
    val pts = seriesL(Seq(0L -> Some(12.0), 1L -> Some(5.0),
      2L -> Some(12.0), 3L -> Some(3.0)))
    val r = EventOps.maxDrawdown(pts).collect().head
    assert(r.getDouble(2) == 9.0 && r.getLong(3) == 0L && r.getLong(4) == 3L)
  }

  test("maxDrawdown: a monotone series reports zero at its first point") {
    val pts = seriesL(Seq(0L -> Some(1.0), 1L -> Some(2.0), 2L -> Some(3.0)))
    val r = EventOps.maxDrawdown(pts).collect().head
    assert(r.getDouble(2) == 0.0 && r.getLong(3) == 0L && r.getLong(4) == 0L)
  }

  test("gini: even split is 0, single holder is (n-1)/n, zero total null") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("even", "u1", 5L), ("even", "u2", 5L), ("even", "u3", 5L),
      ("even", "u4", 5L),
      ("one", "u1", 0L), ("one", "u2", 0L), ("one", "u3", 0L),
      ("one", "u4", 12L),
      ("zero", "u1", 0L), ("zero", "u2", 0L))
      .toDF("key", "unit", "x")
    val out = StatsOps.gini(df, col("x")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("even").getDouble(3) == 0.0)
    assert(out("one").getDouble(3) == 0.75) // (n-1)/n with n=4
    assert(out("zero").isNullAt(3))
    assert(out("even").getLong(1) == 4 && out("even").getLong(2) == 20L)
  }

  test("gini: tie order among equal weights cannot move the result") {
    val s = spark
    import s.implicits._
    // 1,1,4: G = (2*(1*1+2*1+3*4) - 4*6) / (3*6) = (30-24)/18 = 1/3
    val df = Seq(("k", "a", 1L), ("k", "b", 1L), ("k", "c", 4L))
      .toDF("key", "unit", "x")
    val g = StatsOps.gini(df, col("x")).collect().head.getDouble(3)
    assert(math.abs(g - 0.333333) < 1e-9)
  }

  test("benford: digit counts, zero-fill, positives only, chi2 from grid") {
    val s = spark
    import s.implicits._
    val df = Seq(("k", 1L), ("k", 13L), ("k", 2L), ("k", 190L),
      ("k", 0L), ("k", -5L)).toDF("key", "x")
    val out = StatsOps.benford(df, col("x"))
      .orderBy("digit").collect()
    assert(out.length == 9)
    val byDigit = out.map(r => r.getInt(1) -> r).toMap
    assert(byDigit(1).getLong(2) == 3) // 1, 13, 190
    assert(byDigit(2).getLong(2) == 1)
    assert((3 to 9).forall(d => byDigit(d).getLong(2) == 0))
    assert(byDigit(1).getDouble(3) == 0.75)
    assert(byDigit(1).getDouble(4) == 0.301029995663981)
    // every row carries the same key-level chi2, strictly positive here
    val chis = out.map(_.getDouble(5)).distinct
    assert(chis.length == 1 && chis.head > 0)
  }
}
