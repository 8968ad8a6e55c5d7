package graft

import graft.stats.{StatsOps, TwoSample}
import org.apache.spark.sql.functions._

/** Hand-checked semantics for the two-sample drift tests (exact KS and
  * Mann–Whitney with midrank ties), the seasonal-strength ANOVA η², and
  * the turning-points randomness test — plus partitioning invariance,
  * which the integer-grid sums must guarantee.
  */
class TwoSampleSpec extends SparkSpec {

  /** Window A = t in 0..n-1, window B = t in 100..100+m-1, split at 50. */
  private def abSeries(a: Seq[Double], b: Seq[Double]) =
    seriesL(a.zipWithIndex.map { case (v, i) => (i.toLong, Some(v)) } ++
      b.zipWithIndex.map { case (v, i) => (100L + i, Some(v)) })

  test("ks: identical windows give D = 0; disjoint supports give D = 1") {
    val same = TwoSample.ks(abSeries(Seq(1, 2, 3), Seq(1, 2, 3)), lit(50L))
      .collect().head
    assert(same.getLong(3) == 0L && same.getDouble(4) == 0.0)
    val disj = TwoSample.ks(abSeries(Seq(1, 2), Seq(5, 6)), lit(50L))
      .collect().head
    assert(disj.getDouble(4) == 1.0, s"disjoint D ${disj.getDouble(4)}")
  }

  test("ks: hand case {1,2,3} vs {2,3,4} gives D = 1/3") {
    val r = TwoSample.ks(abSeries(Seq(1, 2, 3), Seq(2, 3, 4)), lit(50L))
      .collect().head
    assert(r.getLong(1) == 3 && r.getLong(2) == 3)
    assert(r.getLong(3) == 3L, s"d_num ${r.getLong(3)}") // |1*3 - 0*3|
    assert(r.getDouble(4) == 0.333333, s"D ${r.getDouble(4)}")
  }

  test("mwu: separation, reversal, and all-ties hand cases") {
    // all of B above A: U_A = 0, auc = 0
    val lo = TwoSample.mannWhitney(abSeries(Seq(1, 2), Seq(3, 4)), lit(50L))
      .collect().head
    assert(lo.getLong(3) == 0L && lo.getDouble(4) == 0.0)
    // all of A above B: U_A = nA*nB = 4, auc = 1
    val hi = TwoSample.mannWhitney(abSeries(Seq(3, 4), Seq(1, 2)), lit(50L))
      .collect().head
    assert(hi.getLong(3) == 8L && hi.getDouble(4) == 1.0)
    // every value tied: midranks give U_A = nA*nB/2, auc = 0.5
    val tie = TwoSample.mannWhitney(abSeries(Seq(1, 1), Seq(1, 1)), lit(50L))
      .collect().head
    assert(tie.getLong(3) == 4L && tie.getDouble(4) == 0.5)
  }

  test("empty window yields null statistics, not a crash") {
    val r = TwoSample.ks(abSeries(Seq(1, 2), Seq(3, 4)), lit(-1L))
      .collect().head
    assert(r.getLong(1) == 0 && r.isNullAt(4))
    val m = TwoSample.mannWhitney(abSeries(Seq(1, 2), Seq(3, 4)), lit(-1L))
      .collect().head
    assert(m.isNullAt(4))
  }

  test("ks/mwu are invariant under repartitioning (long-exact sums)") {
    val df = abSeries(
      (1 to 200).map(i => (i * 7919 % 100).toDouble),
      (1 to 150).map(i => (i * 104729 % 120).toDouble))
    val oneK = TwoSample.ks(df.coalesce(1), lit(50L)).collect().head
    val manyK = TwoSample.ks(df.repartition(13), lit(50L)).collect().head
    assert(oneK.getLong(3) == manyK.getLong(3) &&
      oneK.getDouble(4) == manyK.getDouble(4))
    val oneM = TwoSample.mannWhitney(df.coalesce(1), lit(50L)).collect().head
    val manyM = TwoSample.mannWhitney(df.repartition(13), lit(50L))
      .collect().head
    assert(oneM.getLong(3) == manyM.getLong(3) &&
      oneM.getDouble(4) == manyM.getDouble(4))
  }

  test("cvm: zero on identical windows; 0.375 on the disjoint hand case") {
    val same = TwoSample.cvm(abSeries(Seq(1, 2, 3), Seq(1, 2, 3)), lit(50L))
      .collect().head
    assert(same.getDouble(3) == 0.0)
    // pooled bins 1,2,5,6; d = 2,4,2,0; S = Σ t·d² = 24; T = 24/(4·16)
    val disj = TwoSample.cvm(abSeries(Seq(1, 2), Seq(5, 6)), lit(50L))
      .collect().head
    assert(disj.getDouble(3) == 0.375, s"T ${disj.getDouble(3)}")
  }

  test("wasserstein1: a pure shift by 2 measures exactly 2.0") {
    val r = TwoSample.wasserstein1(abSeries(Seq(0, 1), Seq(2, 3)), lit(50L))
      .collect().head
    assert(r.getDouble(3) == 2.0, s"W1 ${r.getDouble(3)}")
    val same = TwoSample.wasserstein1(
      abSeries(Seq(1, 2, 3), Seq(1, 2, 3)), lit(50L)).collect().head
    assert(same.getDouble(3) == 0.0)
  }

  test("pettitt: level shift found at the step, earliest-t tie-break") {
    // 1,1,1,5,5,5 at t=0..5: U = -3,-6,-9,-6,-3 -> K=9 after t=2
    val step = seriesL(Seq(1.0, 1.0, 1.0, 5.0, 5.0, 5.0).zipWithIndex
      .map { case (v, i) => (i.toLong, Some(v)) })
    val r = TwoSample.pettitt(step).collect().head
    assert(r.getLong(1) == 6 && r.getLong(2) == 9L && r.getLong(3) == 2L,
      s"k=${r.getLong(2)} cp=${r.getLong(3)}")
    // -6*81/(216+36) = -1.928571...
    assert(r.getDouble(4) == -1.928571, s"pexp ${r.getDouble(4)}")
    // symmetric 1,5,1: both splits score |U| = 1 -> earliest t wins
    val sym = seriesL(Seq(1.0, 5.0, 1.0).zipWithIndex
      .map { case (v, i) => (i.toLong, Some(v)) })
    val s = TwoSample.pettitt(sym).collect().head
    assert(s.getLong(2) == 1L && s.getLong(3) == 0L,
      s"k=${s.getLong(2)} cp=${s.getLong(3)}")
  }

  test("seasonalStrength: bin-determined values give eta2 = 1, " +
    "bin-independent give 0, constant gives null") {
    // t % 2 bins; values fully determined by the bin
    val det = seriesL(Seq(0L -> 1.0, 1L -> 3.0, 2L -> 1.0, 3L -> 3.0)
      .map { case (t, v) => (t, Some(v)) })
    val r1 = StatsOps.seasonalStrength(det, col("t") % 2).collect().head
    assert(r1.getDouble(3) == 1.0, s"eta2 ${r1.getDouble(3)}")
    // same values, arranged so each bin holds {1, 3}: no bin signal
    val indep = seriesL(Seq(0L -> 1.0, 1L -> 1.0, 2L -> 3.0, 3L -> 3.0)
      .map { case (t, v) => (t, Some(v)) })
    val r2 = StatsOps.seasonalStrength(indep, col("t") % 2).collect().head
    assert(r2.getDouble(3) == 0.0, s"eta2 ${r2.getDouble(3)}")
    val const = seriesL((0L to 9L).map(t => (t, Some(5.0))))
    val r3 = StatsOps.seasonalStrength(const, col("t") % 2).collect().head
    assert(r3.isNullAt(3), "zero-variance eta2 should be null")
  }

  test("turningPoints: strict extrema only; null stats below n = 3") {
    // 1,3,2,4,1 -> peaks at 3 and 4, trough at 2
    val zig = seriesL(Seq(1.0, 3.0, 2.0, 4.0, 1.0).zipWithIndex
      .map { case (v, i) => (i.toLong, Some(v)) })
    val r = StatsOps.turningPoints(zig).collect().head
    assert(r.getLong(1) == 5 && r.getLong(2) == 3, s"n_tp ${r.getLong(2)}")
    val e = 2.0 * (5.0 - 2.0) / 3.0
    val z = (3.0 - e) / math.sqrt((16.0 * 5.0 - 29.0) / 90.0)
    assert(math.abs(r.getDouble(4) - z) < 1e-5, s"z ${r.getDouble(4)}")
    // plateau members are not turning points under strict comparisons
    val flat = seriesL(Seq(1.0, 2.0, 2.0, 1.0).zipWithIndex
      .map { case (v, i) => (i.toLong, Some(v)) })
    assert(StatsOps.turningPoints(flat).collect().head.getLong(2) == 0)
    val tiny = seriesL(Seq(1.0, 2.0).zipWithIndex
      .map { case (v, i) => (i.toLong, Some(v)) })
    val rt = StatsOps.turningPoints(tiny).collect().head
    assert(rt.isNullAt(3) && rt.isNullAt(4))
  }
}
