package graft

import graft.hist.WeightedQuantile
import org.scalatest.funsuite.AnyFunSuite

class QuantileSpec extends AnyFunSuite {
  def hist(data: Seq[Double]): Map[Double, Double] =
    data.groupBy(identity).map { case (v, g) => v -> g.size.toDouble }

  test("mquantiles(alphap=0.5) golden (test_histogram_external.py:8-21)") {
    val got = WeightedQuantile
      .quantiles(hist(Goldens.quantileData1), Goldens.quantileQs, alpha = 0.5, smallestCount = Some(1.0))
      .map(_.get)
    got.zip(Goldens.quantileGolden1).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12, s"$got") }
  }

  test("alpha=0 empirical inverse-CDF golden (test_histogram_external.py:73-111)") {
    val got = WeightedQuantile
      .quantiles(hist(Goldens.quantileData2), Goldens.quantileQs2, alpha = 0.0, smallestCount = Some(1.0))
      .map(_.get)
    got.zip(Goldens.quantileGolden2a).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12, s"$got") }
  }

  test("default alpha=0.5 golden") {
    val got = WeightedQuantile
      .quantiles(hist(Goldens.quantileData2), Goldens.quantileQs2)
      .map(_.get)
    got.zip(Goldens.quantileGolden2b).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12, s"$got") }
  }

  test("normalized histogram gives the same quantiles (scale invariance)") {
    val h = hist(Goldens.quantileData2)
    val total = h.values.sum
    val norm = h.map { case (k, v) => k -> v / total }
    val a = WeightedQuantile.quantiles(h, Goldens.quantileQs2, 0.5, Some(1.0)).map(_.get)
    val b = WeightedQuantile.quantiles(norm, Goldens.quantileQs2, 0.5, Some(1.0 / total)).map(_.get)
    a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
  }

  test("empty histogram -> None; out-of-range q -> error") {
    assert(WeightedQuantile.quantiles(Map.empty, Seq(0.5)) == Seq(None))
    intercept[IllegalArgumentException] {
      WeightedQuantile.quantiles(hist(Seq(1.0, 2.0)), Seq(-0.1))
    }
  }
}
