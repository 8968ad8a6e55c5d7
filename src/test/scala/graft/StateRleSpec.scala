package graft

import graft.chunk.{Gorilla, StateRle}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

class StateRleSpec extends AnyFunSuite {

  def roundTrip(ts: Array[Long], vs: Array[java.lang.Double]): Boolean = {
    val (t2, v2) = StateRle.decode(StateRle.encode(ts, vs))
    def bits(x: Array[java.lang.Double]) =
      x.toSeq.map(Option(_).map(d => java.lang.Double.doubleToRawLongBits(d.doubleValue)))
    t2.toSeq == ts.toSeq && bits(v2) == bits(vs)
  }

  test("round-trips hand-picked edge cases") {
    assert(roundTrip(Array.empty, Array.empty))
    assert(roundTrip(Array(0L), Array(java.lang.Double.valueOf(0.0))))
    assert(roundTrip(Array(-5L, 0L, 3L), Array(null, null, null)))
    assert(roundTrip(Array(1700000000000000L, 1700000000000001L),
      Array(null, java.lang.Double.valueOf(-1.5))))
    // -0.0 vs 0.0 and NaN are bit-distinct dictionary entries
    assert(roundTrip(
      Array(0L, 1000000L, 2000000L, 3000001L, 2999999999L),
      Array(0.0, -0.0, Double.NaN, Double.NegativeInfinity, 0.0).map(java.lang.Double.valueOf)))
  }

  test("round-trips arbitrary sorted state series (scalacheck property)") {
    val pointGen: Gen[(Array[Long], Array[java.lang.Double])] = for {
      deltas <- Gen.listOf(Gen.chooseNum(0L, 1L << 40))
      vs <- Gen.listOfN(deltas.size + 1,
        Gen.oneOf(
          Gen.const(null.asInstanceOf[java.lang.Double]),
          // few distinct states + occasional arbitrary double
          Gen.oneOf(Seq(0.0, -0.0, 1.0, 2.0, 45.0, Double.NaN).map(java.lang.Double.valueOf)),
          Gen.chooseNum(-1e12, 1e12).map(java.lang.Double.valueOf)))
      t0 <- Gen.chooseNum(-1000000L, 1900000000000000L)
    } yield {
      val ts = new Array[Long](vs.size)
      var acc = t0
      vs.indices.foreach { j =>
        ts(j) = acc
        if (j < deltas.size) acc += deltas(j)
      }
      (ts, vs.toArray)
    }
    val prop = Prop.forAll(pointGen) { case (ts, vs) => roundTrip(ts, vs) }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.toString)
  }

  test("encodedLen and runStats match the emitted blob (scalacheck property)") {
    val gen: Gen[(Array[Long], Array[java.lang.Double])] = for {
      n <- Gen.chooseNum(0, 400)
      vs <- Gen.listOfN(n,
        Gen.oneOf(
          Gen.const(null.asInstanceOf[java.lang.Double]),
          Gen.chooseNum(0, 5).map(i => java.lang.Double.valueOf(i.toDouble))))
    } yield (Array.tabulate(n)(i => 1700000000000000L + i * 977000L), vs.toArray)
    val prop = Prop.forAll(gen) { case (ts, vs) =>
      val blob = StateRle.encode(ts, vs)
      val (nRuns, dictSize) = StateRle.runStats(blob)
      // independent run/dict recount off the raw arrays
      def code(i: Int): Long =
        if (vs(i) == null) Long.MinValue
        else java.lang.Double.doubleToRawLongBits(vs(i))
      val expRuns =
        if (vs.isEmpty) 0L
        else 1L + vs.indices.tail.count(i => code(i) != code(i - 1))
      val expDict = vs.filter(_ != null)
        .map(d => java.lang.Double.doubleToRawLongBits(d.doubleValue)).distinct.length.toLong
      blob.length == StateRle.encodedLen(ts, vs) &&
      nRuns == expRuns && dictSize == expDict
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.toString)
  }

  test("varintLen matches LEB128 widths at the boundaries") {
    val bounds = Seq(0L -> 1, 127L -> 1, 128L -> 2, 16383L -> 2, 16384L -> 3,
      ((1L << 28) - 1) -> 4, (1L << 28) -> 5, ((1L << 56) - 1) -> 8,
      (1L << 56) -> 9, Long.MaxValue -> 9)
    bounds.foreach { case (v, w) => assert(StateRle.varintLen(v) == w, s"varintLen($v)") }
  }

  test("beats Gorilla and raw on a low-cardinality state series") {
    // the canonical state-series shape: 60s cadence with an outage gap
    // every ~500 points, 5 distinct states changing every ~200 points.
    // dod-RLE collapses each regular stretch to one pair; Gorilla pays
    // at least the 1-bit dod==0 marker per point.
    val n = 10000
    val ts = new Array[Long](n)
    var t = 1700000000000000L
    var i = 0
    while (i < n) {
      ts(i) = t
      t += (if (i % 500 == 499) 7200000000L else 60000000L)
      i += 1
    }
    val vs = Array.tabulate(n)(i => java.lang.Double.valueOf(((i / 200) % 5).toDouble))
    val rle = StateRle.encode(ts, vs)
    val gor = Gorilla.encode(ts, vs)
    assert(rle.length < gor.length, s"rle ${rle.length} !< gorilla ${gor.length}")
    assert(rle.length < n * 16 / 40, s"rle ${rle.length} bytes for $n points")
  }
}
