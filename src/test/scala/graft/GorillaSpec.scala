package graft

import graft.chunk.Gorilla
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

class GorillaSpec extends AnyFunSuite {

  def roundTrip(ts: Array[Long], vs: Array[java.lang.Double]): Boolean = {
    val (t2, v2) = Gorilla.decode(Gorilla.encode(ts, vs))
    // bit-level value comparison (NaN-safe)
    def bits(x: Array[java.lang.Double]) =
      x.toSeq.map(Option(_).map(d => java.lang.Double.doubleToRawLongBits(d.doubleValue)))
    t2.toSeq == ts.toSeq && bits(v2) == bits(vs)
  }

  test("round-trips hand-picked edge cases") {
    assert(roundTrip(Array.empty, Array.empty))
    assert(roundTrip(Array(0L), Array(java.lang.Double.valueOf(0.0))))
    assert(roundTrip(Array(1700000000000000L, 1700000000000001L),
      Array(null, java.lang.Double.valueOf(-1.5))))
    assert(roundTrip(
      Array(0L, 1000000L, 2000000L, 3000001L, 2999999999L),
      Array(1.0, 1.0, Double.NaN, Double.NegativeInfinity, 1e-300).map(java.lang.Double.valueOf)))
  }

  test("round-trips arbitrary sorted series (scalacheck property)") {
    val pointGen: Gen[(Array[Long], Array[java.lang.Double])] = for {
      deltas <- Gen.listOf(Gen.chooseNum(0L, 1L << 40))
      vs <- Gen.listOfN(deltas.size + 1,
        Gen.oneOf(
          Gen.const(null.asInstanceOf[java.lang.Double]),
          Gen.chooseNum(-1e12, 1e12).map(java.lang.Double.valueOf),
          Gen.oneOf(Seq(0.0, -0.0, 1.0, 45.0, Double.NaN).map(java.lang.Double.valueOf))))
      t0 <- Gen.chooseNum(-1000000L, 1900000000000000L)
    } yield {
      val ts = new Array[Long](vs.size)
      var acc = t0
      var i = 0
      vs.indices.foreach { j =>
        ts(j) = acc
        if (j < deltas.size) acc += deltas(j)
        i += 1
      }
      (ts, vs.toArray)
    }
    val prop = Prop.forAll(pointGen) { case (ts, vs) => roundTrip(ts, vs) }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.toString)
  }

  test("compresses a regular series well") {
    val n = 10000
    val ts = Array.tabulate(n)(i => 1700000000000000L + i * 60000000L)
    val vs = Array.tabulate(n)(i => java.lang.Double.valueOf(if (i % 10 == 0) 45.0 else 0.0))
    val blob = Gorilla.encode(ts, vs)
    // raw = 16 bytes/point; require at least 6x compression on this shape
    assert(blob.length < n * 16 / 6, s"blob ${blob.length} bytes for $n points")
  }
}
