package graft

import graft.stats.Spectral
import org.apache.spark.sql.functions._

/** Hand-checked semantics for the Lomb–Scargle periodogram and the
  * single-period harmonic fit: a pure sinusoid at irregular times is
  * fully explained at its own period and not at unrelated ones, the
  * fitted coefficients recover the generating amplitude, power is a
  * bounded R², and the integer-grid sums make the result invariant
  * under repartitioning (partial-aggregation order).
  */
class SpectralSpec extends SparkSpec {

  private val DAY = 86400000000L
  private val HOUR = 3600000000L

  /** Irregular sample times over ~10 days: a deterministic low-
    * discrepancy walk (no Random — seeds live in the data, not the
    * clock). */
  private def times(n: Int): Seq[Long] =
    (0 until n).map(i => (i * 10L * DAY / n) + (i * 7919L % 3600) * 1000000L)

  private def sinSeries(periodUs: Long, amp: Double, mean: Double, n: Int = 400) =
    seriesL(times(n).map { t =>
      val ang = 2 * math.Pi * (t % periodUs).toDouble / periodUs
      (t, Some(mean + amp * math.cos(ang)))
    })

  test("periodogram: pure daily cosine scores ~1 at 24h, low at 7d") {
    val df = sinSeries(DAY, amp = 10.0, mean = 100.0)
    val out = Spectral.periodogram(df, Seq(DAY, 7 * DAY))
      .collect().map(r => (r.getLong(1), r.getDouble(3))).toMap
    assert(out(DAY) > 0.999, s"daily power ${out(DAY)}")
    assert(out(7 * DAY) < 0.2, s"weekly power ${out(7 * DAY)}")
  }

  test("harmonicFit recovers amplitude and cosine coefficient") {
    val df = sinSeries(DAY, amp = 10.0, mean = 100.0)
    val r = Spectral.harmonicFit(df, DAY).collect().head
    val (a, b, amp, r2) =
      (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(math.abs(a - 10.0) < 0.01, s"a=$a")
    assert(math.abs(b) < 0.01, s"b=$b")
    assert(math.abs(amp - 10.0) < 0.01, s"amp=$amp")
    assert(r2 > 0.999, s"r2=$r2")
  }

  test("power is a bounded R^2 on noisy-ish data; constant series is null") {
    // deterministic hash 'noise' on top of a weak harmonic
    val df = seriesL(times(300).map { t =>
      val ang = 2 * math.Pi * (t % DAY).toDouble / DAY
      (t, Some(50.0 + 2 * math.sin(ang) + (t % 97).toDouble / 10))
    })
    val p = Spectral.periodogram(df, Seq(DAY, 6 * HOUR)).collect()
    p.foreach { r =>
      val v = r.getDouble(3)
      assert(v >= 0.0 && v <= 1.0, s"power $v out of [0,1]")
    }
    val const = seriesL(times(100).map(t => (t, Some(7.0))))
    val pc = Spectral.periodogram(const, Seq(DAY)).collect().head
    assert(pc.isNullAt(3), "zero-variance series must yield null power")
  }

  test("below minPoints yields null; nulls and negative t are dropped") {
    val small = seriesL(times(10).map(t => (t, Some(1.0 + t % 13))))
    val p = Spectral.periodogram(small, Seq(DAY), minPoints = 16)
      .collect().head
    assert(p.getLong(2) == 10 && p.isNullAt(3))
    val withJunk = sinSeries(DAY, 10.0, 100.0)
      .unionByName(seriesL(Seq((-5L, Some(1.0)), (500L, None))))
    val n = Spectral.periodogram(withJunk, Seq(DAY)).collect().head.getLong(2)
    assert(n == 400, s"junk rows must not count: n=$n")
  }

  test("repartitioning cannot move a bit (long-exact sums)") {
    val df = sinSeries(DAY, 3.7, 42.0, n = 257)
    val a = Spectral.periodogram(df.repartition(1), Seq(DAY, 7 * DAY))
      .collect().map(r => (r.getLong(1), r.getDouble(3))).toMap
    val b = Spectral.periodogram(df.repartition(7), Seq(DAY, 7 * DAY))
      .collect().map(r => (r.getLong(1), r.getDouble(3))).toMap
    assert(a == b, s"$a vs $b")
  }

  test("spectralEntropy: one dominant cycle is near 0, flat ladder near 1") {
    val ladder = Seq(6 * 3600000000L, 12 * 3600000000L, DAY, 3 * DAY, 7 * DAY)
    val peaked = Spectral.spectralEntropy(
      sinSeries(DAY, amp = 10.0, mean = 100.0), ladder).head()
    assert(peaked.getDouble(3) < 0.45, s"peaked flatness ${peaked.getDouble(3)}")
    // equal-amplitude sinusoid at EVERY ladder period: power spreads
    // roughly evenly, so the normalized entropy approaches 1
    val multi = seriesL(times(400).map { t =>
      val v = ladder.map(p =>
        5 * math.sin(2 * math.Pi * (t % p).toDouble / p)).sum
      (t, Some(100.0 + v))
    })
    val flatR = Spectral.spectralEntropy(multi, ladder).head()
    assert(flatR.getDouble(3) > 0.8, s"flat flatness ${flatR.getDouble(3)}")
  }

  test("spectralEntropy equals the sequential quantized computation") {
    val ladder = Seq(6 * 3600000000L, 12 * 3600000000L, DAY, 3 * DAY, 7 * DAY)
    val df = seriesL(times(350).map { t =>
      val ang = 2 * math.Pi * (t % DAY).toDouble / DAY
      (t, Some(50.0 + 4 * math.sin(ang) + (t % 131).toDouble / 9))
    })
    val got = Spectral.spectralEntropy(df, ladder).head()
    val powers = Spectral.periodogram(df, ladder).collect()
      .filter(!_.isNullAt(3)).map(_.getDouble(3))
    val pq = powers.map(p => math.floor(p * 1000000 + 0.5).toLong).filter(_ > 0)
    def qln(v: Long) = math.floor(math.log(v.toDouble) * 1048576 + 0.5).toLong
    val s = pq.sum
    val hnum = (s * qln(s) - pq.map(p => p * qln(p)).sum).toDouble
    val bits = hnum / 1048576.0 / s / 0.6931471805599453
    val flat = hnum / s / qln(pq.length).toDouble
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getLong(1) == pq.length.toLong)
    assert(got.getDouble(2) == r6(bits))
    assert(got.getDouble(3) == r6(flat))
  }
}
