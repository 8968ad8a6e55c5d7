package graft

import graft.events.Burst
import org.apache.spark.sql.functions._

/** Kleinberg 2-state burst Viterbi: the distributed tropical scan must
  * equal a sequential in-memory DP of the same integer cost algebra,
  * at every bucket width.
  */
class BurstSpec extends SparkSpec {

  /** Sequential reference: the same forward/backward integer min-plus
    * DP, one loop each way. Returns t1 -> burst. */
  private def seqBursts(ts: Seq[Long], gamma: Double): Map[Long, Long] = {
    val sorted = ts.distinct.sorted
    val m = sorted.size - 1L
    if (m < 1 || sorted.last == sorted.head) return Map.empty
    val span = sorted.last - sorted.head
    val up =
      math.floor(math.log(m.toDouble) * gamma * Burst.SCALE + 0.5).toLong
    val gaps = sorted.sliding(2).map(p => (p(1), p(1) - p(0))).toVector
    val r = gaps.map { case (t1, x) =>
      (t1, (BigInt(Burst.SCALE) * x * m / span).toLong - Burst.LN2S)
    }
    var f0 = 0L; var f1 = Burst.INF
    val fs = r.map { case (_, ri) =>
      val n0 = math.min(f0, f1)
      val n1 = math.min(up + ri + f0, ri + f1)
      f0 = n0; f1 = n1; (n0, n1)
    }
    var h0 = 0L; var h1 = 0L
    val hs = r.reverse.map { case (_, ri) =>
      val res = (h0, h1) // H_i = cost to finish AFTER gap i
      val n0 = math.min(h0, up + ri + h1)
      val n1 = math.min(h0, ri + h1)
      h0 = n0; h1 = n1
      res
    }.reverse
    r.indices.map { i =>
      r(i)._1 -> (if (fs(i)._2 + hs(i)._2 < fs(i)._1 + hs(i)._1) 1L
                  else 0L)
    }.toMap
  }

  private def run(ts: Seq[Long], gamma: Double, bucket: Long) = {
    val s = spark
    import s.implicits._
    val df = ts.map(("s", _)).toDF("key", "t")
    Burst.kleinbergBursts(df, gamma, bucket).collect()
      .map(r => r.getLong(2) -> r.getLong(4)).toMap
  }

  test("kleinbergBursts: uniform gaps never burst") {
    val ts = (0 until 50).map(_ * 100L)
    val got = run(ts, gamma = 1.0, bucket = 1000L)
    assert(got.size == 49 && got.values.forall(_ == 0L))
  }

  test("kleinbergBursts: a dense run bursts, its surroundings do not") {
    // 10 gaps of 1000, 10 gaps of 1, 10 gaps of 1000
    val ts = Seq.iterate(0L, 11)(_ + 1000L) ++
      Seq.iterate(10010L, 10)(_ + 1L) ++
      Seq.iterate(11020L, 10)(_ + 1000L)
    val got = run(ts.distinct, gamma = 1.0, bucket = 2000L)
    val shortGaps = got.filter { case (t1, _) => t1 > 10000L && t1 <= 10020L }
    val longGaps = got -- shortGaps.keys
    assert(shortGaps.nonEmpty && shortGaps.values.forall(_ == 1L),
      s"dense run must burst: $shortGaps")
    assert(longGaps.values.forall(_ == 0L), "sparse stretches must not")
    assert(got == seqBursts(ts, 1.0))
  }

  test("kleinbergBursts: equals the sequential DP at every bucket width") {
    val rnd = new scala.util.Random(47)
    for (trial <- 0 until 4) {
      // bursty generator: mostly wide gaps with occasional dense runs
      val b = Seq.newBuilder[Long]
      var t = 0L
      for (_ <- 0 until 150) {
        t += (if (rnd.nextInt(10) == 0) 1 + rnd.nextInt(3)
              else 50 + rnd.nextInt(200)).toLong
        b += t
      }
      val ts = b.result()
      val expect = seqBursts(ts, gamma = 1.0)
      for (bucket <- Seq(37L, 500L, 1000000L)) {
        val got = run(ts, gamma = 1.0, bucket = bucket)
        assert(got == expect, s"trial $trial bucket $bucket diverged")
      }
    }
  }

  test("kleinbergBursts: single-gap and empty keys drop cleanly") {
    val s = spark
    import s.implicits._
    // one event (no gap), two events (one gap), and a zero-span key
    val df = Seq(("a", 5L), ("b", 0L), ("b", 10L), ("c", 3L), ("c", 3L))
      .toDF("key", "t")
    val out = Burst.kleinbergBursts(df, 1.0, 100L).collect()
    assert(out.map(_.getString(0)).toSet == Set("b"))
    // a lone average-width gap is never a burst
    assert(out.head.getLong(4) == 0L)
  }
}
