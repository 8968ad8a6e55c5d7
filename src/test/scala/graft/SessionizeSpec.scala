package graft

import graft.events.EventOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gap-based sessionization: hand-checked semantics, plain == bucketed
  * equivalence, and bucketing-invariance (any bucket width gives the
  * same sessions — the width is purely a performance knob).
  */
class SessionizeSpec extends SparkSpec {

  private def collectSessions(df: DataFrame): Seq[(String, Long, Long, Long, Long, Double)] =
    df.select(col("key"), col("session_idx"), col("t_start"), col("t_end"),
        col("n_events"), col("v_sum"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
      .toSeq
      .sortBy(x => (x._1, x._2))

  test("hand case: gaps over the threshold split sessions") {
    val df = seriesL(Seq(
      (0L, Some(1.0)), (10L, Some(2.0)), (15L, Some(3.0)),
      (100L, Some(4.0)), (110L, Some(5.0)),
      (300L, Some(6.0))))
    val out = collectSessions(EventOps.sessionize(df, gap = 20L))
    assert(out == Seq(
      ("s", 1L, 0L, 15L, 3L, 6.0),
      ("s", 2L, 100L, 110L, 2L, 9.0),
      ("s", 3L, 300L, 300L, 1L, 6.0)))
  }

  test("gap exactly equal to the threshold does NOT split") {
    val df = seriesL(Seq((0L, Some(1.0)), (20L, Some(1.0)), (41L, Some(1.0))))
    val out = collectSessions(EventOps.sessionize(df, gap = 20L))
    assert(out.map(x => (x._2, x._5)) == Seq((1L, 2L), (2L, 1L)))
  }

  test("equal-timestamp events share a session") {
    val df = seriesL(Seq((5L, Some(1.0)), (5L, Some(2.0)), (50L, Some(3.0))))
    val out = collectSessions(EventOps.sessionize(df, gap = 10L))
    assert(out == Seq(("s", 1L, 5L, 5L, 2L, 3.0), ("s", 2L, 50L, 50L, 1L, 3.0)))
  }

  test("bucketed path == plain path on random data, any bucket width") {
    val rnd = new scala.util.Random(20260818)
    val pts = (1 to 4).flatMap { k =>
      var t = 0L
      (1 to 200).flatMap { _ =>
        t += rnd.nextInt(120) + 1
        // ~10% duplicate-timestamp pairs: the two window passes must
        // agree on which equal-t row carries a boundary flag
        val base = Seq((s"u$k", t, rnd.nextDouble()))
        if (rnd.nextInt(10) == 0) base :+ ((s"u$k", t, rnd.nextDouble()))
        else base
      }
    }
    val s = spark
    import s.implicits._
    val df = pts.toDF("key", "t", "v")
    val plain = collectSessions(EventOps.sessionize(df, gap = 40L))
    assert(plain.exists(_._2 > 1L), "fixture should produce plural sessions")
    for (width <- Seq(7L, 64L, 1000L, 1000000L)) {
      val bucketed = collectSessions(EventOps.sessionize(df, gap = 40L,
        bucketBy = Some(floor(col("t") / width))))
      assert(bucketed == plain, s"width $width diverged")
    }
  }

  test("equal-t rows AT a session boundary stay together on every path") {
    // two rows share t=100, which opens a new session (gap 40 < 100);
    // whichever row a pass orders first, both must land in session 2
    val df = seriesL(Seq((0L, Some(1.0)), (100L, Some(3.0)), (100L, Some(2.0))))
    val exp = Seq(("s", 1L, 0L, 0L, 1L, 1.0), ("s", 2L, 100L, 100L, 2L, 5.0))
    assert(collectSessions(EventOps.sessionize(df, gap = 40L)) == exp)
    for (width <- Seq(7L, 64L, 128L))
      assert(collectSessions(EventOps.sessionize(df, gap = 40L,
        bucketBy = Some(floor(col("t") / width)))) == exp, s"width $width")
  }

  test("bucket boundaries straddling a session do not split it") {
    // bucket width 10 cuts [8..12] across buckets; gap 5 keeps it whole
    val df = seriesL(Seq((8L, Some(1.0)), (12L, Some(1.0)), (30L, Some(1.0))))
    val out = collectSessions(EventOps.sessionize(df, gap = 5L,
      bucketBy = Some(floor(col("t") / 10L))))
    assert(out.map(x => (x._2, x._3, x._4, x._5)) ==
      Seq((1L, 8L, 12L, 2L), (2L, 30L, 30L, 1L)))
  }
}
