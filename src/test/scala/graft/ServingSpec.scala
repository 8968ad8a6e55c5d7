package graft

import graft.rollup.Rollup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The real-time continuous-aggregate stitch identity behind q191:
  * histTier(a, m) ∪ histTier(m, b) must equal histTier(a, b) for any
  * cell-aligned watermark m — segmentsInRange carries each key's as-of
  * value across m, so the materialized-tier + raw-tail union is
  * seamless. Randomized trials sweep watermark positions the fixture
  * data cannot: keys entirely before/after m, m landing exactly on a
  * point, null-valued pre-first stretches.
  */
class ServingSpec extends SparkSpec {

  private val STEP = 3600000000L // 1h cells

  private def histRows(df: DataFrame, a: Long, b: Long): Seq[(String, Long, Option[Double], Long)] =
    Rollup.histTier(df, a, b, STEP)
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getLong(3)))
      .toSeq
      .sortBy(x => (x._1, x._2, x._3.getOrElse(Double.NegativeInfinity)))

  private def stitched(df: DataFrame, a: Long, m: Long, b: Long) = {
    val rows = (histRows(df, a, m) ++ histRows(df, m, b))
    rows.sortBy(x => (x._1, x._2, x._3.getOrElse(Double.NegativeInfinity)))
  }

  test("stitch at a mid-range hour boundary equals the direct tier (hand case)") {
    val df = seriesL(Seq(
      (1000000L, Some(1.0)),            // opens before the watermark
      (2 * STEP + 500L, Some(2.0)),     // first point after it
      (5 * STEP + 1L, None)))           // null segment across cells
    val a = 0L
    val b = 8 * STEP
    val m = 2 * STEP
    assert(stitched(df, a, m, b) == histRows(df, a, b))
  }

  test("stitch ≡ direct tier on random multi-key series at random watermarks") {
    val rnd = new scala.util.Random(4242)
    val s = spark
    import s.implicits._
    (1 to 10).foreach { trial =>
      val nKeys = 1 + rnd.nextInt(3)
      val span = 48L // hours
      val raw = (0 until nKeys).flatMap { k =>
        val n = 1 + rnd.nextInt(50)
        Seq.fill(n)((
          s"k$k",
          rnd.between(0L, span * 6) * (STEP / 6) + rnd.nextInt(3), // ~10-min grid + jitter
          if (rnd.nextInt(5) == 0) null.asInstanceOf[java.lang.Double]
          else java.lang.Double.valueOf(rnd.nextInt(4).toDouble)))
      }
      val df = raw.toDF("key", "t", "v")
        .groupBy("key", "t").agg(max("v").as("v")) // unique (key, t)
      val a = 0L
      val b = span * STEP
      val m = (1 + rnd.nextInt((span - 1).toInt)) * STEP
      assert(stitched(df, a, m, b) == histRows(df, a, b),
        s"trial $trial watermark $m")
    }
  }

  test("stitch when every point is on one side of the watermark") {
    val df = seriesL(Seq((1000L, Some(1.0)), (2000L, Some(2.0))))
    val a = 0L
    val b = 4 * STEP
    // all points before m: the tail is pure carried value
    assert(stitched(df, a, 2 * STEP, b) == histRows(df, a, b))
    // all points after m: the head is one null-valued stretch
    val late = seriesL(Seq((3 * STEP + 5L, Some(1.0))))
    assert(stitched(late, a, STEP, b) == histRows(late, a, b))
  }
}
