package graft

import graft.ann.VectorDrift
import org.apache.spark.sql.functions._

/** Embedding-space drift + cluster-quality screens: hand-checked
  * centroid geometry and exact-replica brute-force equivalence (the
  * quantization is mirrored, so equality is exact up to the 1e-6 output
  * rounding). */
class VectorDriftSpec extends SparkSpec {

  private def vec(x: Double, dim: Int = 64): Seq[Float] =
    Seq.fill(dim)(x.toFloat)

  test("centroidShift: constant batches give the closed-form step and excursion") {
    val s = spark
    import s.implicits._
    // batch 0: all-0.1 vectors; batch 1: all-0.3 vectors (2 each)
    val df = Seq(
      (0L, vec(0.1)), (1L, vec(0.1)), (100L, vec(0.3)), (101L, vec(0.3)))
      .toDF("vec_id", "embedding")
    val out = VectorDrift.centroidShift(df, batchSize = 100)
      .orderBy("batch").collect()
    assert(out.length == 2)
    assert(out(0).getLong(1) == 2 && out(0).isNullAt(2))
    // centroids 1000 vs 3000 on the grid: step = sqrt(64)*2000/1e4 = 1.6;
    // global centroid 2000: each batch is sqrt(64)*1000/1e4 = 0.8 away
    assert(out(1).getDouble(2) == 1.6)
    assert(out(0).getDouble(3) == 0.8 && out(1).getDouble(3) == 0.8)
  }

  test("labelPurity: tight/singleton clusters, within-zero separation nulls") {
    val s = spark
    import s.implicits._
    // label 0: +-0.0002 around 0 (grid +-2, centroid 0, d2 = 64*4 each);
    // label 1: one vector at 1.0 (within 0 -> separation null)
    val df = Seq(
      (0L, vec(0.0002), 0), (1L, vec(-0.0002), 0), (2L, vec(1.0), 1))
      .toDF("vec_id", "embedding", "label")
    val out = VectorDrift.labelPurity(df).orderBy("label").collect()
    assert(out(0).getLong(1) == 2 && out(1).getLong(1) == 1)
    // 64*4/1e8 = 2.56e-6 rounds half-up to 3e-6 on the 1e-6 output grid
    assert(out(0).getDouble(2) == 3e-6 && out(1).getDouble(2) == 0.0)
    assert(out(0).getLong(3) == 1L && out(1).getLong(3) == 0L)
    // between_sq = 64 * 10000^2 / 1e8 = 64.0 both ways
    assert(out(0).getDouble(4) == 64.0 && out(1).getDouble(4) == 64.0)
    assert(out(0).getDouble(5) == 64.0 / (64 * 4 / 1e8) && out(1).isNullAt(5))
  }

  test("centroidShift and labelPurity equal the quantized brute force") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(99)
    val dim = 8
    val rows = (0L until 60L).map { i =>
      (i, Seq.fill(dim)(rnd.nextFloat() * 2 - 1), (i % 4).toInt)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    def q(x: Float): Long = math.floor(x.toDouble * 10000 + 0.5).toLong
    def cent(vs: Seq[Seq[Long]]): Seq[Long] =
      (0 until dim).map(p => math.floor(
        vs.map(_(p)).sum.toDouble / vs.size + 0.5).toLong)
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

    // centroidShift with batchSize 20 -> 3 batches
    val byBatch = rows.groupBy(_._1 / 20).view
      .mapValues(_.map(_._2.map(q))).toMap
    val cents = byBatch.view.mapValues(cent).toMap
    val g = cent(rows.map(_._2.map(q)))
    val got = VectorDrift.centroidShift(df, 20).collect()
      .map(r => r.getLong(0) -> r).toMap
    for (b <- 0L to 2L) {
      assert(got(b).getLong(1) == 20)
      if (b > 0)
        assert(got(b).getDouble(2) ==
          r6(math.sqrt(d2(cents(b), cents(b - 1)).toDouble) / 10000.0), s"b=$b")
      else assert(got(b).isNullAt(2))
      assert(got(b).getDouble(3) ==
        r6(math.sqrt(d2(cents(b), g).toDouble) / 10000.0), s"b=$b global")
    }

    // labelPurity
    val byLab = rows.groupBy(_._3.toLong).view
      .mapValues(_.map(_._2.map(q))).toMap
    val lc = byLab.view.mapValues(cent).toMap
    val gotP = VectorDrift.labelPurity(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    for (l <- 0L to 3L) {
      val members = byLab(l)
      val w = members.map(v => d2(v, lc(l))).sum
      val (nl, bd) = lc.keys.filter(_ != l)
        .map(o => (o, d2(lc(l), lc(o)))).toSeq
        .sortBy { case (o, d) => (d, o) }.head
      assert(gotP(l).getLong(1) == members.size)
      assert(gotP(l).getDouble(2) == r6(w.toDouble / members.size / 1e8), s"l=$l")
      assert(gotP(l).getLong(3) == nl && gotP(l).getDouble(4) == r6(bd / 1e8))
      assert(gotP(l).getDouble(5) ==
        r6(bd.toDouble / (w.toDouble / members.size)), s"l=$l sep")
    }
  }
}
