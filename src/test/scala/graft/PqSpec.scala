package graft

import graft.ann.{Ann, Pq}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hand-checked product-quantization semantics: grid quantization and
  * subspace slicing, exact integer distances, Lloyd convergence on
  * separable clusters, ADC agreement with brute force when the codebook
  * separates the data, and repartition invariance (everything is
  * integer-exact, so partial-aggregation order must not matter).
  */
class PqSpec extends SparkSpec {

  private def emb(rows: Seq[(Long, Seq[Double])]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  /** Two tight clusters in 4-dim space (m=2 subspaces of 2 dims):
    * cluster 0 near (1,1,0,0), cluster 1 near (0,0,1,1); the
    * per-vector jitter is deterministic and far below the separation. */
  private def twoClusters(nPer: Int): DataFrame =
    emb((0 until 2 * nPer).map { i =>
      val c = i % 2
      val j = (i * 13 % 7) / 1000.0
      val v =
        if (c == 0) Seq(1.0 + j, 1.0 - j, j, -j)
        else Seq(j, -j, 1.0 + j, 1.0 - j)
      (i.toLong, v)
    })

  test("subVectors quantizes to the 1e-4 grid and slices subspaces") {
    val df = emb(Seq((7L, Seq(0.12345, -0.5, 1.0, 0.00004))))
    val rows = Pq.subVectors(df, m = 2, subDim = 2)
      .orderBy("sub").collect()
    assert(rows.length == 2)
    assert(rows(0).getSeq[Long](2) == Seq(1235L, -5000L)) // round half up
    assert(rows(1).getSeq[Long](2) == Seq(10000L, 0L))
  }

  test("l2sqI is the exact integer squared distance") {
    val df = emb(Seq((0L, Seq(0.0003, 0.0))))
      .select(Pq.l2sqI(
        array(lit(3L), lit(0L)), array(lit(0L), lit(4L))).as("d"))
    assert(df.collect().head.getLong(0) == 25L)
  }

  test("train + encode separates two jittered clusters") {
    val corpus = twoClusters(20)
    val books = Pq.train(corpus, m = 2, subDim = 2, k = 2, iters = 2)
    assert(books.count() == 4) // 2 subspaces x 2 codes
    val codes = Pq.encode(corpus, books, m = 2, subDim = 2)
    // within a cluster every vector gets the same (sub -> code) signature
    val sigs = codes.groupBy(col("vec_id") % 2)
      .agg(countDistinct(concat_ws(":", col("sub"), col("code")))
        .as("nsig"))
      .collect().map(_.getLong(1))
    assert(sigs.forall(_ == 2L), s"per-cluster signatures ${sigs.toSeq}")
  }

  test("ADC recall@k is exactly 1.0 on tie-free tight clusters") {
    // jitterless members: exact and ADC both resolve the all-zero-
    // distance ties by n_id asc, so the top-5 SETS must coincide
    val corpus = emb((0 until 40).map { i =>
      (i.toLong, if (i % 2 == 0) Seq(1.0, 1.0, 0.0, 0.0)
      else Seq(0.0, 0.0, 1.0, 1.0))
    })
    val books = Pq.train(corpus, m = 2, subDim = 2, k = 2, iters = 2)
    val codes = Pq.encode(corpus, books, m = 2, subDim = 2)
    val queries = corpus.filter(col("vec_id") < 4)
    val adc = Pq.adcTopK(codes, books, queries, k = 5, m = 2, subDim = 2)
    val exact = Pq.bruteForceL2TopK(corpus, queries, 5)
    val rec = Ann.recallAtK(adc, exact).collect()
    assert(rec.length == 4 && rec.forall(_.getDouble(1) == 1.0),
      rec.map(r => (r.getLong(0), r.getDouble(1))).toSeq.toString)
  }

  test("adcRerankTopK equals brute force whenever the shortlist " +
    "covers the true top-k") {
    val corpus = twoClusters(20)
    val books = Pq.train(corpus, m = 2, subDim = 2, k = 2, iters = 2)
    val codes = Pq.encode(corpus, books, m = 2, subDim = 2)
    val queries = corpus.filter(col("vec_id") < 4)
    // shortlist = full corpus: the exact re-rank then IS brute force
    val rr = Pq.adcRerankTopK(codes, books, queries, corpus, k = 5,
      shortlist = 39, m = 2, subDim = 2)
    val exact = Pq.bruteForceL2TopK(corpus, queries, 5)
    val rec = Ann.recallAtK(rr, exact).collect()
    assert(rec.length == 4 && rec.forall(_.getDouble(1) == 1.0),
      rec.map(r => (r.getLong(0), r.getDouble(1))).toSeq.toString)
  }

  test("training and ADC are invariant under repartitioning") {
    val corpus = twoClusters(15)
    def run(df: DataFrame): Seq[(Long, Int, Int)] = {
      val books = Pq.train(df, m = 2, subDim = 2, k = 2, iters = 2)
      Pq.encode(df, books, m = 2, subDim = 2)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
        .toSeq.sorted
    }
    assert(run(corpus.coalesce(1)) == run(corpus.repartition(7)))
  }
}
