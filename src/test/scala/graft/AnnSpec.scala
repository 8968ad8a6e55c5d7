package graft

import graft.ann.Ann
import org.apache.spark.sql.functions._

/** k-means IVF index quality: on synthetically clustered vectors the
  * trained coarse quantizer must recover the clusters, and probe-limited
  * search must hit near-exact recall vs the brute-force ground truth. */
class AnnSpec extends SparkSpec {
  val rnd = new scala.util.Random(99)
  val dim = 16

  /** 4 well-separated clusters: center = one-hot-ish basis direction,
    * members = center + small noise. */
  def clustered(perCluster: Int): org.apache.spark.sql.DataFrame = {
    val s = spark
    import s.implicits._
    val rows = for {
      c <- 0 until 4
      i <- 0 until perCluster
    } yield {
      val v = Array.tabulate(dim)(d =>
        (if (d == c * 4) 10.0 else 0.0) + rnd.nextGaussian() * 0.3)
      ((c * perCluster + i).toLong, c, v.toSeq)
    }
    rows.toDF("vec_id", "true_cluster", "embedding")
  }

  test("kMeans recovers well-separated clusters (deterministic seeding)") {
    val corpus = clustered(25).persist()
    val cents = Ann.kMeans(corpus, k = 4, iters = 5).persist()
    assert(cents.count() == 4)
    val assigned = Ann.ivfAssign(corpus, cents, cellCol = "cell")
    // purity: every learned cell maps to exactly one true cluster
    val purity = assigned
      .join(corpus.select("vec_id", "true_cluster"), "vec_id")
      .groupBy("cell")
      .agg(countDistinct("true_cluster").as("n"))
      .agg(max("n")).head().getLong(0)
    assert(purity == 1L, s"impure cells (purity=$purity)")
    // determinism: a second fit yields identical centroids
    val again = Ann.kMeans(corpus, k = 4, iters = 5)
    assert(cents.exceptAll(again).isEmpty && again.exceptAll(cents).isEmpty)
    corpus.unpersist(); cents.unpersist()
  }

  test("kMeans-IVF with nProbe=1 reaches recall@5 >= 0.9 on clustered data") {
    val corpus = clustered(25).persist()
    val queries = corpus.filter(col("vec_id") % 25 === 3)
    val cents = Ann.kMeans(corpus, k = 4, iters = 5)
    val assigned = Ann.ivfAssign(corpus, cents, cellCol = "cell")
    val ann = Ann.ivfTopK(assigned, cents, queries, k = 5, nProbe = 1, cellCol = "cell")
    val exact = Ann.bruteForceTopK(corpus, queries, 5)
    val recall = Ann.recallAtK(ann, exact).agg(avg("recall")).head().getDouble(0)
    assert(recall >= 0.9, s"recall@5 = $recall")
    corpus.unpersist()
  }

  test("ivfTopK broadcastQueries=false shuffle-joins on cell (query-corpus shape)") {
    // the default broadcasts the probe table (right for query SETS); the
    // flag must instead co-partition both sides on `cell` — the only shape
    // that survives when "queries" is the whole corpus (round-3 verdict #2)
    val corpus = clustered(25).persist()
    val cents = Ann.kMeans(corpus, k = 4, iters = 3)
    val assigned = Ann.ivfAssign(corpus, cents, cellCol = "cell")
    val queries = corpus.filter(col("vec_id") % 25 === 3)
    // pin static planning so the assertion sees the declared join strategy,
    // not a size-estimate broadcast of these tiny test frames
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      def planOf(broadcastQueries: Boolean): String =
        Ann.ivfTopK(assigned, cents, queries, k = 5, nProbe = 1, cellCol = "cell",
          broadcastQueries = broadcastQueries)
          .queryExecution.executedPlan.toString
      // centroid broadcasts (tiny, legitimate) appear in BOTH plans; the
      // flag controls whether the PROBE join adds one more
      val nBroadcasts = "BroadcastExchange".r
      val extra = nBroadcasts.findAllIn(planOf(true)).size -
        nBroadcasts.findAllIn(planOf(false)).size
      assert(extra >= 1, "flag=false must drop the probe-side broadcast")
      // and the results are identical either way
      val viaShuffle = Ann.ivfTopK(assigned, cents, queries, k = 5, nProbe = 1,
        cellCol = "cell", broadcastQueries = false)
        .select("q_id", "n_id", "rank").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val viaBroadcast = Ann.ivfTopK(assigned, cents, queries, k = 5, nProbe = 1,
        cellCol = "cell")
        .select("q_id", "n_id", "rank").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(viaShuffle == viaBroadcast && viaShuffle.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      corpus.unpersist()
    }
  }

  test("driver q60: trained-IVF recall@10 >= 0.9 at nProbe=3 (pinned)") {
    // sf0.01 = the driver's correctness-gate scale; at sf0.001 the corpus
    // is ~50 vectors and cell populations are too thin for a recall bound
    val got = GraftQueries.qAnnRecall(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.nonEmpty)
    got.foreach { case (q, r) => assert(r >= 0.9, s"recall@10 for query $q = $r < 0.9") }
  }
}
