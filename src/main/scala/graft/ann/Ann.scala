package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>). Brute-force cosine top-k is the exact baseline; the IVF
  * variant is the scale path: assign every vector to its nearest coarse
  * centroid once (one broadcast join), then probe only nProbe cells per
  * query — the candidate set shrinks by ~nCells/nProbe at equal recall on
  * clustered data (IVF-Flat, à la FAISS — public knowledge).
  */
object Ann {

  /** Cosine similarity between two array<float|double> columns — pure
    * declarative expressions (zip_with + aggregate), no UDF. (A fixed-
    * index GetArrayItem expansion was tried for codegen participation and
    * measured 3x slower end-to-end: the optimizer cost of the ~200-node
    * tree dominates at every tested size.) */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)
    val na = sqrt(aggregate(a, lit(0.0d), (acc, x) => acc + x * x))
    val nb = sqrt(aggregate(b, lit(0.0d), (acc, x) => acc + x * x))
    dot / (na * nb)
  }

  /** Exact top-k neighbors for each query vector (queries is small and
    * broadcast; corpus is the big side). Deterministic ordering:
    * (rounded cos desc, corpus id asc). Output (q_id, n_id, cos, rank).
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec")))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
    val scored = c.crossJoin(q)
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"), round(cosine(col("q_vec"), col("n_vec")), 6).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** IVF cell assignment: nearest of `centroids` (tiny, broadcast) by
    * cosine. Similarities are rounded to 6 digits before the argmax (ties
    * then break on cell asc) so assignments are reproducible across engines
    * and summation orders — the DuckDB oracle evaluates the same rule.
    * Returns corpus + `cell`. */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding",
      cellCol: String = null, keepSim: Boolean = false): DataFrame = {
    val cc = Option(cellCol).getOrElse(idCol)
    val cents = broadcast(centroids.select(col(cc).as("cell"), col(vecCol).as("c_vec")))
    val w = Window.partitionBy(col(idCol)).orderBy(col("sim").desc, col("cell").asc)
    val assigned = corpus
      .crossJoin(cents)
      .select(col(idCol), col(vecCol), col("cell"),
        round(cosine(col(vecCol), col("c_vec")), 6).as("sim"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
    // keepSim retains the winning rounded cosine (consumers like SemDeDup
    // need it — recomputing it would mean a second centroid join)
    if (keepSim) assigned.drop("_rn") else assigned.drop("_rn", "sim")
  }

  /** IVF top-k: per query, probe the nProbe nearest cells and brute-force
    * only inside them. Probe ranking uses the same rounded-cosine rule as
    * [[ivfAssign]].
    *
    * `broadcastQueries = true` (default) fits the query-SET shape: the
    * probe table (queries x nProbe) is broadcast so the corpus never
    * shuffles. For a query CORPUS (e.g. all-pairs ANN dedup over 100 TB,
    * where "queries" is the whole embedding table) set it false: both
    * sides then shuffle-join co-partitioned on `cell`, which is the only
    * shape that scales when neither side fits an executor (same flag
    * pattern as `sampleIntervalAt`'s broadcastCells). */
  def ivfTopK(
      assigned: DataFrame, centroids: DataFrame, queries: DataFrame,
      k: Int, nProbe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      cellCol: String = null,
      broadcastQueries: Boolean = true): DataFrame = {
    val cc = Option(cellCol).getOrElse(idCol)
    val cents = broadcast(centroids.select(col(cc).as("cell"), col(vecCol).as("c_vec")))
    val qCells = queries
      .select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
      .crossJoin(cents)
      .withColumn("_rn", row_number().over(
        Window.partitionBy("q_id")
          .orderBy(round(cosine(col("q_vec"), col("c_vec")), 6).desc, col("cell").asc)))
      .filter(col("_rn") <= nProbe)
      .select(col("q_id"), col("q_vec"), col("cell"))
    val c = assigned.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"), col("cell"))
    val probeSide = if (broadcastQueries) broadcast(qCells) else qCells
    val joined =
      if (broadcastQueries) c.join(probeSide, Seq("cell"))
      else c.repartition(col("cell")).join(probeSide.repartition(col("cell")), Seq("cell"))
    val scored = joined
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"), round(cosine(col("q_vec"), col("n_vec")), 6).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Lloyd's k-means over double embedding vectors — the real IVF coarse
    * quantizer (k-means|| at cluster scale differs only in seeding; Lloyd's
    * iterations are the same distributed shape: one broadcast-join
    * assignment pass + one groupBy mean per iteration). Deterministic:
    * seeds are the k lowest-id vectors; assignment uses the rounded-cosine
    * argmax of [[ivfAssign]]. Centroids live on the driver between
    * iterations (k x dim doubles — model state, not data; the per-iteration
    * collect is k rows). Empty cells keep their previous centroid.
    * Returns the centroid table (cell: long, embedding: array<double>).
    */
  def kMeans(
      corpus: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      roundTo: Option[Int] = None): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // roundTo pins seed and mean coordinates to fixed decimals so the
    // trained centroids are bit-identical across engines/summation orders
    // (the oracle replays the same Lloyd iterations in SQL)
    def rounded(c: Column): Column =
      roundTo.fold(c)(d => transform(c, x => round(x, d)))
    var cents: Seq[(Long, Seq[Double])] = corpus
      .orderBy(col(idCol))
      .limit(k)
      .select(rounded(col(vecCol)))
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i.toLong, r.getSeq[Double](0)) }
      .toSeq
    for (_ <- 1 to iters) {
      val centsDf = cents.toDF("cell", vecCol)
      val assigned = ivfAssign(corpus, centsDf, idCol, vecCol, cellCol = "cell")
      val means = assigned
        .select(col("cell"), posexplode(col(vecCol)))
        .groupBy(col("cell"), col("pos"))
        .agg(roundTo.fold(avg(col("col")))(d => round(avg(col("col")), d)).as("m"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell"), transform(col("pm"), p => p.getField("m")).as(vecCol))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1)))
        .toMap
      cents = cents.map { case (c, v) => (c, means.getOrElse(c, v)) }
    }
    cents.toDF("cell", vecCol)
  }

  /** recall@k of an ANN result against the brute-force ground truth —
    * both in (q_id, n_id, rank) form. */
  def recallAtK(ann: DataFrame, exact: DataFrame): DataFrame =
    exact.select(col("q_id"), col("n_id"))
      .join(ann.select(col("q_id"), col("n_id"), lit(1).as("_hit")), Seq("q_id", "n_id"), "left")
      .groupBy(col("q_id"))
      .agg((sum(coalesce(col("_hit"), lit(0))).cast("double") / count(lit(1))).as("recall"))
}
