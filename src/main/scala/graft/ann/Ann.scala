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
    * codegen'd expressions (zip_with + aggregate), no UDF. */
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
    * cosine. Returns corpus + `cell`. */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = broadcast(centroids.select(col(idCol).as("cell"), col(vecCol).as("c_vec")))
    val w = Window.partitionBy(col(idCol)).orderBy(col("sim").desc, col("cell").asc)
    corpus
      .crossJoin(cents)
      .select(col(idCol), col(vecCol), col("cell"), cosine(col(vecCol), col("c_vec")).as("sim"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "sim")
  }

  /** IVF top-k: per query, probe the nProbe nearest cells and brute-force
    * only inside them. */
  def ivfTopK(
      assigned: DataFrame, centroids: DataFrame, queries: DataFrame,
      k: Int, nProbe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = broadcast(centroids.select(col(idCol).as("cell"), col(vecCol).as("c_vec")))
    val qCells = queries
      .select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
      .crossJoin(cents)
      .withColumn("_rn", row_number().over(
        Window.partitionBy("q_id").orderBy(cosine(col("q_vec"), col("c_vec")).desc, col("cell").asc)))
      .filter(col("_rn") <= nProbe)
      .select(col("q_id"), col("q_vec"), col("cell"))
    val c = assigned.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"), col("cell"))
    val scored = c.join(broadcast(qCells), Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"), round(cosine(col("q_vec"), col("n_vec")), 6).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
