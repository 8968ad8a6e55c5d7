package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-space drift and cluster-quality screens — the monitoring
  * face of the vector stack (Dedup/Ann/Pq answer "which vectors match";
  * this answers "is the embedding DISTRIBUTION moving", the question a
  * training-data pipeline asks before trusting a week of new crawl).
  *
  * Engine-exactness: the Pq discipline throughout — coordinates quantize
  * ONCE to the 1e-4 integer grid, centroids are floor(avg + 0.5) of
  * exact integer coordinate sums (one IEEE division each), every
  * distance is an exact long Σd², and only the final sqrt/divide chain
  * touches floats. Everything replays bit-identically in the oracle.
  *
  * Scale: centroid state is (batches|labels)·dim rows — model-sized, so
  * joins against it broadcast; the only corpus-shuffle is the
  * (group, pos) coordinate aggregate, which collapses map-side.
  */
object VectorDrift {

  private def qz(c: Column): Column = Pq.quantize1e4(c)

  /** Exact per-(group, pos) coordinate sums — the mergeable form: a
    * coarser centroid (e.g. the global one) derives from these sums
    * WITHOUT rescanning the corpus, and floor(Σ/n + 0.5) on the exact
    * long sum matches the oracle's avg-of-BIGINT at any magnitude
    * (a double-accumulating avg() only matches below 2^53). */
  private def coordSums(corpus: DataFrame, group: Column, vecCol: String) =
    corpus.select(group.as("_grp"), posexplode(qz(col(vecCol))))
      .groupBy(col("_grp"), col("pos"))
      .agg(count(lit(1)).as("_n"), sum(col("col")).as("_s"))

  /** Quantized centroid rows → (grp, n_vecs, cvec: array<long>):
    * floor(mean + 0.5) per coordinate — the Pq Lloyd-mean convention. */
  private def centroidOf(sums: DataFrame): DataFrame =
    sums
      .select(col("_grp"), col("pos"), col("_n"),
        floor(col("_s").cast("double") / col("_n") + 0.5).cast("long")
          .as("_m"))
      .groupBy(col("_grp"))
      .agg(max(col("_n")).as("n_vecs"),
        array_sort(collect_list(struct(col("pos"), col("_m")))).as("_pm"))
      .select(col("_grp"), col("n_vecs"),
        transform(col("_pm"), p => p.getField("_m")).as("cvec"))

  private def centroids(corpus: DataFrame, group: Column,
      vecCol: String): DataFrame =
    centroidOf(coordSums(corpus, group, vecCol))

  /** Centroid drift across ingestion batches (batch = id / batchSize):
    * per batch, the L2 distance from the PREVIOUS batch's centroid (the
    * step-to-step drift curve) and from the corpus-global centroid (the
    * cumulative excursion). Distances are reported in original
    * coordinate units (grid distance / 1e4). Output (batch, n_vecs,
    * l2_prev — null for the first batch, l2_global). */
  def centroidShift(corpus: DataFrame, batchSize: Long,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(batchSize > 0, s"batchSize $batchSize must be positive")
    val sums = coordSums(corpus,
      floor(col(idCol) / batchSize).cast("long"), vecCol)
    val cents = centroidOf(sums)
    // global centroid DERIVED from the per-batch sums (exact long
    // merge) — no second corpus scan
    val global = centroidOf(sums.groupBy(col("pos"))
        .agg(sum(col("_n")).as("_n"), sum(col("_s")).as("_s"))
        .select(lit(0L).as("_grp"), col("pos"), col("_n"), col("_s")))
      .select(col("cvec").as("_gvec")) // one row
    val prev = cents.select((col("_grp") + 1).as("_pb"),
      col("cvec").as("_pvec"))
    cents
      .join(prev, col("_grp") === col("_pb"), "left")
      .crossJoin(broadcast(global))
      .select(col("_grp").as("batch"), col("n_vecs"),
        round(sqrt(Pq.l2sqI(col("cvec"), col("_pvec")).cast("double"))
          / 10000.0, 6).as("l2_prev"),
        round(sqrt(Pq.l2sqI(col("cvec"), col("_gvec")).cast("double"))
          / 10000.0, 6).as("l2_global"))
  }

  /** Label purity — the Davies-Bouldin-flavoured cluster-quality
    * screen: per label, the mean SQUARED distance of its members to
    * their own centroid (within-scatter; squared so the sum stays an
    * exact long — a mean of sqrt's would be order-dependent), the
    * nearest OTHER label's centroid (ties to the smaller label), the
    * squared distance to it, and separation = between_sq /
    * mean_sq_within (null when the label's members are identical).
    * Squared distances are in original units (grid² / 1e8).
    * Output (label, n_vecs, mean_sq_within, nearest_label, between_sq,
    * separation). */
  def labelPurity(corpus: DataFrame, labelCol: String = "label",
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = centroids(corpus, col(labelCol).cast("long"), vecCol)
    val own = corpus
      .select(col(labelCol).cast("long").as("_l"), qz(col(vecCol)).as("_v"))
      .join(broadcast(cents.select(col("_grp").as("_l"), col("cvec"))),
        Seq("_l"))
      .select(col("_l"), Pq.l2sqI(col("_v"), col("cvec")).as("_d2"))
      .groupBy(col("_l"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("_d2")).as("_w"))
    val pairs = cents.select(col("_grp").as("_a"), col("cvec").as("_av"))
      .join(broadcast(cents.select(col("_grp").as("_b"), col("cvec").as("_bv"))),
        col("_a") =!= col("_b"))
      .select(col("_a"), col("_b"), Pq.l2sqI(col("_av"), col("_bv")).as("_bd2"))
    val wNear = Window.partitionBy(col("_a"))
      .orderBy(col("_bd2").asc, col("_b").asc)
    val nearest = pairs.withColumn("_rn", row_number().over(wNear))
      .filter(col("_rn") === 1)
      .select(col("_a").as("_l"), col("_b").as("nearest_label"),
        col("_bd2"))
    val meanW = col("_w").cast("double") / col("n_vecs") / lit(1e8)
    own.join(nearest, Seq("_l"))
      .select(col("_l").as("label"), col("n_vecs"),
        round(meanW, 6).as("mean_sq_within"),
        col("nearest_label"),
        round(col("_bd2").cast("double") / lit(1e8), 6).as("between_sq"),
        when(col("_w") > 0, round(col("_bd2").cast("double")
          / (col("_w").cast("double") / col("n_vecs")), 6)).as("separation"))
  }
}
