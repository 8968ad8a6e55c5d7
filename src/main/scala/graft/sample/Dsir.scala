package graft.sample

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection with Importance Resampling (Xie et al., NeurIPS
  * 2023, public): rank raw-corpus documents by how target-like their
  * hashed n-gram distribution is,
  *   log w(doc) = Σ_g [ log p̂_tgt(b(g)) − log p̂_raw(b(g)) ]
  * with add-one smoothing over `buckets` hashed uni+bigram buckets
  * ([[graft.text.Classifier.gramBuckets]]).
  *
  * Scale shape: the two distributions are bucket-count aggregates — at
  * most `buckets` rows each, tiny distributed model state that never
  * collects to the driver. The per-document pass explodes grams to
  * (doc_id, bucket:int) — no text in the shuffle — and broadcast-joins
  * the log-ratio table. The per-bucket log-ratio is quantized to a 1e-6
  * integer grid, so per-document sums are integer-exact: the result is
  * independent of partial-aggregation order (and reproducible in any
  * engine). Resampling is downstream: order/filter on log_weight, or add
  * deterministic Gumbel noise from a doc_id hash and take top-k.
  */
object Dsir {

  /** raw, target: corpora with (idCol, text). Returns one row per raw doc:
    * (idCol, n_grams, log_weight), gram-less docs at weight 0. */
  def importanceWeights(
      raw: DataFrame,
      target: DataFrame,
      text: Column = col("text"),
      buckets: Int = 8192,
      idCol: String = "doc_id"): DataFrame = {
    def bucketCounts(df: DataFrame) =
      df.select(explode(graft.text.Classifier.gramBuckets(text, buckets)).as("b"))
        .groupBy("b").agg(count(lit(1)).as("n"))
    val rawB = bucketCounts(raw)
    val tgtB = bucketCounts(target)
    // 1×1 — a broadcastable scalar pair; an empty corpus (sum = NULL)
    // fails LOUDLY: silently yielding all-zero weights would make a
    // misconfigured target filter look like a finished no-op ranking
    def orFail(c: Column, side: String): Column =
      when(c.isNull, raise_error(
        lit(s"Dsir.importanceWeights: $side corpus has no grams — check its filter"))
        .cast("long")).otherwise(c)
    val tot = rawB.agg(sum(col("n")).as("rtot"))
      .crossJoin(tgtB.agg(sum(col("n")).as("ttot")))
      .select(orFail(col("rtot"), "raw").as("rtot"), orFail(col("ttot"), "target").as("ttot"))
    val ratio = rawB.withColumnRenamed("n", "rn")
      .join(tgtB.withColumnRenamed("n", "tn"), Seq("b"), "full_outer")
      .crossJoin(broadcast(tot))
      .select(col("b"),
        round((log((coalesce(col("tn"), lit(0L)) + 1).cast("double") / (col("ttot") + buckets))
          - log((coalesce(col("rn"), lit(0L)) + 1).cast("double") / (col("rtot") + buckets)))
          * 1e6).cast("long").as("lri"))
    val perDoc = raw
      .select(col(idCol), explode(graft.text.Classifier.gramBuckets(text, buckets)).as("b"))
      .join(broadcast(ratio), Seq("b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), sum(col("lri")).as("lwi"))
    raw.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        round(coalesce(col("lwi"), lit(0L)).cast("double") / 1e6, 6).as("log_weight"))
  }
}
