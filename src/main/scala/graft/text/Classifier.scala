package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** fastText-shaped linear quality classifier inference (Joulin et al.
  * 2016, public; the model family behind the GPT-3/CCNet/RedPajama "looks
  * like Wikipedia" quality filters): lowercased whitespace uni+bigrams,
  * feature-hashed into `buckets`, mean of per-bucket weights, sigmoid.
  *
  * The weights here are a deterministic md5-derived stand-in for trained
  * parameters — each bucket's weight is a dyadic rational in [-1, 1)
  * (k/1024), so the per-document sum is EXACT in float64 regardless of
  * summation order and any engine reproduces the score bit-for-bit. The
  * plumbing (tokenize → hash → bucket → mean → sigmoid) is the real
  * inference shape: swapping [[weightOf]] for a trained vector lookup
  * changes nothing about the plan. Everything is a scan-projection array
  * expression — no explode, no UDF, no shuffle.
  */
object Classifier {

  /** Hashed uni+bigram bucket ids for one document (shared with
    * [[graft.sample.Dsir]]): lowercased whitespace tokens, 2-grams joined
    * by one space, md5-front-8-hex bucketing. */
  def gramBuckets(text: Column, buckets: Int): Column = {
    // null text = no grams (NOT a null array: size() must give 0, and the
    // q76 oracle's unnest-then-coalesce shape counts these docs as 0)
    val toks = transform(TextOps.wsTokens(coalesce(text, lit(""))), t => lower(t))
    transform(concat(toks, TextOps.bigrams(toks)),
      g => conv(substring(md5(g.cast("binary")), 1, 8), 16, 10).cast("long") % buckets)
  }

  /** Deterministic dyadic weight for a bucket: (md5int(seed||b) mod 2048)
    * / 1024 − 1 ∈ [-1, 1). */
  def weightOf(b: Column, seed: String): Column =
    (conv(substring(md5(concat(lit(seed), b.cast("string")).cast("binary")), 1, 8), 16, 10)
      .cast("long") % 2048).cast("double") / 1024.0 - 1.0

  /** Adds n_grams and clf_score ∈ [0,1] (0.5 for gram-less documents).
    *
    * One pass over the bucket array: the aggregate's accumulator carries
    * (weight sum, element count) together, so the gram/bucket construction
    * is referenced exactly ONCE per output column instead of three times
    * inside clf_score — interpreted higher-order functions get no common-
    * subexpression elimination, so every extra reference re-hashed every
    * gram (measured 2.4× the single-pass cost). The fold order over the
    * array is unchanged, so the double sum — and therefore the score — is
    * bit-identical to the previous form. */
  def hashedNgramScore(
      df: DataFrame,
      text: Column = col("text"),
      buckets: Int = 4096,
      seed: String = "w"): DataFrame = {
    val bk = gramBuckets(text, buckets)
    val sn = aggregate(bk,
      struct(lit(0.0).as("s"), lit(0).as("n")),
      (acc, b) => struct((acc.getField("s") + weightOf(b, seed)).as("s"),
        (acc.getField("n") + 1).as("n")))
    // _clf_sn is referenced by BOTH outputs, and CollapseProject does not
    // inline a non-cheap alias with multiple consumers — the aggregate runs
    // once per row
    df.withColumn("_clf_sn", sn)
      .withColumn("n_grams", col("_clf_sn").getField("n"))
      .withColumn("clf_score",
        when(col("_clf_sn").getField("n") > 0,
          round(lit(1.0) / (lit(1.0) +
            exp(-(col("_clf_sn").getField("s") / col("_clf_sn").getField("n")))), 6))
          .otherwise(0.5))
      .drop("_clf_sn")
  }
}
