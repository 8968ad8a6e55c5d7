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
    val bi = when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - 2),
        i => concat_ws(" ", slice(toks, i + 1, lit(2)))))
      .otherwise(array().cast("array<string>"))
    transform(concat(toks, bi),
      g => conv(substring(md5(g.cast("binary")), 1, 8), 16, 10).cast("long") % buckets)
  }

  /** Deterministic dyadic weight for a bucket: (md5int(seed||b) mod 2048)
    * / 1024 − 1 ∈ [-1, 1). */
  def weightOf(b: Column, seed: String): Column =
    (conv(substring(md5(concat(lit(seed), b.cast("string")).cast("binary")), 1, 8), 16, 10)
      .cast("long") % 2048).cast("double") / 1024.0 - 1.0

  /** Adds n_grams and clf_score ∈ [0,1] (0.5 for gram-less documents). */
  def hashedNgramScore(
      df: DataFrame,
      text: Column = col("text"),
      buckets: Int = 4096,
      seed: String = "w"): DataFrame = {
    val bk = gramBuckets(text, buckets)
    val s = aggregate(bk, lit(0.0), (acc, b) => acc + weightOf(b, seed))
    df.withColumn("n_grams", size(bk))
      .withColumn("clf_score",
        when(size(bk) > 0, round(lit(1.0) / (lit(1.0) + exp(-(s / size(bk)))), 6))
          .otherwise(0.5))
  }
}
