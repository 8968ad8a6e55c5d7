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

  /** (idCol, y, b, x) feature rows for training: x_db = count of grams of
    * doc d hashing to bucket b, divided by the doc's gram count (the
    * fastText mean-of-embeddings shape). Gram-less docs drop out. */
  def featureRows(docs: DataFrame, label: Column, buckets: Int,
      text: Column, idCol: String): DataFrame =
    docs
      // one md5 per gram is the dominant cost — spread it before hashing,
      // or a single-file parquet scan serializes it on one task (same
      // reasoning as Dedup.minhashSignature)
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol), label.cast("double").as("y"),
        gramBuckets(text, buckets).as("_bks"))
      .select(col(idCol), col("y"), size(col("_bks")).as("_n"),
        explode(col("_bks")).as("b"))
      .groupBy(col(idCol), col("y"), col("_n"), col("b"))
      .agg(count(lit(1)).cast("double").as("_c"))
      .select(col(idCol), col("y"), col("b"),
        (col("_c") / col("_n")).as("x"))

  /** Full-batch gradient-descent TRAINING of the hashed-n-gram quality
    * classifier — the in-engine counterpart of [[hashedNgramScore]]'s
    * inference (fastText-style quality filters are trained exactly so:
    * linear model over hashed gram features, Joulin et al. 2016).
    *
    * Engine-exact by construction, so a SQL oracle replays every step
    * bit-for-bit:
    *  - the link is the rational "fast sigmoid" σ(z) = 0.5 + z/(2(1+|z|))
    *    — only IEEE add/mul/div/abs, each correctly rounded and therefore
    *    identical in any engine, unlike exp() whose last ulp may differ;
    *  - every cross-row float sum (per-doc z, per-bucket gradient) is
    *    quantized to a 1e-6 integer grid and summed as longs, so partial-
    *    aggregation order cannot change a result (the Dsir/Perplexity
    *    trick);
    *  - weights live on the same 1e-6 grid after every update.
    *
    * Scale shape: feature rows are computed ONCE and checkpointed; each
    * step is two digest-small shuffles (per-doc z, per-bucket gradient)
    * against a broadcast weight table; the weights (≤ buckets rows) are
    * the per-step driver model state, the same pattern as
    * [[graft.ann.Ann.kMeans]] centroids and [[Bpe.train]] merges.
    *
    * Returns the trained (b, w) weight table. */
  def trainLogistic(
      docs: DataFrame,
      label: Column,
      steps: Int,
      lr: Double,
      buckets: Int = 4096,
      text: Column = col("text"),
      idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val fb = featureRows(docs, label, buckets, text, idCol).localCheckpoint(true)
    val nDocs = fb.select(col(idCol)).distinct().count().toDouble
    require(nDocs > 0, "trainLogistic: no document has any gram")
    var w = fb.select(col("b")).distinct().collect()
      .map(r => (r.getLong(0), 0.0)).sortBy(_._1)
    var step = 0
    while (step < steps) {
      val wDf = w.toSeq.toDF("b", "w")
      // ONE job, two shuffles: per-doc z rides a doc-partitioned window
      // over the feature rows (the integer-grid sum is order-independent,
      // so window vs groupBy is value-identical), then the gradient
      // aggregates per bucket — no per-step join back onto fb
      val grad = fb
        .join(broadcast(wDf), Seq("b"))
        .withColumn("z",
          sum(round(col("w") * col("x") * 1e6).cast("long"))
            .over(org.apache.spark.sql.expressions.Window.partitionBy(col(idCol)))
            / 1e6)
        .withColumn("r",
          lit(0.5) + col("z") / (lit(2.0) * (lit(1.0) + abs(col("z")))) - col("y"))
        .groupBy(col("b"))
        .agg(sum(round(col("r") * col("x") * 1e6).cast("long")).as("g"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      w = w.map { case (b, wb) =>
        val upd = wb - (lr * grad.getOrElse(b, 0L)) / (1e6 * nDocs)
        // grid-snap EXACTLY as the SQL oracle does — round(upd*1e6)/1e6
        // with half-away-from-zero on the double PRODUCT (math.rint is
        // half-to-even and BigDecimal rounds the pre-product value; both
        // can differ at a half boundary)
        val prod = upd * 1e6
        val snapped = if (prod >= 0) math.floor(prod + 0.5) else math.ceil(prod - 0.5)
        (b, snapped / 1e6)
      }
      step += 1
    }
    w.toSeq.toDF("b", "w")
  }
}
