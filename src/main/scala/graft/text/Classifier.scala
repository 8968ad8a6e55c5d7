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
    * One compiled linear pass per document (a designated per-row UDF site,
    * guide §4.2 "do the heavy lifting in native code"): the previous
    * expression form — an `aggregate()` HOF folding md5+conv per gram —
    * is INTERPRETED (higher-order functions never enter whole-stage
    * codegen), and each element evaluation re-walked the md5/conv/substring
    * expression trees with boxed operands (~18 ms/doc measured on the q79
    * gate stage: 9.2 s cpu for 500 docs). The scan below replays the exact
    * same arithmetic — Spark's own UTF8String lowercase, md5-front-8-hex
    * bucket and dyadic weight, left-fold double sum in gram order
    * (uni-grams then bigrams), HALF_UP round — so the score is
    * bit-identical (spec'd by SelectionSpec and the q76/q79 oracles). */
  private[text] def md5Front8(md: java.security.MessageDigest, s: String): Long = {
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    md.reset()
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  private[text] def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** JVM replay of [[TextOps.wsTokens]]: trim SPACES only (Spark's trim),
    * split on \s+, drop empties. */
  private[text] def wsTokensJvm(text: String): Array[String] = {
    if (text == null) return Array.empty
    var b = 0; var e = text.length
    while (b < e && text.charAt(b) == ' ') b += 1
    while (e > b && text.charAt(e - 1) == ' ') e -= 1
    if (e == b) return Array.empty
    text.substring(b, e).split("\\s+", -1).filter(_.nonEmpty)
  }

  def hashedNgramScore(
      df: DataFrame,
      text: Column = col("text"),
      buckets: Int = 4096,
      seed: String = "w"): DataFrame = {
    val scoreUdf = udf((t: String) => {
      val md = java.security.MessageDigest.getInstance("MD5")
      // lowercase via Spark's own UTF8String path so non-ASCII folds
      // exactly like the lower() expression did
      val toks = wsTokensJvm(if (t == null) "" else t).map(x =>
        org.apache.spark.unsafe.types.UTF8String.fromString(x).toLowerCase.toString)
      var s = 0.0
      var n = 0
      val total = if (toks.length >= 2) 2 * toks.length - 1 else toks.length
      while (n < total) {
        val g = if (n < toks.length) toks(n)
          else { val j = n - toks.length; toks(j) + " " + toks(j + 1) }
        val b = md5Front8(md, g) % buckets
        s += (md5Front8(md, seed + b.toString) % 2048).toDouble / 1024.0 - 1.0
        n += 1
      }
      val score =
        if (n > 0) round6(1.0 / (1.0 + math.exp(-(s / n)))) else 0.5
      (n, score)
    })
    df.withColumn("_clf_sn", scoreUdf(text))
      .withColumn("n_grams", col("_clf_sn").getField("_1"))
      .withColumn("clf_score", col("_clf_sn").getField("_2"))
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
