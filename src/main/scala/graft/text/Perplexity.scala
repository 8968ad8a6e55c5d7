package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CCNet-style n-gram language-model perplexity (Wenzek et al. 2020,
  * "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
  * Data", public): score every document by the perplexity of a bigram LM
  * trained on a reference corpus — CCNet's headline quality signal, used
  * to bucket a crawl into head/middle/tail. The real system uses a
  * KenLM 5-gram model; this keeps the measure's shape (cross-entropy of a
  * smoothed count model over a reference slice) while hashing grams into
  * fixed bucket spaces so the model state is BOUNDED:
  *
  *   p(w_i | w_{i-1}) = (c_b(bucket(w_{i-1} w_i)) + 1)
  *                    / (c_u(bucket(w_{i-1})) + B)
  *   ppl(doc) = exp( − mean_i log p(w_i | w_{i-1}) )
  *
  * with B = `bBuckets` (add-one smoothing; an unseen context scores the
  * uniform 1/B).
  *
  * Scale shape: the two count tables are ≤ uBuckets / ≤ bBuckets rows —
  * tiny distributed model state, never driver-side — broadcast to the
  * scoring pass, which explodes documents to (doc_id, ub:int, bb:int)
  * rows (no text in any shuffle) and re-aggregates per doc. Each bigram's
  * log-probability is quantized to a 1e-6 integer grid, so per-document
  * sums are integer-exact: independent of partial-aggregation order and
  * reproducible in any engine with md5 (same trick as
  * [[graft.sample.Dsir]]). An EMPTY training corpus is well-defined — all
  * contexts unseen, every doc scores the uniform ppl = bBuckets — unlike
  * DSIR's degenerate all-zero ranking, so no loud guard is needed.
  */
object Perplexity {

  private def hashBucket(s: Column, k: Int): Column =
    conv(substring(md5(s.cast("binary")), 1, 8), 16, 10).cast("long") % k

  /** One row per bigram occurrence: (idCol, ub = context bucket,
    * bb = bigram bucket). The pair array is built with zip_with over two
    * slices and consumed by ONE explode — see [[TextOps.bigrams]] for why
    * a lambda must not capture the token array. The token array itself is
    * materialized as a column first: the slice/size tree references it 3×,
    * and interpreted HOF chains get no subexpression elimination, so an
    * inlined tokenizer would re-split every text per reference. */
  private def bigramBuckets(df: DataFrame, text: Column, uBuckets: Int,
      bBuckets: Int, idCol: String): DataFrame = {
    val toks = col("_toks")
    val n1 = greatest(size(toks) - 1, lit(0))
    val pairs = zip_with(slice(toks, lit(1), n1), slice(toks, lit(2), n1),
      (a, b) => struct(a.as("p"), concat(a, lit(" "), b).as("g")))
    df.select(col(idCol),
        transform(TextOps.wsTokens(coalesce(text, lit(""))), t => lower(t)).as("_toks"))
      .select(col(idCol), explode(pairs).as("pg"))
      .select(col(idCol),
        hashBucket(col("pg").getField("p"), uBuckets).as("ub"),
        hashBucket(col("pg").getField("g"), bBuckets).as("bb"))
  }

  /** docs, train: corpora with (idCol, text). Returns one row per doc:
    * (idCol, n_bigrams, ppl) — ppl is NULL for docs with fewer than two
    * tokens (no bigram to score, matching the reference behaviour of
    * skipping empty lines). */
  def perplexity(
      docs: DataFrame,
      train: DataFrame,
      text: Column = col("text"),
      uBuckets: Int = 8192,
      bBuckets: Int = 65536,
      idCol: String = "doc_id"): DataFrame = {
    val trainPairs = bigramBuckets(train, text, uBuckets, bBuckets, idCol)
    val cu = trainPairs.groupBy("ub").agg(count(lit(1)).as("cu"))
    val cb = trainPairs.groupBy("bb").agg(count(lit(1)).as("cb"))
    val perDoc = bigramBuckets(docs, text, uBuckets, bBuckets, idCol)
      .join(broadcast(cb), Seq("bb"), "left")
      .join(broadcast(cu), Seq("ub"), "left")
      .select(col(idCol),
        round(log((coalesce(col("cb"), lit(0L)) + 1).cast("double")
          / (coalesce(col("cu"), lit(0L)) + bBuckets)) * 1e6).cast("long").as("lpi"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum("lpi").as("lps"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        when(col("n_bigrams").isNotNull,
          round(exp(-(col("lps").cast("double") / 1e6) / col("n_bigrams")), 6))
          .as("ppl"))
  }
}
