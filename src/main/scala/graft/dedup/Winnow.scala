package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
  * SIGMOD 2003 — the MOSS algorithm; public knowledge): hash every
  * character k-gram, slide a w-gram window, and keep each window's
  * minimal hash. The guarantee the MinHash/SimHash shingle paths don't
  * give: ANY shared substring of at least w + k − 1 characters yields at
  * least one shared fingerprint, position-independently — the
  * plagiarism/boilerplate detection modality, complementing
  * [[Dedup]]'s probabilistic families with a deterministic one.
  *
  * Engine-exactness: gram hashes are the first 40 bits of md5 (the
  * repo's md5-grid convention, [[graft.sketch.Kmv.hash60]] shape), and
  * each (hash, position) pair packs into ONE long `h·2²⁰ + pos`, so the
  * per-window argmin with leftmost-on-tie ordering is a plain integer
  * `array_min` — bit-replayable in any engine. Positions are bounded by
  * 2²⁰ grams/doc (the pack's invariant — enforced, never silent).
  *
  * Scale shape: gram hashing and window minimization run INSIDE the row
  * as codegen'd higher-order functions — the k-gram blow-up (|text|
  * rows per doc) never enters a shuffle; only the winnowed fingerprints
  * (expected density 2/(w+1) of grams) leave the row. The near-dup join
  * is a capped bucketed equi-join on fingerprint hash, the same
  * never-all-pairs contract as every [[Dedup]] candidate generator.
  */
object Winnow {

  /** Pack bound: gram positions must stay strictly below 2²⁰. */
  val MaxGrams: Int = 1 << 20

  /** One row per (doc, fingerprint): (idCol, fp_pos, fp_hash) — fp_pos
    * is the 1-based gram position whose window selected it. Docs with
    * fewer than k chars emit nothing. */
  def fingerprints(docs: DataFrame, k: Int = 8, w: Int = 16,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k >= 1 && w >= 1, s"k $k and w $w must be >= 1")
    val gramsSql = s"""transform(sequence(1, _n),
         i -> cast(conv(substring(md5(substring($textCol, i, $k)), 1, 10),
                        16, 10) as bigint) * 1048576 + i)"""
    val selSql = s"""array_distinct(transform(
         sequence(1, greatest(_n - ${w - 1}, 1)),
         j -> array_min(slice(_g, j, $w))))"""
    docs
      .withColumn("_n", (length(col(textCol)) - (k - 1)).cast("long"))
      // assert the pack invariant loudly — a silently wrapped position
      // would corrupt fingerprints for every window of an oversized doc
      .withColumn("_g",
        when(col(textCol).isNull || col("_n") < 1,
          array().cast("array<bigint>"))
          .when(col("_n") >= MaxGrams, expr(
            s"raise_error('Winnow: document exceeds $MaxGrams grams; " +
              "raise k or pre-chunk')"))
          .otherwise(expr(gramsSql)))
      .withColumn("_fps",
        when(size(col("_g")) < 1, array().cast("array<bigint>"))
          .otherwise(expr(selSql)))
      .select(col(idCol), explode(col("_fps")).as("_p"))
      .select(col(idCol),
        pmod(col("_p"), lit(1048576L)).cast("long").as("fp_pos"),
        floor(col("_p") / lit(1048576L)).cast("long").as("fp_hash"))
  }

  /** Near-duplicate pairs by shared winnowed fingerprints — the MOSS
    * similarity report: docs sharing at least `minShared` distinct
    * fingerprint hashes, with the fingerprint-set Jaccard. Hashes
    * appearing in more than `maxDf` docs are boilerplate (headers,
    * license blocks) and are dropped BEFORE the pair join — the cap
    * that keeps the join's fan-out bounded at corpus scale (a hash in
    * d docs contributes d² pair rows; uncapped, one ubiquitous template
    * string would quadratically dominate the shuffle).
    * Output (doc_a, doc_b, n_shared, n_a, n_b, jaccard), doc_a < doc_b. */
  def nearDupPairs(docs: DataFrame, k: Int = 8, w: Int = 16,
      minShared: Int = 2, maxDf: Int = 50,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val fps = fingerprints(docs, k, w, idCol, textCol)
      .select(col(idCol), col("fp_hash")).distinct()
    val sizes = fps.groupBy(col(idCol)).agg(count(lit(1)).as("_sz"))
    val kept = fps.join(
      fps.groupBy(col("fp_hash")).agg(count(lit(1)).as("_df"))
        .filter(col("_df") <= maxDf),
      Seq("fp_hash"))
    val pairs = kept.select(col("fp_hash"), col(idCol).as("doc_a"))
      .join(kept.select(col("fp_hash"), col(idCol).as("doc_b")),
        Seq("fp_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    pairs
      .join(sizes.select(col(idCol).as("doc_a"), col("_sz").as("n_a")),
        Seq("doc_a"))
      .join(sizes.select(col(idCol).as("doc_b"), col("_sz").as("n_b")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        col("n_a"), col("n_b"),
        round(col("n_shared").cast("double") /
          (col("n_a") + col("n_b") - col("n_shared")), 6).as("jaccard"))
  }
}
