package graft.pack

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training data: deterministically shuffle the
  * corpus, concatenate it into one virtual token stream, and chunk that
  * stream into fixed-length blocks (the GPT-style "concat-and-chunk"
  * batching shape). Output is the block membership table — for each
  * (block, doc) overlap, the doc-relative token span that lands in the
  * block — which a loader joins back to tokenized docs to materialize
  * training sequences.
  *
  * Scale shape: the global order is `md5(doc_id # seed)` — a deterministic
  * shuffle that is also FREE range partitioning, because the hash is
  * uniform: the first two hex chars split the stream into 256 ordered,
  * evenly-loaded buckets. The exclusive prefix sum of token counts is
  * computed per bucket (one hash(_bkt) exchange + in-bucket window) and
  * stitched with per-bucket offsets from a 256-row triangular self-join —
  * no unpartitioned window anywhere, nothing driver-side, nothing
  * proportional to corpus size outside the one exchange. Block spans then
  * come from pure per-row arithmetic (a doc spanning B blocks explodes
  * into B rows; B ≤ n_tokens/blockTokens + 1).
  */
object Packing {

  /** Deterministic shard assignment + per-shard export manifest — the
    * reproducibility contract of a dataset release: every document maps
    * to a shard by content-independent id hash (stable under corpus
    * reorder, partitioning, and engine), and the manifest row per shard
    * carries the counts and an order-independent id digest a consumer
    * can re-derive to prove the shard it read is the shard that was
    * written. Output (shard, n_docs, n_tokens, ids_digest).
    *
    * The digest is md5 over the comma-joined ASCENDING id list — an
    * engine-portable canonical form (any engine can replay it); the
    * per-shard sort is bounded by shard size (corpus/nShards), the same
    * O(rows log rows/shards) as writing sorted shard files, which a
    * release does anyway. One shuffle on the shard id; the md5-prefix
    * hash (the [[graft.sample.Sampling.unitHash]] convention — any
    * engine can replay it, unlike xxhash64) spreads ids uniformly so
    * shards balance regardless of id distribution. */
  def shardManifest(
      df: DataFrame,
      nShards: Int,
      idCol: String = "doc_id",
      tokenCol: String = "n_tokens"): DataFrame = {
    require(nShards > 0, s"nShards $nShards must be positive")
    val h = conv(substring(
      md5(concat(lit("shard"), col(idCol).cast("string")).cast("binary")),
      1, 8), 16, 10).cast("long")
    df.groupBy(pmod(h, lit(nShards.toLong)).as("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(tokenCol)).as("n_tokens"),
        md5(concat_ws(",",
          transform(sort_array(collect_list(col(idCol))), _.cast("string")))
          .cast("binary")).as("ids_digest"))
  }

  /** docs + a token-count column -> (block_id, doc_id, tok_start, tok_end)
    * with doc-relative half-open spans; every block except the last holds
    * exactly `blockTokens` tokens. Zero-token docs are dropped (they carry
    * no trainable content and would need an arbitrary block assignment).
    */
  def packSequences(
      docs: DataFrame,
      nTokens: Column,
      blockTokens: Long,
      seed: Long = 42L,
      idCol: String = "doc_id"): DataFrame = {
    require(blockTokens > 0, s"blockTokens must be positive: $blockTokens")
    val d0 = docs
      .select(col(idCol), nTokens.cast("long").as("_n"))
      .filter(col("_n") > 0)
      .withColumn("_ord", md5(concat(col(idCol).cast("string"), lit("#" + seed))))
      .withColumn("_bkt", substring(col("_ord"), 1, 2))
    // per-bucket totals; cross-bucket exclusive offsets via a triangular
    // join over the ≤256-row totals frame (a window here would be the
    // unpartitioned single-task trap PlanAuditSpec forbids; the join is
    // broadcast tiny-by-tiny and its size is fixed at any corpus scale)
    val totals = d0.groupBy(col("_bkt")).agg(sum(col("_n")).as("_t"))
    val before = totals.select(col("_bkt").as("_pb"), col("_t").as("_pt"))
    val offsets = totals
      .join(before, col("_pb") < col("_bkt"), "left")
      .groupBy(col("_bkt")).agg(coalesce(sum(col("_pt")), lit(0L)).as("_off"))
      .select(col("_bkt").as("_ob"), col("_off"))
    val wIn = Window.partitionBy("_bkt").orderBy(col("_ord"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = d0
      .join(offsets, col("_bkt") === col("_ob")) // AQE: broadcast (≤256 rows)
      .withColumn("_c1", col("_off") + sum(col("_n")).over(wIn))
      .withColumn("_c0", col("_c1") - col("_n"))
    val L = lit(blockTokens)
    cum
      .select(col(idCol), col("_n"), col("_c0"),
        explode(sequence(floor(col("_c0") / L), floor((col("_c1") - lit(1)) / L)))
          .as("block_id"))
      .select(
        col("block_id"),
        col(idCol),
        greatest(lit(0L), col("block_id") * L - col("_c0")).as("tok_start"),
        least(col("_n"), (col("block_id") + lit(1)) * L - col("_c0")).as("tok_end"))
  }
}
