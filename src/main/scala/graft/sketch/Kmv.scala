package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K-Minimum-Values distinct-count sketch (Bar-Yossef et al. 2002): per
  * group, the k smallest DISTINCT 60-bit hashes of the counted value.
  * The sketch the retention tiers want for count-distinct: it is
  * LOSSLESSLY mergeable — the k smallest of a union of per-member
  * sketches are exactly the k smallest over the union's raw values, so
  * a daily sketch merged from 24 hourly sketches is bit-identical to
  * one built from the raw day (the continuous-aggregate property; the
  * oracle verifies exactly that). Estimate: (k−1)/h_k with h_k the kth
  * smallest hash as a fraction of 2⁶⁰; a sketch holding fewer than k
  * hashes has seen EVERY distinct value and reports the exact count.
  *
  * Unlike HLL the whole pipeline is engine-deterministic (md5 is
  * md5 everywhere), so sketches and estimates are exactly replayable
  * by the DuckDB oracle — no tolerance band needed.
  *
  * Scale: built dedup-first — the shuffle carries (group, hash) pairs,
  * then a per-group ordered TOP-K via row_number (k rows of state per
  * task), never an unbounded agg buffer; merge explodes k-element
  * arrays only. Groups are tier buckets, so cardinality is bounded by
  * the tier grid, not the data.
  */
object Kmv {

  /** 60-bit uniform hash on the md5 grid: first 15 hex chars → long.
    * Salted so independent sketches over the same column decorrelate. */
  def hash60(c: Column, salt: String = "kmv"): Column =
    conv(substring(md5(concat(lit(salt), c.cast("string"))), 1, 15), 16, 10)
      .cast("long")

  /** KMV sketch per group: sorted array of the min(k, n_distinct)
    * smallest distinct hashes of `valueCol`. Output (groupCols*, kmv). */
  def sketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int, salt: String = "kmv"): DataFrame = {
    require(k >= 2, s"k=$k must be >= 2 for the (k-1)/h_k estimator")
    topK(df.select(groupCols.map(col) :+
      hash60(col(valueCol), salt).as("_h"): _*), groupCols, k)
  }

  /** Lossless merge: re-group member sketches (rows carrying `kmv`
    * arrays) to a coarser key — e.g. (key, hour) → (key, day). The k
    * smallest of the union of k-smallest sets ARE the k smallest of the
    * union, so nothing is lost. */
  def merge(sketches: DataFrame, groupCols: Seq[String], k: Int): DataFrame =
    topK(sketches.select(groupCols.map(col) :+
      explode(col("kmv")).as("_h"): _*), groupCols, k)

  private def topK(hashed: DataFrame, groupCols: Seq[String], k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("_h"))
    hashed.distinct()
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(col("_h"))).as("kmv"))
  }

  /** Distinct-count estimate from a sketch column: exact size when the
    * sketch is unsaturated, else (k−1)·2⁶⁰/h_k rounded to the 1e-6
    * grid (2⁶⁰ is a power of two — exactly representable, so the
    * double arithmetic replays identically in the oracle). */
  def estimate(kmvCol: Column, k: Int): Column =
    when(size(kmvCol) < k, size(kmvCol).cast("double"))
      .otherwise(round(
        lit((k - 1).toDouble) * lit(1152921504606846976.0) /
          element_at(kmvCol, k).cast("double"), 6))

  /** Theta-sketch intersection (the set-operation KMV buys beyond plain
    * count-distinct): per group, estimate |A ∩ B| from two sketches
    * built over the SAME hash space (same salt). θ = the smaller
    * saturated threshold h_k (+∞ when a side is unsaturated, i.e. holds
    * its full distinct set); hashes below θ are a uniform 2⁶⁰·p sample
    * of the union, so |{h < θ seen in BOTH}| / p estimates the
    * intersection — and when both sides are unsaturated the common
    * count IS the exact answer. Both sketches must share `salt`.
    *
    * Scale: one group-keyed join of k-element arrays; the overlap
    * itself is a codegen'd `array_intersect` + `filter` per row (the
    * arrays are ≤ k elements), so no explode or extra shuffle exists in
    * the plan. Output (groupCols*, n_both, est_common). */
  /** Theta-sketch difference |A \ B| — the third set operation, closing
    * the union (merge) / intersection / difference algebra: with
    * θ = min(h_k^A, h_k^B), A's sample hashes below θ are a uniform
    * p = θ/2⁶⁰ sample of A, and because θ ≤ θ_B every B hash below θ is
    * IN B's sketch, so "not in B's sketch" is exact set-membership on
    * the sample; |{h < θ in A, ∉ B}| / p estimates |A \ B|, and when
    * both sides are unsaturated the count IS the exact answer. Both
    * sketches must share `salt`.
    *
    * Scale: identical shape to [[intersectEstimate]] — one group-keyed
    * join of k-element arrays, one codegen'd `array_except` + `filter`
    * per row, no explode. Output (groupCols*, n_only, est_only).
    *
    * A group present only in A still emits (LEFT join): a missing B
    * sketch is the empty set, so θ = θ_A and every sampled A hash
    * counts — |A \ ∅| = |A|, the strongest-signal case, which an inner
    * join would silently drop (round-4 ADVICE). A group present only
    * in B has |A \ B| = 0 and correctly emits nothing. */
  def differenceEstimate(a: DataFrame, b: DataFrame, groupCols: Seq[String],
      k: Int): DataFrame = {
    val inf = Long.MaxValue
    def theta(kmv: Column): Column =
      when(size(kmv) < k, lit(inf)).otherwise(element_at(kmv, k))
    val br = b.select(groupCols.map(n => col(n).as(s"_b_$n")) :+
      col("kmv").as("_bkmv"): _*)
    val joinCond = groupCols.map(n => col(n) <=> col(s"_b_$n")).reduce(_ && _)
    val paired = a.join(br, joinCond, "left")
      .withColumn("_bkmv",
        coalesce(col("_bkmv"), array().cast("array<bigint>")))
      .select(groupCols.map(col) :+
        least(theta(col("kmv")), theta(col("_bkmv"))).as("_theta") :+
        col("kmv") :+ col("_bkmv"): _*)
    val withN = paired.withColumn("_no",
      size(filter(array_except(col("kmv"), col("_bkmv")),
        h => h < col("_theta"))).cast("long"))
    withN.select(groupCols.map(col) :+
      col("_no").as("n_only") :+
      when(col("_theta") === inf, col("_no").cast("double"))
        .otherwise(round(
          col("_no") * lit(1152921504606846976.0) / col("_theta"), 6))
        .as("est_only"): _*)
  }

  def intersectEstimate(a: DataFrame, b: DataFrame, groupCols: Seq[String],
      k: Int): DataFrame = {
    val inf = Long.MaxValue
    def theta(kmv: Column): Column =
      when(size(kmv) < k, lit(inf)).otherwise(element_at(kmv, k))
    val br = b.select(groupCols.map(n => col(n).as(s"_b_$n")) :+
      col("kmv").as("_bkmv"): _*)
    val joinCond = groupCols.map(n => col(n) <=> col(s"_b_$n")).reduce(_ && _)
    val paired = a.join(br, joinCond)
      .select(groupCols.map(col) :+
        least(theta(col("kmv")), theta(col("_bkmv"))).as("_theta") :+
        col("kmv") :+ col("_bkmv"): _*)
    // common hashes below theta: arrays are tiny (<= k), so the
    // membership test runs as one codegen'd intersect per row — no
    // explode-join shuffle needed at all
    val withN = paired.withColumn("_nb",
      size(filter(array_intersect(col("kmv"), col("_bkmv")),
        h => h < col("_theta"))).cast("long"))
    withN.select(groupCols.map(col) :+
      col("_nb").as("n_both") :+
      when(col("_theta") === inf, col("_nb").cast("double"))
        .otherwise(round(
          col("_nb") * lit(1152921504606846976.0) / col("_theta"), 6))
        .as("est_common"): _*)
  }
}
