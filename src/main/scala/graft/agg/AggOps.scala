package graft.agg

import graft.core.SeriesOps._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Duration-weighted aggregations — the heart of the reference library
  * (traces/timeseries.py:877-937 `distribution`, :868-875 `mean`;
  * traces/histogram.py for the result-side statistics).
  *
  * All operators take a *segment* DataFrame produced by
  * [[graft.core.SeriesOps.segmentsInRange]] (columns key, t0, t1, v, p0,
  * p1, vn) so the scan → window is shared, and reduce with plain
  * `groupBy(...).agg(sum(...))` — Catalyst splits these into partial+final
  * aggregation automatically (the distributed equivalent of
  * `Histogram.add`, traces/histogram.py:263-271).
  */
object AggOps {

  /** Duration-weighted histogram of values per key: rows
    * (key, v, weight) where weight = total time the series held value v.
    * With `normalized`, weights per key sum to 1 (traces/histogram.py:139-148).
    *
    * For LongType µs time, unnormalized weights are exact longs; the single
    * final divide keeps normalized values exact where the reference's are
    * (e.g. 1/3 fractions in tests/test_distribution.py:86-97).
    */
  def distribution(
      segs: DataFrame,
      normalized: Boolean,
      interpolate: String = "previous",
      default: Column = lit(null).cast("double")): DataFrame = {
    val h = segs
      .groupBy(col(K), segmentValue(interpolate, default).as(V))
      .agg(sum(col("t1") - col("t0")).as("weight"))
    if (normalized)
      h.withColumn(
        "weight",
        col("weight") / sum("weight").over(Window.partitionBy(K)))
    else h
  }

  /** Time-weighted mean per key = Σ v·dur / Σ dur over non-null-valued
    * segments (histogram mean discards None keys,
    * traces/histogram.py:104-117). Null when nothing non-null is covered.
    */
  def timeWeightedMean(
      segs: DataFrame,
      interpolate: String = "previous",
      default: Column = lit(null).cast("double")): DataFrame = {
    val value = segmentValue(interpolate, default)
    val dur = (col("t1") - col("t0")).cast("double")
    segs
      .groupBy(col(K))
      .agg(
        (sum(when(value.isNotNull, value * dur)) /
          sum(when(value.isNotNull, dur))).as("mean"))
  }

  /** Full weighted statistics of the value distribution per key, matching
    * Histogram.mean/variance/standard_deviation/min/max/total
    * (traces/histogram.py:100-170): None-valued weight is excluded from the
    * stats but zero-weight values are excluded from min/max.
    */
  def histogramStats(dist: DataFrame): DataFrame = {
    val w = col("weight").cast("double")
    val clean = dist.filter(col(V).isNotNull)
    val base = clean
      .groupBy(col(K))
      .agg(
        sum(w).as("total"),
        (sum(col(V) * w) / sum(w)).as("mean"),
        min(when(w > 0, col(V))).as("min"),
        max(when(w > 0, col(V))).as("max"))
    // two-pass population variance, matching the reference's operation
    // order (mean first, then weighted central moment / total)
    clean
      .join(base, Seq(K))
      .groupBy(col(K))
      .agg(
        first("total").as("total"),
        first("mean").as("mean"),
        first("min").as("min"),
        first("max").as("max"),
        (sum(w * pow(col(V) - col("mean"), 2)) / sum(w)).as("variance"))
      .withColumn("stddev", sqrt(col("variance")))
  }

  /** Gini–Simpson diversity of the duration-weighted value distribution
    * per key (Simpson 1949): with p_i the share of measured time spent
    * in state i, diversity = 1 − Σp_i² and effective_states = 1/Σp_i²
    * (the "how many states does this series really live in" number).
    * Input is a [[distribution]] frame (key, v, weight); null states
    * (unmeasured time) are excluded.
    *
    * Engine-exactness: per-state weights quantize to whole SECONDS as
    * LONGs after the exact-µs distribution sum (so Σw and Σw² are exact
    * longs — µs weights would overflow the square), and both ratios are
    * fixed double expressions rounded to 6. Keys with zero measured
    * seconds report nulls. Output (key, n_states, w_secs, simpson,
    * effective_states).
    *
    * Scale: one per-key aggregate over the already-tier-sized
    * distribution — constant state per key. */
  def simpsonDiversity(dist: DataFrame): DataFrame = {
    val agg = dist.filter(col(V).isNotNull)
      .select(col(K),
        expr("cast(weight as bigint) div 1000000").as("_ws"))
      .groupBy(col(K))
      .agg(count(lit(1)).as("n_states"), sum(col("_ws")).as("w_secs"),
        sum(col("_ws") * col("_ws")).as("_sq"))
    agg.select(col(K), col("n_states"), col("w_secs"),
      when(col("w_secs") > 0,
        round(lit(1.0) - col("_sq") /
          (col("w_secs").cast("double") * col("w_secs")), 6)).as("simpson"),
      when(col("_sq") > 0,
        round(col("w_secs").cast("double") * col("w_secs") / col("_sq"), 6))
        .as("effective_states"))
  }
}
