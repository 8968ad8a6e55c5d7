package graft.core

import graft.core.SeriesOps.{K, T}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-safe running-window primitive: cumulative sums / carry-forwards
  * over the per-key (t, ties...) order, computed per (key, time-bucket)
  * with a tiny per-bucket handoff table instead of one unbounded
  * `Window.partitionBy(key)` — so ONE hot key (or a constant merge key, as
  * in the reference's global `merge`/`count_active` results) no longer
  * collapses the whole running computation onto a single task (Spark's
  * "WindowExec: No Partition Defined — moving all data to a single
  * partition" trap). Same handoff pattern as
  * [[SeriesOps.segmentsInRangeBucketed]], applied to the merge / cumsum /
  * as-of-alignment family.
  *
  * Plan shape: one shuffle by (key, bucket) for the in-bucket windows; the
  * handoff side is one row per (key, bucket) — its own window over (key) is
  * proportional to #buckets, not #rows, so the sequential tail is O(span /
  * bucket) regardless of data volume.
  *
  * Correctness relies on `bucketOf` being a function of t alone (rows with
  * equal t always share a bucket — in-bucket `lead(t)` still detects "last
  * row per distinct t") and on `ties` being ascending, struct-orderable
  * columns.
  *
  * The shared intermediate is persisted (MEMORY_AND_DISK) because the
  * handoff aggregate and the row-side join form a diamond that exchange
  * reuse cannot deduplicate (per-branch column pruning makes the subtrees
  * non-identical) — measured 5x on the 32M-row skew bench. Long-lived
  * services issuing thousands of calls should clear
  * `spark.catalog.clearCache()` periodically; blocks are LRU-evicted
  * under memory pressure either way.
  */
object BucketedOps {

  /** The in-bucket ordered window, exposed for callers that need a
    * consistent `lead`/`lag` alongside [[running]]'s outputs. */
  def wInBucket(ties: Seq[Column]): org.apache.spark.sql.expressions.WindowSpec =
    Window.partitionBy(K, "_bkt").orderBy((col(T).asc +: ties.map(_.asc)): _*)

  /** Appends running aggregates over the per-key (t, ties...) order.
    *
    * For each `(name, delta)` in `sums`: a column `name` with the running
    * sum of `delta` inclusive of the current row (deltas must be non-null;
    * coalesce before calling). For each `(name, m)` in `carries` (`m`
    * struct-typed, null = "nothing to carry"): a column `name` with the
    * latest non-null `m` at-or-before the current row across the whole key.
    * The output keeps a `_bkt` column for follow-up in-bucket windows.
    */
  def running(
      df: DataFrame,
      bucketOf: Column,
      ties: Seq[Column],
      sums: Seq[(String, Column)],
      carries: Seq[(String, Column)] = Nil): DataFrame = {
    val names = (sums ++ carries).map(_._1)
    require(names.distinct == names, s"duplicate output names: $names")
    val base = df.withColumn("_bkt", bucketOf)
    val d2 = sums.foldLeft(base) { case (acc, (n, e)) => acc.withColumn(s"_d_$n", e) }
    // persist the shared input: the handoff aggregate and the row-side join
    // both consume it, and per-branch column pruning makes the two subtrees
    // non-identical so Spark's exchange reuse cannot deduplicate them — an
    // unpersisted diamond re-evaluates the (often window-bearing) lineage
    // twice. MEMORY_AND_DISK; LRU-evicted, never pinned.
    val d3 = carries.foldLeft(d2) { case (acc, (n, e)) => acc.withColumn(s"_m_$n", e) }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wIn = wInBucket(ties).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ordStruct = struct((col(T) +: ties): _*)
    // handoff table: per-bucket totals / closing values — one row per
    // (key, bucket); max_by ignores rows whose ordering expr is null, so the
    // closing value is the latest row where the carry struct is non-null
    val aggs =
      sums.map { case (n, _) => sum(col(s"_d_$n")).as(s"_t_$n") } ++
        carries.map { case (n, _) =>
          max_by(col(s"_m_$n"), when(col(s"_m_$n").isNotNull, ordStruct)).as(s"_t_$n")
        }
    val totals = d3.groupBy(col(K), col("_bkt")).agg(aggs.head, aggs.tail: _*)
    val wOff = Window.partitionBy(K).orderBy("_bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offCols =
      sums.map { case (n, _) => sum(col(s"_t_$n")).over(wOff).as(s"_o_$n") } ++
        carries.map { case (n, _) =>
          last(col(s"_t_$n"), ignoreNulls = true).over(wOff).as(s"_o_$n")
        }
    val offsets = totals.select((col(K).as("_hk") +: col("_bkt").as("_hb") +: offCols): _*)
    // null-SAFE join: the key can legitimately be null (countByValue's
    // None-value series) and seed rows ride the null time bucket — a plain
    // equi-join would silently drop both
    val joined = d3
      .join(offsets, d3(K) <=> offsets("_hk") && d3("_bkt") <=> offsets("_hb"))
      .drop("_hk", "_hb")
    val withSums = sums.foldLeft(joined) { case (acc, (n, _)) =>
      val zero = lit(0).cast(acc.schema(s"_d_$n").dataType)
      acc.withColumn(n,
        coalesce(col(s"_o_$n"), zero) + coalesce(sum(col(s"_d_$n")).over(wIn), zero))
    }
    val withCarries = carries.foldLeft(withSums) { case (acc, (n, _)) =>
      acc.withColumn(n,
        coalesce(last(col(s"_m_$n"), ignoreNulls = true).over(wIn), col(s"_o_$n")))
    }
    withCarries.drop(names.flatMap(n => Seq(s"_d_$n", s"_m_$n", s"_t_$n", s"_o_$n")): _*)
  }
}
