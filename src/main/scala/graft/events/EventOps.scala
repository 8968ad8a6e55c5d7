package graft.events

import graft.core.SeriesOps.{K, T, V}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EventSeries operators (reference traces/eventseries.py): a sorted
  * multiset of event times per key — rows (key, t), duplicates allowed.
  */
object EventOps {

  /** TimeSeries with, at each distinct event time, the total number of
    * events at-or-before it (reference `cumulative_sum`,
    * traces/eventseries.py:82-119). Output (key, t, v=count).
    */
  def cumulativeSum(df: DataFrame, bucketBy: Option[Column] = None): DataFrame = {
    val byT = df.groupBy(col(K), col(T)).agg(count(lit(1)).as("_n"))
    runningCount(byT, col("_n"), bucketBy)
  }

  /** Number of events in the CLOSED interval [start, end]
    * (traces/eventseries.py:121-145). */
  def eventsBetween(df: DataFrame, start: Column, end: Column): DataFrame =
    df.filter(col(T) >= start && col(T) <= end)
      .groupBy(col(K))
      .agg(count(lit(1)).as("n_events"))

  /** Consecutive inter-event gaps (traces/eventseries.py:147-174).
    * Output (key, t, gap) where gap = t - previous event time. */
  def interEventTimes(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(K).orderBy(T)
    df.select(col(K), col(T), (col(T) - lag(T, 1).over(w)).as("gap"))
      .filter(col("gap").isNotNull)
  }

  /** open.cumsum() - closed.cumsum(): concurrent-active count, may dip
    * negative (reference static `count_active`,
    * traces/eventseries.py:176-214; tests/test_eventseries.py:14-26).
    * Implemented as +1/-1 delta rows and one running sum. Output (key, t, v).
    */
  def countActive(open: DataFrame, closed: DataFrame,
      bucketBy: Option[Column] = None): DataFrame = {
    val deltas = open
      .select(col(K), col(T), lit(1L).as("d"))
      .unionByName(closed.select(col(K), col(T), lit(-1L).as("d")))
      .groupBy(col(K), col(T))
      .agg(sum("d").as("d"))
    runningCount(deltas, col("d"), bucketBy)
  }

  /** Per-key running sum of a delta column at distinct times; with
    * `bucketBy` (a function of t) the sum runs skew-safely per
    * (key, time-bucket) via [[graft.core.BucketedOps]] — a global (constant
    * key) event series no longer funnels through one task. */
  private def runningCount(byT: DataFrame, delta: Column, bucketBy: Option[Column]): DataFrame =
    bucketBy match {
      case Some(bk) =>
        graft.core.BucketedOps
          .running(byT, bk, Nil, sums = Seq("_run" -> delta))
          .select(col(K), col(T), col("_run").cast("double").as(V))
      case None =>
        val w = Window
          .partitionBy(K)
          .orderBy(T)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        byT.select(col(K), col(T), sum(delta).over(w).cast("double").as(V))
    }
}
