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

  /** Gap-based sessionization: per key, events ordered by time split into
    * sessions wherever the gap to the previous event exceeds `gap` (same
    * units as `t`). Event-analytics composition of the reference's
    * inter-event-time primitive (traces/eventseries.py:147-174): a session
    * boundary is exactly an `iter_interevent_times` entry > gap. Output one
    * row per (key, session): (key, session_idx 1-based, t_start, t_end,
    * n_events, v_sum).
    *
    * Rows at equal `t` always share a session (gap 0 ≤ gap), so session
    * membership depends only on times, never on `v`; internally every
    * window pass still orders by (t, v) so the passes agree on which
    * equal-t row carries the boundary flag (see the note below).
    *
    * Plain path: one per-key window (lag + running flag-sum) then a
    * (key, session) aggregation — two exchanges, map-side partial
    * aggregation collapses each session's contiguous rows before the
    * second. With `bucketBy` (a function of t) the window work runs
    * skew-safely per (key, time-bucket) with a tiny per-bucket handoff
    * (previous bucket's closing time decides whether a bucket's first row
    * opens a session; a prefix sum of per-bucket session-start counts
    * offsets the in-bucket numbering) — same shape as
    * [[graft.core.BucketedOps.running]], inlined because the boundary flag
    * needs the PREVIOUS row's time, not an at-or-before carry. One hot key
    * (a bot user, a constant key) no longer funnels through one task.
    */
  def sessionize(df: DataFrame, gap: Long,
      bucketBy: Option[Column] = None): DataFrame = {
    // (t, v) ordering, not t alone: the boundary flag and the running
    // flag-sum are evaluated in SEPARATE window passes (the bucketed path
    // even re-sorts after the offsets join), and Spark's sort is not
    // stable across exchanges — with a t-only order two equal-t rows
    // could permute between the passes and swap which row carries the
    // boundary flag. The v tie-break pins one total order in every pass;
    // session MEMBERSHIP still depends only on times (equal-t rows always
    // share a session either way).
    val sessioned = bucketBy match {
      case None =>
        val w = Window.partitionBy(K).orderBy(col(T).asc, col(V).asc)
        val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val prev = lag(col(T), 1).over(w)
        val flag = when(prev.isNull || col(T) - prev > gap, 1L).otherwise(0L)
        df.withColumn("_sess", sum(flag).over(wRun))
      case Some(bk) =>
        val d = df.withColumn("_bkt", bk)
        val wIn = Window.partitionBy(K, "_bkt").orderBy(col(T).asc, col(V).asc)
        val wInRun = wIn.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val prevIn = lag(col(T), 1).over(wIn)
        // null for each bucket's first row — resolved from the handoff below
        val flagIn = when(prevIn.isNull, lit(null).cast("long"))
          .otherwise(when(col(T) - prevIn > gap, 1L).otherwise(0L))
        val d2 = d.withColumn("_fin", flagIn)
        // handoff: one row per (key, bucket) — in-bucket session starts,
        // opening and closing times. groupBy on the window's own partition
        // keys reuses the (key, bucket) exchange; only summaries move.
        val tot = d2.groupBy(col(K), col("_bkt")).agg(
          sum(coalesce(col("_fin"), lit(0L))).as("_sin"),
          min(col(T)).as("_tmin"),
          max(col(T)).as("_tmax"))
        val wOff = Window.partitionBy(K).orderBy("_bkt")
        val prevMax = lag(col("_tmax"), 1).over(wOff)
        // does this bucket's FIRST row open a session?
        val first = when(prevMax.isNull || col("_tmin") - prevMax > gap, 1L)
          .otherwise(0L)
        val wOffRun = wOff.rowsBetween(Window.unboundedPreceding, -1)
        val offsets = tot
          .withColumn("_first", first)
          .withColumn("_off",
            coalesce(sum(col("_sin") + col("_first")).over(wOffRun), lit(0L)))
          .select(col(K).as("_hk"), col("_bkt").as("_hb"),
            col("_first"), col("_off"))
        // offsets side is one row per (key, bucket) — AQE broadcasts it, so
        // the row side keeps its single (key, bucket) exchange
        d2.join(offsets, d2(K) <=> offsets("_hk") && d2("_bkt") <=> offsets("_hb"))
          .drop("_hk", "_hb")
          .withColumn("_flag", coalesce(col("_fin"), col("_first")))
          .withColumn("_sess", col("_off") + sum(col("_flag")).over(wInRun))
    }
    sessioned
      .groupBy(col(K), col("_sess").as("session_idx"))
      .agg(
        min(col(T)).as("t_start"),
        max(col(T)).as("t_end"),
        count(lit(1)).as("n_events"),
        sum(col(V)).as("v_sum"))
  }

  /** Rolling z-score anomaly detection: for each event, the deviation of
    * `v` from the mean of the key's `lookback` IMMEDIATELY PRECEDING
    * events, in units of their sample stddev — the classic streaming
    * anomaly heuristic over irregular series (no resampling needed; the
    * frame is row-count-based, so it adapts to event density). Rows whose
    * key has fewer than `lookback` prior events emit null z (warm-up), as
    * does a zero-variance history. Output (key, t, v, z, anomaly).
    *
    * Deterministic under duplicate times: the order is (t, v), and two
    * fully identical rows produce the same output MULTISET whichever is
    * ranked first. The frame is row-bounded (`lookback` rows of state per
    * position), so per-task memory is O(lookback); the scale pressure
    * point is the per-key sort — the same property as any ordered scan,
    * and the reason the frame excludes the current row (a self-inclusive
    * z underestimates every excursion).
    */
  def rollingZscore(df: DataFrame, lookback: Int,
      threshold: Double = 3.0): DataFrame = {
    require(lookback >= 2, s"lookback $lookback must be >= 2 for a stddev")
    val w = Window.partitionBy(K).orderBy(col(T).asc, col(V).asc)
      .rowsBetween(-lookback, -1)
    val sd = stddev_samp(col(V)).over(w)
    val z = when(count(col(V)).over(w) === lookback && sd > 0,
      round((col(V) - avg(col(V)).over(w)) / sd, 6))
    df.select(col(K), col(T), col(V))
      .withColumn("z", z)
      .withColumn("anomaly",
        (col("z").isNotNull && abs(col("z")) > threshold).cast("int"))
  }

  /** PromQL-style counter rate: per key, for each adjacent point pair
    * the increase and its per-`perUs` rate, treating a value DROP as a
    * counter reset (the increase since a reset is the new value itself —
    * Prometheus `rate()`/`increase()` semantics over monotone counters
    * that restart at zero on process restart). Output one row at the
    * LATER point of each pair: (key, t, increase, rate); a key's first
    * point pairs with nothing; zero-duration pairs (equal t) are
    * dropped rather than dividing by zero. Deterministic under
    * duplicate times: order is (t, v). One per-key lag window — the
    * standard ordered-scan shape; rate arithmetic is
    * (increase · perUs) / Δt with exact long Δt, so engines agree
    * bit-for-bit before the 6-dp round. */
  def counterRate(df: DataFrame, perUs: Long = 1000000L): DataFrame = {
    val w = Window.partitionBy(K).orderBy(col(T).asc, col(V).asc)
    val pv = lag(col(V), 1).over(w)
    val inc = when(col(V) >= pv, col(V) - pv).otherwise(col(V))
    df.select(col(K), col(T), inc.as("_inc"), lag(col(T), 1).over(w).as("_pt"))
      .filter(col("_pt").isNotNull && col(T) > col("_pt"))
      .select(col(K), col(T), col("_inc").as("increase"),
        round(col("_inc") * perUs / (col(T) - col("_pt")), 6).as("rate"))
  }
}
