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
      bucketBy: Option[Column] = None): DataFrame =
    sessionAssign(df, gap, bucketBy)
      .groupBy(col(K), col("session_idx"))
      .agg(
        min(col(T)).as("t_start"),
        max(col(T)).as("t_end"),
        count(lit(1)).as("n_events"),
        sum(col(V)).as("v_sum"))

  /** The per-row face of [[sessionize]]: every input row (plus any extra
    * columns it carries) with its `session_idx` — for consumers that
    * need session MEMBERSHIP (co-occurrence, per-session sequences)
    * rather than the session aggregate. Same plan, same boundary
    * semantics, same skew-safe bucketed path. */
  def sessionAssign(df: DataFrame, gap: Long,
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
      .withColumn("session_idx", col("_sess"))
      .drop("_sess", "_bkt", "_fin", "_off", "_first", "_flag")
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

  /** Seasonal-baseline residuals: each event scored against the mean and
    * sample stddev of its key's OWN seasonal bin (hour-of-day by
    * default: bin = (t / binUs) mod (periodUs / binUs)) — the
    * periodicity-aware complement of [[rollingZscore]]: a nightly
    * traffic dip is normal at 3am and an anomaly at noon. Output
    * (key, t, v, season_bin, baseline, residual, anomaly).
    *
    * The baseline table is (keys × bins) rows — aggregated once and
    * broadcast back onto the events (never a window over the raw rows,
    * so a hot key costs one combiner per task, not a sort). Baseline and
    * stddev are rounded to the 1e-6 grid BEFORE the residual/threshold
    * arithmetic, so every comparison is on engine-exact values
    * (aggregation order cannot flip a flag). Bins with fewer than 2
    * points (or zero variance) emit null residual and anomaly=0. */
  def seasonalResidual(
      df: DataFrame,
      periodUs: Long = 86400000000L,
      binUs: Long = 3600000000L,
      nSigma: Double = 3.0,
      broadcastBaseline: Boolean = true): DataFrame = {
    require(periodUs > 0 && binUs > 0 && periodUs % binUs == 0,
      s"period $periodUs must be a positive multiple of bin $binUs")
    val nBins = periodUs / binUs
    val sbin = pmod(floor(col(T) / binUs), lit(nBins)).cast("int")
    val pts = df.filter(col(V).isNotNull).withColumn("season_bin", sbin)
    val base = pts
      .groupBy(col(K), col("season_bin"))
      .agg(
        round(avg(col(V)), 6).as("baseline"),
        round(stddev_samp(col(V)), 6).as("_sd"),
        count(lit(1)).as("_n"))
    val resid = round(col(V) - col("baseline"), 6)
    val b2 = base.select(col(K).as("_bk"), col("season_bin").as("_bb"),
      col("baseline"), col("_sd"), col("_n"))
    pts
      // null-safe <=>: a null merge key is legal in the series frames
      // (the repo-wide convention); a Seq() join would silently drop it.
      // broadcastBaseline=false shuffle-joins instead — the escape for a
      // key cardinality whose (keys × bins) table exceeds broadcast
      // limits (the tfIdfTopK/ivfTopK flag contract)
      .join(if (broadcastBaseline) broadcast(b2) else b2,
        pts(K) <=> b2("_bk") && pts("season_bin") <=> b2("_bb"))
      .drop("_bk", "_bb")
      .withColumn("residual",
        when(col("_n") >= 2 && col("_sd") > 0, resid))
      .withColumn("anomaly",
        (col("residual").isNotNull &&
          abs(col("residual")) > col("_sd") * nSigma).cast("int"))
      .select(col(K), col(T), col(V), col("season_bin"),
        col("baseline"), col("residual"), col("anomaly"))
  }

  /** Population Stability Index between the value distributions before
    * and after `splitT` — the standard drift monitor between a
    * reference window and a live window (PSI > 0.2 is the classic
    * "investigate" threshold). Values bin into `nBins` equal-width
    * buckets over [lo, hi] (outliers clamp to the edge bins); each
    * side's proportions are add-½ smoothed so one-sided bins stay
    * finite; bins empty on BOTH sides contribute nothing (they never
    * materialize a row — the documented contract, replayed identically
    * by the oracle). Output (key, n_a, n_b, psi).
    *
    * Per-bin terms are quantized to the 1e-6 integer grid and summed as
    * longs, so the per-key total is aggregation-order independent (the
    * q77/q80 discipline). Two aggregates over one (key, bin) exchange
    * plus a per-key join of bin counts against key totals — no windows,
    * no driver state; scales as groupBy does. */
  def psiDrift(
      df: DataFrame,
      splitT: Long,
      lo: Double,
      hi: Double,
      nBins: Int = 10): DataFrame = {
    require(nBins > 0 && hi > lo, s"need hi > lo and nBins > 0")
    val bin = least(lit(nBins - 1), greatest(lit(0),
      floor((col(V) - lo) / (hi - lo) * nBins))).cast("int")
    val counts = df.filter(col(V).isNotNull)
      .groupBy(col(K), bin.as("_bin"))
      .agg(
        sum(when(col(T) < splitT, 1L).otherwise(0L)).as("_ca"),
        sum(when(col(T) >= splitT, 1L).otherwise(0L)).as("_cb"))
    val totals = counts.groupBy(col(K))
      .agg(sum(col("_ca")).as("n_a"), sum(col("_cb")).as("n_b"))
    val pa = (col("_ca") + 0.5) / (col("n_a") + 0.5 * nBins)
    val pb = (col("_cb") + 0.5) / (col("n_b") + 0.5 * nBins)
    val t2 = totals.select(col(K).as("_tk"), col("n_a"), col("n_b"))
    counts
      .join(t2, counts(K) <=> t2("_tk")) // null-safe, like the merge family
      .drop("_tk")
      .withColumn("_term",
        round((pa - pb) * log(pa / pb) * 1e6).cast("long"))
      .groupBy(col(K))
      .agg(
        first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"),
        (sum(col("_term")) / 1e6).as("psi"))
  }

  /** Weekly cohort retention: keys cohorted by their FIRST active week
    * (week = floor((t − origin)/weekUs)), then for every (cohort, offset
    * k) the number of cohort members active in week cohort+k and the
    * retained fraction — the standard growth-analytics triangle. Output
    * (cohort_wk, k, n_users, retention).
    *
    * Plan: distinct (key, week) first — everything after touches at most
    * |keys|·|weeks| rows, never raw events; the cohort table reuses the
    * same aggregate; cohort sizes are a per-cohort aggregate joined back
    * broadcast (cohort count is span/week — tiny). Each key contributes
    * once per week by construction, so the per-(cohort, k) count needs
    * no count-distinct shuffle. */
  def cohortRetention(df: DataFrame, originUs: Long,
      weekUs: Long = 7L * 86400000000L): DataFrame = {
    require(weekUs > 0, s"week width $weekUs must be positive")
    val weeks = df
      .select(col(K), floor((col(T) - originUs) / weekUs).cast("long").as("_wk"))
      .distinct()
    val cohort = weeks.groupBy(col(K)).agg(min(col("_wk")).as("cohort_wk"))
      .select(col(K).as("_ck"), col("cohort_wk"))
    val active = weeks
      .join(cohort, weeks(K) <=> cohort("_ck")) // null-safe key, convention
      .groupBy(col("cohort_wk"), (col("_wk") - col("cohort_wk")).as("k"))
      .agg(count(lit(1)).as("n_users"))
    val sizes = cohort.groupBy(col("cohort_wk")).agg(count(lit(1)).as("_size"))
    active
      .join(broadcast(sizes), Seq("cohort_wk"))
      .select(col("cohort_wk"), col("k"), col("n_users"),
        round(col("n_users").cast("double") / col("_size"), 6).as("retention"))
  }

  /** Ordered funnel: for each key, the time it FIRST completed each step
    * of `steps` in order — step i+1 counts only STRICTLY AFTER step i's
    * completion time (the classic product-analytics funnel; an earlier
    * purchase does not satisfy a signup→purchase funnel). Input
    * (key, t, step); output (key, t_1..t_n nullable, steps_reached).
    *
    * One conditional-min aggregate per step, each joined back on the key
    * (n−1 key-partitioned joins of per-key 1-row frames — the exchanges
    * reuse the same hash(key) partitioning; nothing is driver-side and
    * no window touches raw events). Funnels are 3-6 steps in practice,
    * so the chain depth is a small constant. */
  def funnel(df: DataFrame, steps: Seq[String],
      stepCol: String = "step"): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val keys = df.select(col(K)).distinct()
    // events whose step is in no funnel stage can never match any
    // conditional min — drop them BEFORE the n join+aggregate passes
    // (keys still come from the unfiltered frame: a key with zero
    // funnel events must still report steps_reached = 0)
    val ev = df.filter(col(stepCol).isin(steps: _*))
    val result = steps.zipWithIndex.foldLeft(keys) { case (acc, (s, i)) =>
      val prev = if (i == 0) lit(Long.MinValue) else col(s"t_$i")
      val cond = col(stepCol) === s &&
        (if (i == 0) lit(true) else col(s"t_$i").isNotNull && col(T) > prev)
      val stepT = ev
        .join(acc.select((col(K).as("_fk") +:
          (1 to i).map(j => col(s"t_$j"))): _*),
          ev(K) <=> col("_fk"))
        .groupBy(col("_fk").as(K))
        .agg(min(when(cond, col(T))).as(s"t_${i + 1}"))
        .select(col(K).as("_sk"), col(s"t_${i + 1}"))
      acc.join(stepT, acc(K) <=> stepT("_sk"), "left").drop("_sk")
    }
    val reached = (1 to steps.size).map(i =>
      when(col(s"t_$i").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    result.withColumn("steps_reached", reached)
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

  /** Two-sided CUSUM control chart (Page's test) per key: the standard
    * sequential changepoint score s⁺ᵢ = max(0, s⁺ᵢ₋₁ + (vᵢ − μ − slack))
    * for upward level shifts, s⁻ symmetric for downward. The recurrence
    * LOOKS inherently sequential, but has the classic closed form
    * s⁺ᵢ = Sᵢ − min(0, min_{j≤i} Sⱼ) over the cumulative sum S of the
    * drift-corrected deltas — i.e. cumsum minus running-min-of-cumsum:
    * two stacked window passes over ONE per-key sort, no per-row
    * iteration, no UDF (the same declarative-scan discipline as the
    * q108 EWMA affine form). μ and the slack/threshold scale come from
    * one per-key aggregate joined back (broadcast by default, shuffle
    * escape via `broadcastStats = false` — the seasonalResidual flag
    * contract); slack = slackSd·σ (the textbook k = δ/2 tuning) and the
    * alarm threshold h = nSd·σ.
    *
    * Engine-exactness: μ, σ and slack are rounded to the 1e-6 grid
    * BEFORE the deltas, and each delta is quantized to a 1e-6-grid LONG
    * (the psiDrift discipline), so the running sums are integer-exact
    * and aggregation/summation order cannot perturb a score or flag.
    * Keys with <2 points or zero variance emit null scores, flag 0.
    * Output (key, t, v, cusum_pos, cusum_neg, changepoint).
    *
    * Scale: one bounded aggregate + one per-key ordered scan — the same
    * shape as rollingZscore; the scan is inherently whole-history per
    * key (CUSUM's definition), so at 100 TB it runs per retention
    * window, exactly where the tier pipeline scopes it. */
  def cusum(df: DataFrame, slackSd: Double = 0.5, nSd: Double = 4.0,
      broadcastStats: Boolean = true): DataFrame = {
    val pts = df.filter(col(V).isNotNull)
    val stats = pts.groupBy(col(K)).agg(
      round(avg(col(V)), 6).as("_mu"),
      round(stddev_samp(col(V)), 6).as("_sd"),
      count(lit(1)).as("_n"))
    val st2 = stats.select(col(K).as("_sk"), col("_mu"), col("_sd"), col("_n"))
    val slack = round(col("_sd") * slackSd, 6)
    val joined = pts
      .join(if (broadcastStats) broadcast(st2) else st2, pts(K) <=> st2("_sk"))
      .drop("_sk")
      .withColumn("_dp",
        round((col(V) - col("_mu") - slack) * 1e6, 0).cast("long"))
      .withColumn("_dn",
        round((col("_mu") - slack - col(V)) * 1e6, 0).cast("long"))
    val w = Window.partitionBy(K).orderBy(col(T).asc, col(V).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withS = joined
      .withColumn("_sp", sum(col("_dp")).over(w))
      .withColumn("_sn", sum(col("_dn")).over(w))
    val withR = withS // second pass reuses the same per-key sort
      .withColumn("_rp", col("_sp") - least(min(col("_sp")).over(w), lit(0L)))
      .withColumn("_rn", col("_sn") - least(min(col("_sn")).over(w), lit(0L)))
    val ok = col("_n") >= 2 && col("_sd") > 0
    val h = round(col("_sd") * nSd, 6)
    withR
      .withColumn("cusum_pos", when(ok, round(col("_rp") / 1e6, 6)))
      .withColumn("cusum_neg", when(ok, round(col("_rn") / 1e6, 6)))
      .withColumn("changepoint",
        coalesce(when(ok, col("_rp") / 1e6 > h || col("_rn") / 1e6 > h),
          lit(false)).cast("int"))
      .select(col(K), col(T), col(V), col("cusum_pos"), col("cusum_neg"),
        col("changepoint"))
  }

  /** Heartbeat downtime attribution — the SLA-report tier. A source that
    * emits a heartbeat at least every `heartbeatUs` is "up"; any
    * inter-event gap longer than that opens a down interval
    * [prev + heartbeatUs, t) (the monitor notices the loss one heartbeat
    * after the last beat, classic dead-man's-switch semantics). Down
    * intervals are then SPLIT across calendar days so each (key, day)
    * owns exactly its share — a 3-day outage charges 86400 s to each of
    * three days, not 259200 s to the day it ended. Output (key, day,
    * down_us, down_frac), days with zero downtime absent.
    *
    * Scale: the gap scan is the interEventTimes lag (one per-key sort;
    * `bucketBy` runs it per (key, time-bucket) with a tiny per-bucket
    * closing-time handoff, so a hot key never funnels through one task);
    * the day split is a chunk-bounded explode over day INDICES — a
    * year-long outage explodes to 365 rows, never to raw micros. */
  def downtime(df: DataFrame, heartbeatUs: Long,
      dayUs: Long = 86400000000L,
      bucketBy: Option[Column] = None): DataFrame = {
    require(heartbeatUs > 0, s"heartbeatUs $heartbeatUs must be positive")
    require(dayUs > 0, s"dayUs $dayUs must be positive")
    val prev = bucketBy match {
      case None =>
        val w = Window.partitionBy(K).orderBy(T)
        df.select(col(K), col(T)).withColumn("_prev", lag(T, 1).over(w))
      case Some(bk) =>
        // per-(key, bucket) lag + a tiny per-bucket closing-time handoff:
        // the first row of a bucket takes its predecessor from the running
        // max of earlier buckets' closing times (closings are per-bucket
        // maxima, so their running max IS the latest earlier event)
        val base = df.select(col(K), col(T)).withColumn("_bkt", bk)
        val wIn = Window.partitionBy(col(K), col("_bkt")).orderBy(T)
        val inb = base.withColumn("_inprev", lag(T, 1).over(wIn))
        val closings = base.groupBy(col(K), col("_bkt"))
          .agg(max(col(T)).as("_close"))
        val wOff = Window.partitionBy(K).orderBy("_bkt")
          .rowsBetween(Window.unboundedPreceding, -1)
        val carry = closings
          .withColumn("_carry", max(col("_close")).over(wOff))
          .select(col(K).as("_ck"), col("_bkt").as("_cb"), col("_carry"))
        inb.join(carry, inb(K) <=> carry("_ck") && inb("_bkt") === carry("_cb"))
          .withColumn("_prev", coalesce(col("_inprev"), col("_carry")))
          .select(col(K), col(T), col("_prev"))
    }
    val gaps = prev
      .filter(col(T) - col("_prev") > heartbeatUs)
      .select(col(K), (col("_prev") + heartbeatUs).as("_d0"), col(T).as("_d1"))
    graft.core.SeriesOps.explodeRangeChunked(
      gaps, floor(col("_d0") / dayUs), floor((col("_d1") - 1) / dayUs), "day")
      .select(col(K), col("day"),
        (least(col("_d1"), (col("day") + 1) * dayUs) -
          greatest(col("_d0"), col("day") * dayUs)).as("_over"))
      .groupBy(col(K), col("day"))
      .agg(sum("_over").as("down_us"))
      .withColumn("down_frac", round(col("down_us") / dayUs, 6))
  }

  /** Top-k largest inter-event gaps per key — the "where are my holes"
    * report a retention pipeline runs before backfilling a tier. Output
    * (key, gap_rank, t_prev, t, gap) with gap = t − previous event time,
    * ranked by (gap desc, t asc) so ties are deterministic; exact long
    * arithmetic throughout. Two per-key ordered scans (the
    * [[interEventTimes]] shape plus a top-k), both over the same
    * hash(key) exchange and sort. */
  def topGaps(df: DataFrame, k: Int = 3): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = Window.partitionBy(K).orderBy(col(T).asc)
    val wr = Window.partitionBy(K).orderBy(col("gap").desc, col(T).asc)
    df.select(col(K), col(T), lag(col(T), 1).over(w).as("t_prev"))
      .filter(col("t_prev").isNotNull)
      .withColumn("gap", col(T) - col("t_prev"))
      .withColumn("gap_rank", row_number().over(wr))
      .filter(col("gap_rank") <= k)
      .select(col(K), col("gap_rank"), col("t_prev"), col(T), col("gap"))
  }

  /** Rate-burst detector per (key, hour bin): the bin's event count
    * against its own trailing `baseHours`-hour total — a bin "bursts"
    * when its rate exceeds `factor`× the trailing per-hour average (the
    * battery's rate-spike complement to [[levelShift]]'s value steps;
    * the trailing-window rate test is the standard burst heuristic —
    * Kleinberg KDD'02 frames the full state-machine version). Empty
    * hours contribute zero baseline by simply being absent: the trailing
    * frame is a RANGE window over the hour index, so gaps need no
    * densification. Bins whose key has less than `baseHours` of history
    * (hour < first hour + baseHours) or an empty baseline emit null
    * ratio, burst 0. Output (key, hour, n, base, ratio, burst).
    *
    * Engine-exactness: counts are integers, the flag compares
    * n·baseHours > factor·base in EXACT longs (factor must be a whole
    * number for that reason), and ratio is one double division.
    *
    * Scale: one (key, hour) count aggregate — the rollup-tier shape —
    * then two frames over one per-key sort of the BINNED table (rows =
    * span/hour per key, never raw volume). */
  def burstRate(df: DataFrame, baseHours: Int = 24, factor: Long = 3,
      binUs: Long = 3600000000L): DataFrame = {
    require(baseHours >= 1, s"baseHours $baseHours must be >= 1")
    require(factor >= 1, s"factor $factor must be >= 1")
    val bins = df
      .groupBy(col(K), floor(col(T) / binUs).cast("long").as("hour"))
      .agg(count(lit(1)).as("n"))
    val ord = Window.partitionBy(K).orderBy(col("hour"))
    val trail = ord.rangeBetween(-baseHours, -1)
    val whole = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val warm = col("hour") >= min(col("hour")).over(whole) + baseHours
    val base = coalesce(sum(col("n")).over(trail), lit(0L))
    val ok = warm && base > 0
    bins
      .withColumn("base", base)
      .withColumn("ratio",
        when(ok, round(col("n") * lit(baseHours.toLong) / col("base").cast("double"), 6)))
      .withColumn("burst",
        coalesce(when(ok, col("n") * baseHours > col("base") * factor),
          lit(false)).cast("int"))
  }

  /** Exact ordinary-least-squares trend per (key, bucket): slope,
    * intercept and r² of value-vs-time within each bucket — the
    * parametric companion to [[graft.events.Correlation.theilSen]]
    * (median slope resists outliers; OLS adds the goodness-of-fit the
    * robust fit can't give). x is SECONDS since the bucket start
    * (longs), y the 1e-3-quantized value (longs), so all six sufficient
    * statistics are integer-exact and the closed forms are fixed double
    * expressions on identical operands in any engine — the
    * [[Correlation.autocorr]] discipline. Buckets with < `minN` points
    * or zero x- or y-variance emit null fit columns. Output (key,
    * bucket, n, slope_per_hr, intercept, r2); slope is per HOUR so the
    * 6-dp rounding keeps signal.
    *
    * Scale: one (key, bucket) aggregate with map-side partials —
    * constant state per group, no window, the cheapest tier shape. */
  def olsTrend(df: DataFrame, bucketUs: Long = 7L * 86400000000L,
      minN: Int = 3): DataFrame = {
    require(bucketUs > 0, s"bucket width $bucketUs must be positive")
    val pts = df.filter(col(V).isNotNull)
      .withColumn("bucket", floor(col(T) / bucketUs).cast("long"))
      .withColumn("_x", ((col(T) - col("bucket") * bucketUs) / 1000000L)
        .cast("long"))
      .withColumn("_y", floor(col(V) * 1000 + 0.5).cast("long"))
    val s = pts.groupBy(col(K), col("bucket")).agg(
      count(lit(1)).as("n"),
      sum(col("_x")).as("_sx"), sum(col("_y")).as("_sy"),
      sum(col("_x") * col("_x")).as("_sxx"),
      sum(col("_y") * col("_y")).as("_syy"),
      sum(col("_x") * col("_y")).as("_sxy"))
    // all in exact longs; the d* products are exact doubles (< 2^53 for
    // tier-bounded buckets) evaluated in a fixed order
    val dxx = col("n").cast("double") * col("_sxx") -
      col("_sx").cast("double") * col("_sx")
    val dyy = col("n").cast("double") * col("_syy") -
      col("_sy").cast("double") * col("_sy")
    val dxy = col("n").cast("double") * col("_sxy") -
      col("_sx").cast("double") * col("_sy")
    val ok = col("n") >= minN && dxx > 0 && dyy > 0
    val slopeMilliPerSec = dxy / dxx
    s.select(
      col(K), col("bucket"), col("n"),
      when(ok, round(slopeMilliPerSec * 3600 / 1000.0, 6)).as("slope_per_hr"),
      when(ok, round((col("_sy") / 1000.0 - slopeMilliPerSec / 1000.0 *
        col("_sx")) / col("n"), 6)).as("intercept"),
      when(ok, round(dxy * dxy / (dxx * dyy), 6)).as("r2"))
  }

  /** Debounce: per key, keep a timestamp only when at least `cooldownUs`
    * has passed since the last KEPT one — the rate-limiting dedupe an
    * ingest edge applies to chattering sensors (distinct from
    * session-first collapse: a long burst still emits one point per
    * cooldown, not one per burst). Operates on the DISTINCT (key, t)
    * set; the kept set is the unique greedy chain from each key's first
    * event. Output (key, t) kept timestamps.
    *
    * The chain is inherently sequential per key (kept(i+1) is the first
    * t ≥ kept(i) + cooldown — a non-associative recursion, unlike the
    * affine scans), so it runs as one sorted-array fold per key,
    * expression-only (array_sort + the `aggregate` higher-order
    * function — no UDF, key type preserved). Per-task memory is the
    * key's distinct-timestamp count — bounded per retention window at
    * scale, the same per-key contract as [[cusum]]; across keys it is
    * embarrassingly parallel. */
  def debounce(df: DataFrame, cooldownUs: Long): DataFrame = {
    require(cooldownUs > 0, s"cooldown $cooldownUs must be positive")
    // Long.MinValue/2 seed: a plain MinValue + cooldown would overflow
    val seed = Long.MinValue / 2
    val kept = aggregate(
      col("_ts"),
      struct(lit(seed).as("last"),
        array().cast("array<long>").as("ks")),
      (acc, t) => when(t >= acc.getField("last") + cooldownUs,
        struct(t.as("last"),
          concat(acc.getField("ks"), array(t)).as("ks")))
        .otherwise(acc),
      acc => acc.getField("ks"))
    df.select(col(K), col(T)).distinct()
      .groupBy(col(K))
      .agg(array_sort(collect_list(col(T))).as("_ts"))
      .select(col(K), explode(kept).as(T))
  }

  /** Deadband compression: per key, keep a point only when its value has
    * moved at least `delta` away from the LAST KEPT value — the classic
    * historian dead-band filter (the fixed-threshold core of
    * swinging-door trending, public), [[debounce]]'s complement in the
    * VALUE domain: debounce rate-limits time, deadband rate-limits
    * change, and together they are the lossy-ingest pair every
    * timeseries historian runs at the edge. The first point per key is
    * always kept; input collapses to one value per (key, t) first (max,
    * deterministic). Output (key, t, v) kept points.
    *
    * Values compare on the 1e-3 long grid (floor(v·1000+½) — the
    * theilSen discipline) so the ≥-delta test is integer-exact; the
    * kept rows carry the ORIGINAL double v.
    *
    * Like debounce, the kept chain is a non-associative recursion
    * (kept(i+1) depends on kept(i)'s VALUE), so it runs as one sorted
    * array fold per key — expression-only, per-task memory = the key's
    * point count within the retention window, across keys
    * embarrassingly parallel. */
  def deadband(df: DataFrame, delta: Double): DataFrame = {
    require(delta > 0, s"delta $delta must be positive")
    val deltaMilli = math.rint(delta * 1000).toLong
    val pts = df.filter(col(V).isNotNull)
      .groupBy(col(K), col(T))
      .agg(max(col(V)).as(V))
      .withColumn("_x", floor(col(V) * 1000 + 0.5).cast("long"))
    // sentinel: no real quantized value can be within delta of MinValue/2
    val seed = Long.MinValue / 2
    val kept = aggregate(
      col("_ps"),
      struct(lit(seed).as("last"),
        array().cast("array<struct<t:long,v:double>>").as("ks")),
      (acc, p) => when(
        abs(p.getField("_x") - acc.getField("last")) >= deltaMilli,
        struct(p.getField("_x").as("last"),
          concat(acc.getField("ks"),
            array(struct(p.getField(T).as("t"), p.getField(V).as("v"))))
            .as("ks")))
        .otherwise(acc),
      acc => acc.getField("ks"))
    pts
      .groupBy(col(K))
      .agg(array_sort(collect_list(struct(col(T), col(V), col("_x"))))
        .as("_ps"))
      .select(col(K), explode(kept).as("_kp"))
      .select(col(K), col("_kp.t").as(T), col("_kp.v").as(V))
  }

  /** Count-trimmed mean per (key, bucket): drop the `trim` lowest and
    * `trim` highest values (by (v, t) order — deterministic under ties),
    * then average the rest — the robust location estimate whose
    * breakdown is tunable where [[madAnomaly]]'s median is fixed at 50%,
    * and the COUNT-based form deliberately: a percentile-based winsorize
    * puts the clamp boundary on an interpolated double whose last bit
    * differs across engines, while rank trimming is integer-exact end to
    * end. Buckets with n ≤ 2·trim emit null mean. Output (key, bucket,
    * n, n_used, trimmed_mean).
    *
    * Scale: one row_number window over a per-(key, bucket) sort plus one
    * aggregate — tier-bounded buckets keep the sort short; values sum as
    * exact 1e-3 longs with ONE final division. */
  def trimmedMean(df: DataFrame, bucketUs: Long, trim: Int = 1): DataFrame = {
    require(bucketUs > 0, s"bucket width $bucketUs must be positive")
    require(trim >= 1, s"trim $trim must be >= 1")
    val pts = df.filter(col(V).isNotNull)
      .withColumn("bucket", floor(col(T) / bucketUs).cast("long"))
      .withColumn("_x", floor(col(V) * 1000 + 0.5).cast("long"))
    val w = Window.partitionBy(col(K), col("bucket"))
      .orderBy(col("_x").asc, col(T).asc)
    val n = count(lit(1)).over(Window.partitionBy(col(K), col("bucket")))
    pts
      .withColumn("_rk", row_number().over(w))
      .withColumn("_n", n)
      .withColumn("_in",
        col("_rk") > trim && col("_rk") <= col("_n") - trim)
      .groupBy(col(K), col("bucket"))
      .agg(max(col("_n")).as("n"),
        sum(when(col("_in"), lit(1L)).otherwise(0L)).as("n_used"),
        sum(when(col("_in"), col("_x")).otherwise(0L)).as("_sx"))
      .select(col(K), col("bucket"), col("n"), col("n_used"),
        when(col("n_used") > 0,
          round(col("_sx") / (col("n_used") * 1000.0), 6))
          .as("trimmed_mean"))
  }

  /** Area-under-curve tier per (key, day): the integral of the series
    * over each day's own points, under BOTH interpolation readings —
    * `auc_prev` = Σ dur·v₀ (left-Riemann, the previous-interpolation
    * integral, what a counter's value-seconds mean) and `auc_linear` =
    * Σ dur·(v₀+v₁)/2 (trapezoid, numpy.trapz convention). Consecutive
    * points pair WITHIN a day only — no extrapolation across day edges
    * (the edge-conservative reading; the gap-filled alternative is the
    * rollup tier cascade). Days with a single point emit n but null
    * AUCs. Output (key, day, n, auc_prev, auc_linear) in value·seconds.
    *
    * Engine-exactness: v quantizes to 1e-3 longs; each term
    * dur_µs·(x₀[+x₁]) is an exact long and the SUM accumulates in
    * DECIMAL(38,0) (µs·milli overflows int64 over a long day —
    * decimal is the documented escape, exact in Spark and DuckDB's
    * hugeint alike); the one double division at the end converts to
    * value·seconds.
    *
    * Scale: one lead window over a per-(key, day) sort + one aggregate
    * — the [[completeness]] shape exactly. */
  def auc(df: DataFrame, dayUs: Long = 86400000000L): DataFrame = {
    require(dayUs > 0, s"day width $dayUs must be positive")
    val pts = df.filter(col(V).isNotNull)
      .withColumn("day", floor(col(T) / dayUs).cast("long"))
      .withColumn("_x", floor(col(V) * 1000 + 0.5).cast("long"))
    // (t, x) order: duplicate-t points contribute zero-width terms, but
    // WHICH one pairs with the next distinct t must be deterministic
    val w = Window.partitionBy(col(K), col("day"))
      .orderBy(col(T).asc, col("_x").asc)
    val dur = lead(col(T), 1).over(w) - col(T)
    val x1 = lead(col("_x"), 1).over(w)
    pts
      .withColumn("_dur", dur)
      .withColumn("_x1", x1)
      .groupBy(col(K), col("day"))
      .agg(count(lit(1)).as("n"),
        // decimal BEFORE the multiply: dur·x itself can clear int64 for
        // extreme value magnitudes, not just the sum
        sum(col("_dur").cast("decimal(38,0)") * col("_x")).as("_sp"),
        sum(col("_dur").cast("decimal(38,0)") * (col("_x") + col("_x1")))
          .as("_sl"))
      .select(col(K), col("day"), col("n"),
        // floor-snap (see madAnomaly): integer sums over 1e9 land on
        // exact 5e-7 ties where round()'s half-up is not portable
        when(col("n") > 1,
          floor(col("_sp").cast("double") / 1.0e9 * 1e6 + 0.5) / 1e6)
          .as("auc_prev"),
        when(col("n") > 1,
          floor(col("_sl").cast("double") / 2.0e9 * 1e6 + 0.5) / 1e6)
          .as("auc_linear"))
  }

  /** Western Electric control-chart rules per (key, bucket) — the
    * classic SPC battery (public, WE Statistical Quality Control
    * Handbook 1956): each point scored against ITS bucket's center line
    * (mean) and sigma with three escalating pattern rules: `r1` =
    * beyond 3σ; `r2` = at least 2 of the trailing 3 points beyond 2σ on
    * the SAME side (this point among them); `r4` = 9 consecutive points
    * on one side of center, this point the 9th. The drift complement of
    * [[cusum]] with per-pattern attribution. Buckets with < `minN`
    * points emit null/0 flags. Output (key, bucket, t, v, side, r1,
    * r2, r4); side ∈ {-1, 0, 1} vs center.
    *
    * Engine-exactness: `side` compares n·x vs Σx in EXACT longs; the σ
    * comparisons are fixed double expressions on the integer sufficient
    * statistics (the [[olsTrend]] discipline — exact cross-products
    * overflow int64 at tier-scale n, so the flags use identically-
    * ordered double arithmetic instead, deterministic in any engine).
    * The pattern rules count per-SIDE hits over ROW frames (two
    * counters, pick by the current row's side — window aggregates
    * cannot reference the current row, counting both sides can).
    *
    * Scale: one (key, bucket) stats aggregate broadcast back, then
    * three row-bounded frames over ONE per-(key, bucket) sort — the
    * [[levelShift]] shape. */
  def spcRules(df: DataFrame, bucketUs: Long, minN: Int = 8,
      broadcastStats: Boolean = true): DataFrame = {
    require(bucketUs > 0, s"bucket width $bucketUs must be positive")
    val pts = df.filter(col(V).isNotNull)
      .withColumn("bucket", floor(col(T) / bucketUs).cast("long"))
      .withColumn("_x", floor(col(V) * 1000 + 0.5).cast("long"))
    val st = pts.groupBy(col(K).as("_sk"), col("bucket").as("_sb"))
      .agg(count(lit(1)).as("_n"), sum(col("_x")).as("_sx"),
        sum(col("_x") * col("_x")).as("_sxx"))
    val joined = pts.join(
      if (broadcastStats) broadcast(st) else st,
      col(K) <=> col("_sk") && col("bucket") === col("_sb"))
      .drop("_sk", "_sb")
    // side: sign(n·x − Σx) — exact longs (n·x ≤ 2^63 for milli values)
    val side = signum(col("_n") * col("_x") - col("_sx")).cast("int")
    // fixed-order double stats: mean, then population sigma
    val mean = col("_sx").cast("double") / col("_n")
    val variance = (col("_sxx").cast("double") -
      col("_sx").cast("double") * col("_sx") / col("_n")) / col("_n")
    val dev = col("_x") - mean
    val sigma = sqrt(variance)
    val w = Window.partitionBy(col(K), col("bucket"))
      .orderBy(col(T).asc, col("_x").asc)
    val w3 = w.rowsBetween(-2, Window.currentRow)
    val w9 = w.rowsBetween(-8, Window.currentRow)
    val scored = joined
      .withColumn("_side", side)
      .withColumn("_b2p",
        (col("_side") === 1 && abs(dev) > sigma * 2).cast("int"))
      .withColumn("_b2n",
        (col("_side") === -1 && abs(dev) > sigma * 2).cast("int"))
      .withColumn("_r1", (abs(dev) > sigma * 3).cast("int"))
    val ok = col("_n") >= minN
    scored
      .withColumn("_c2p", sum(col("_b2p")).over(w3))
      .withColumn("_c2n", sum(col("_b2n")).over(w3))
      .withColumn("_c9p", sum((col("_side") === 1).cast("int")).over(w9))
      .withColumn("_c9n", sum((col("_side") === -1).cast("int")).over(w9))
      .select(col(K), col("bucket"), col(T), col(V),
        when(ok, col("_side")).as("side"),
        coalesce(when(ok, col("_r1") === 1), lit(false)).cast("int").as("r1"),
        coalesce(when(ok,
          (col("_b2p") === 1 && col("_c2p") >= 2) ||
          (col("_b2n") === 1 && col("_c2n") >= 2)), lit(false))
          .cast("int").as("r2"),
        coalesce(when(ok,
          (col("_side") === 1 && col("_c9p") === 9) ||
          (col("_side") === -1 && col("_c9n") === 9)), lit(false))
          .cast("int").as("r4"))
  }

  /** Local-extremum (peak) detection per key: a point is a peak when its
    * value strictly exceeds the max of the `w` points before it and is
    * at least the max of the `w` points after (ties break to the FIRST
    * point of a plateau — the deterministic convention), both frames
    * FULL (series edges never qualify — the [[levelShift]] warm-up
    * rule). `local_range` = height above the ±w window minimum, the
    * cheap prominence proxy. Output (key, t, v, local_range) for peak
    * rows only; all comparisons on exact 1e-3 longs.
    *
    * Scale: four row-bounded frames over ONE per-key sort — the
    * [[levelShift]] shape; output shrinks to the peak rows. */
  def peaks(df: DataFrame, w: Int): DataFrame = {
    require(w >= 1, s"window $w must be >= 1")
    // (t, _x) order so frame membership under duplicate timestamps is
    // identical in any engine replaying the same quantized grid
    val ord = Window.partitionBy(col(K)).orderBy(col(T).asc, col("_x").asc)
    val pre = ord.rowsBetween(-w, -1)
    val post = ord.rowsBetween(1, w)
    val both = ord.rowsBetween(-w, w)
    val pts = df.filter(col(V).isNotNull)
      .withColumn("_x", floor(col(V) * 1000 + 0.5).cast("long"))
    pts
      .withColumn("_full",
        count(lit(1)).over(pre) === w && count(lit(1)).over(post) === w)
      .withColumn("_peak",
        col("_full") && col("_x") > max(col("_x")).over(pre) &&
          col("_x") >= max(col("_x")).over(post))
      .withColumn("_min", min(col("_x")).over(both))
      .filter(col("_peak"))
      .select(col(K), col(T), col(V),
        round((col("_x") - col("_min")) / 1000.0, 6).as("local_range"))
  }

  /** Running-record scan per key: flag points that set a new all-time
    * high or low for their series — the "new record" events a
    * monitoring feed annotates. The FIRST point is both records by
    * convention; `margin` = distance past the previous record (null on
    * the first point). Output (key, t, v, record_high, record_low,
    * margin) for record rows only; exact 1e-3-long comparisons, margin
    * one division.
    *
    * Scale: two unbounded-preceding frames over one per-key sort —
    * running state is a single long each. */
  def records(df: DataFrame): DataFrame = {
    val ord = Window.partitionBy(col(K)).orderBy(col(T).asc, col("_x").asc)
    val pre = ord.rowsBetween(Window.unboundedPreceding, -1)
    val pts = df.filter(col(V).isNotNull)
      .withColumn("_x", floor(col(V) * 1000 + 0.5).cast("long"))
    pts
      .withColumn("_hi", max(col("_x")).over(pre))
      .withColumn("_lo", min(col("_x")).over(pre))
      .withColumn("record_high",
        coalesce(col("_x") > col("_hi"), lit(true)).cast("int"))
      .withColumn("record_low",
        coalesce(col("_x") < col("_lo"), lit(true)).cast("int"))
      .filter(col("record_high") === 1 || col("record_low") === 1)
      .select(col(K), col(T), col(V), col("record_high"), col("record_low"),
        when(col("record_high") === 1 && col("_hi").isNotNull,
          round((col("_x") - col("_hi")) / 1000.0, 6))
          .otherwise(when(col("record_low") === 1 && col("_lo").isNotNull,
            round((col("_lo") - col("_x")) / 1000.0, 6)))
          .as("margin"))
  }

  /** Schedule-conformance watchdog per (key, bucket): given a nominal
    * reporting period, classify every inter-event gap — on-time
    * (gap ≤ 1.5·period, tested as 2·gap ≤ 3·period in EXACT longs),
    * late (≤ 3·period), missed (beyond) — and report per-bucket counts
    * plus the on-time share (ONE division). Gaps attribute to the
    * bucket of their CLOSING event. Output (key, bucket, n_gaps,
    * n_on_time, n_late, n_missed, conformance).
    *
    * Scale: one lag window over a per-key sort + one (key, bucket)
    * aggregate — the [[topGaps]] shape with a tier rollup on top. */
  def scheduleConformance(df: DataFrame, periodUs: Long,
      bucketUs: Long): DataFrame = {
    require(periodUs > 0 && bucketUs > 0, "period and bucket must be positive")
    val ord = Window.partitionBy(col(K)).orderBy(col(T).asc)
    val gaps = df
      .select(col(K), col(T), lag(col(T), 1).over(ord).as("_p"))
      .filter(col("_p").isNotNull)
      .withColumn("_gap", col(T) - col("_p"))
      .withColumn("bucket", floor(col(T) / bucketUs).cast("long"))
    gaps
      .groupBy(col(K), col("bucket"))
      .agg(count(lit(1)).as("n_gaps"),
        sum(when(col("_gap") * 2 <= periodUs * 3, 1L).otherwise(0L))
          .as("n_on_time"),
        sum(when(col("_gap") * 2 > periodUs * 3 &&
          col("_gap") <= periodUs * 3, 1L).otherwise(0L)).as("n_late"),
        sum(when(col("_gap") > periodUs * 3, 1L).otherwise(0L))
          .as("n_missed"))
      .withColumn("conformance",
        round(col("n_on_time") / col("n_gaps").cast("double"), 6))
  }

  /** Daily leaderboard churn: rank keys by event count within each day
    * and report each key's rank movement vs the previous day it
    * appeared — the "which sources surged" report. Rank ties break by
    * key (deterministic); `delta` = prev_rank − rank (positive = moved
    * up), null on a key's first day. Output (key, day, n, rank,
    * prev_rank, delta).
    *
    * Scale: one (key, day) count aggregate, then a rank window
    * partitioned BY DAY over the tier (|keys| rows per day — safe
    * exactly when the key universe fits a partition; at 100 TB that is
    * the curated leaderboard universe, not raw cardinality — the
    * [[graft.events.Correlation.dtwPairs]] gate), then a lag window
    * per key over days. */
  def leaderboard(df: DataFrame, dayUs: Long = 86400000000L): DataFrame = {
    require(dayUs > 0, s"day width $dayUs must be positive")
    val counts = df.filter(col(K).isNotNull)
      .groupBy(col(K).cast("string").as(K),
        floor(col(T) / dayUs).cast("long").as("day"))
      .agg(count(lit(1)).as("n"))
    val byDay = Window.partitionBy(col("day"))
      .orderBy(col("n").desc, col(K).asc)
    val byKey = Window.partitionBy(col(K)).orderBy(col("day").asc)
    counts
      .withColumn("rank", row_number().over(byDay))
      .withColumn("prev_rank", lag(col("rank"), 1).over(byKey))
      .withColumn("delta", col("prev_rank") - col("rank"))
  }

  /** Trailing-window distinct actives per (key, day): how many distinct
    * `actorCol` values were seen in the last `windowDays` days ending
    * at each day the key has data — the WAU/MAU tier, EXACT (the
    * KMV sketch is the approximate escape at unbounded cardinality).
    * Days with no data emit nothing (sparse convention). Output (key,
    * day, active).
    *
    * Scale: the distinct (key, day, actor) tier explodes each row to
    * the ≤`windowDays` target days it contributes to (a bounded
    * constant, the chunked-explode rule), then one count-distinct
    * aggregate per (key, target day) and a semi-join back to days that
    * exist. Raw volume collapses at the FIRST distinct; everything
    * after is tier-sized. */
  def trailingDistinct(df: DataFrame, actorCol: String,
      windowDays: Int = 7, dayUs: Long = 86400000000L): DataFrame = {
    require(windowDays >= 1, s"windowDays $windowDays must be >= 1")
    require(dayUs > 0, s"day width $dayUs must be positive")
    // null keys drop out (the leaderboard/dtwPairs pairing rule) — the
    // Seq-join semi below is equality-based by design
    val base = df.filter(col(actorCol).isNotNull && col(K).isNotNull)
      .select(col(K), floor(col(T) / dayUs).cast("long").as("day"),
        col(actorCol).as("_actor"))
      .distinct()
    val present = base.select(col(K), col("day")).distinct()
    val contrib = base
      .withColumn("_target",
        explode(sequence(col("day"), col("day") + (windowDays - 1))))
      .select(col(K), col("_target").as("day"), col("_actor"))
    contrib
      .join(present, Seq(K, "day"), "left_semi")
      .groupBy(col(K), col("day"))
      .agg(countDistinct(col("_actor")).as("active"))
  }

  /** Data-completeness scorecard per (key, day): how much of the day the
    * feed actually covered — the ingestion-SLA report a 10^12-row
    * pipeline publishes per source before anyone trusts a tier built on
    * it. Output (key, day, n, bins_present, coverage, max_gap_us):
    * `bins_present` = distinct `binUs` cells with ≥1 event, `coverage`
    * = bins_present / (dayUs/binUs) (ONE double division), `max_gap_us`
    * = the longest silent stretch INCLUDING the day's edges (day start →
    * first event, last event → day end) — the worst-blackout number, in
    * exact long µs.
    *
    * Scale: one lag window over a per-(key, day) sort plus one
    * aggregate — day-bounded partitions keep the sort short, and the
    * output is |keys|·|days| rows regardless of raw volume. */
  def completeness(df: DataFrame, dayUs: Long = 86400000000L,
      binUs: Long = 3600000000L): DataFrame = {
    require(dayUs > 0 && binUs > 0, "dayUs and binUs must be positive")
    require(dayUs % binUs == 0, s"binUs $binUs must divide dayUs $dayUs")
    val nBins = dayUs / binUs
    val pts = df
      .withColumn("day", floor(col(T) / dayUs).cast("long"))
    val w = Window.partitionBy(col(K), col("day")).orderBy(col(T).asc)
    // gap to the previous event, or to the day start for the first one
    val gap = col(T) - coalesce(lag(col(T), 1).over(w), col("day") * dayUs)
    pts
      .withColumn("_gap", gap)
      .groupBy(col(K), col("day"))
      .agg(count(lit(1)).as("n"),
        countDistinct(floor(col(T) / binUs)).as("bins_present"),
        max(col("_gap")).as("_maxInner"),
        max(col(T)).as("_last"))
      .select(col(K), col("day"), col("n"), col("bins_present"),
        round(col("bins_present") / lit(nBins.toDouble), 6).as("coverage"),
        greatest(col("_maxInner"),
          (col("day") + 1) * dayUs - col("_last")).as("max_gap_us"))
  }

  /** Robust (median/MAD) outlier scan per (key, bucket): each point is
    * scored |v − median| / MAD against ITS OWN bucket's median and median
    * absolute deviation — the robust complement of [[rollingZscore]]
    * (mean/stddev are dragged by the very outliers being hunted; the
    * median/MAD pair has a 50% breakdown point — Hampel's classic rule,
    * public). Output (key, bucket, t, v, score, anomaly); buckets whose
    * MAD is 0 (over half the points identical) or with <`minN` points
    * emit null score, anomaly 0.
    *
    * Engine-exactness: v is snapped to the 1e-3 grid as a LONG
    * (floor(v·1000 + ½) — the theilSen discipline; round()'s half-up
    * tie-break is not portable), both medians are exact interpolated
    * percentiles over integer-valued inputs (halves/quarters — exact in
    * binary doubles), so the score ratio is computed on identical
    * operands in any engine and reported via the floor-snap
    * (floor(x·1e6+½)/1e6 — the ratio CAN land exactly on the 5e-7
    * boundary where round()'s half-up tie-break is not portable; a
    * sf0.1 row did).
    *
    * Scale: two (key, bucket) aggregates + one join back to points. The
    * exact percentile holds a bucket's values per group — the bucket IS
    * the bound (hourly/daily tiers), the same contract as
    * [[graft.rollup.Rollup.tierPercentiles]]; the unbounded-scale escape
    * is percentile_approx there, not here, because MAD's second median
    * must see exact deviations. */
  def madAnomaly(df: DataFrame, bucketUs: Long, nMad: Double = 3.5,
      minN: Int = 4, broadcastStats: Boolean = true): DataFrame = {
    require(bucketUs > 0, s"bucket width $bucketUs must be positive")
    val pts = df.filter(col(V).isNotNull)
      .withColumn("bucket", floor(col(T) / bucketUs).cast("long"))
      .withColumn("_x", floor(col(V) * 1000 + 0.5).cast("long"))
    val med = pts.groupBy(col(K), col("bucket"))
      .agg(expr("percentile(_x, 0.5)").as("_med"), count(lit(1)).as("_n"))
    val med2 = med.select(col(K).as("_mk"), col("bucket").as("_mb"),
      col("_med"), col("_n"))
    val withMed = pts
      .join(if (broadcastStats) broadcast(med2) else med2,
        col(K) <=> col("_mk") && col("bucket") === col("_mb"))
      .drop("_mk", "_mb")
      .withColumn("_dev", abs(col("_x") - col("_med")))
    val mad = withMed.groupBy(col(K), col("bucket"))
      .agg(expr("percentile(_dev, 0.5)").as("_mad"))
    val mad2 = mad.select(col(K).as("_dk"), col("bucket").as("_db"), col("_mad"))
    val ok = col("_n") >= minN && col("_mad") > 0
    withMed
      .join(if (broadcastStats) broadcast(mad2) else mad2,
        col(K) <=> col("_dk") && col("bucket") === col("_db"))
      .drop("_dk", "_db")
      // floor-snap, not round(x, 6): dev/mad is a ratio of exact
      // halves/quarters that CAN land exactly on the 5e-7 boundary,
      // where round()'s half-up tie-break is not engine-portable
      .withColumn("score", when(ok,
        floor(col("_dev") / col("_mad") * 1e6 + 0.5) / 1e6))
      .withColumn("anomaly",
        coalesce(when(ok, col("_dev") / col("_mad") > nMad), lit(false))
          .cast("int"))
      .select(col(K), col("bucket"), col(T), col(V), col("score"),
        col("anomaly"))
  }

  /** Level-shift (step-change) detector: at each point, the mean of the
    * `w` points STRICTLY BEFORE it vs the mean of the `w` points FROM it
    * on; a shift fires where |post − pre| > threshold — the two-sided
    * moving-window edge filter (classic step-detection form, public),
    * the abrupt-jump complement of [[cusum]]'s slow-drift scan. Only
    * positions with BOTH windows full emit a shift (warm-up rows emit
    * null). Output (key, t, v, pre_mean, post_mean, shift, level_shift).
    *
    * Engine-exactness: v snaps to the 1e-3 grid as a LONG, both window
    * aggregates are integer SUMS (no float accumulation order anywhere),
    * and the means/shift divide the exact sums once at the end — the
    * strongest portability discipline in the battery: not even a
    * rounding step is needed for the flag, only for the reported
    * doubles.
    *
    * Scale: two row-bounded frames over ONE per-key sort (w rows of
    * state each) — the [[rollingZscore]] shape exactly. */
  def levelShift(df: DataFrame, w: Int, threshold: Double): DataFrame = {
    require(w >= 1, s"window $w must be >= 1")
    val ord = Window.partitionBy(K).orderBy(col(T).asc, col(V).asc)
    val pre = ord.rowsBetween(-w, -1)
    val post = ord.rowsBetween(Window.currentRow, w - 1)
    val thrMilli = math.rint(threshold * 1000).toLong
    val pts = df.filter(col(V).isNotNull)
      .withColumn("_x", floor(col(V) * 1000 + 0.5).cast("long"))
    val full = count(lit(1)).over(pre) === w && count(lit(1)).over(post) === w
    val sPre = sum(col("_x")).over(pre)
    val sPost = sum(col("_x")).over(post)
    pts
      .withColumn("pre_mean", when(full, round(sPre / (1000.0 * w), 6)))
      .withColumn("post_mean", when(full, round(sPost / (1000.0 * w), 6)))
      .withColumn("shift",
        when(full, round((sPost - sPre) / (1000.0 * w), 6)))
      .withColumn("level_shift",
        coalesce(when(full, abs(sPost - sPre) > thrMilli * w), lit(false))
          .cast("int"))
      .select(col(K), col(T), col(V), col("pre_mean"), col("post_mean"),
        col("shift"), col("level_shift"))
  }

  /** Kaplan-Meier survival estimator over inter-event waiting times per
    * key (Kaplan & Meier 1958): each actor's gaps are complete
    * observations; the wait still open at the horizon (the actor's last
    * event → horizon end) enters RIGHT-CENSORED, which is the whole
    * point of KM — a plain CCDF of completed gaps would bias the tail
    * short. Durations snap to `unitUs` ticks (floor). At each distinct
    * uncensored duration d: n_risk = observations with duration ≥ d,
    * n_event = uncensored at exactly d, S ← S · (n_risk − n_event) /
    * n_risk. Output (key, d, n_risk, n_event, survival), one row per
    * step (uncensored durations only).
    *
    * Engine-exactness: everything is exact-LONG until the per-step
    * factor; the survival product is a LEFT FOLD over the ascending-d
    * step list (one `aggregate()` HOF per key), so both engines multiply
    * the identical IEEE doubles in the identical order — bit-exact with
    * no grid snapping, the [[graft.regularize.Regularize.ewma]] carries
    * discipline applied to a product.
    *
    * Scale: gaps = one lag window per (key, actor) sort; the step table
    * is a per-(key, tick) AGGREGATE bounded by the duration range, so
    * the collected fold array is tier-sized (the ewma/holt per-bucket
    * contract), never data-sized. */
  def kaplanMeier(df: DataFrame, unitUs: Long,
      horizonUs: Option[Long] = None): DataFrame = {
    require(unitUs > 0, s"unit $unitUs must be positive")
    val pts = df.groupBy(col(K), col("actor"), col(T)).agg(count(lit(1)))
      .select(col(K), col("actor"), col(T))
    val ord = Window.partitionBy(col(K), col("actor")).orderBy(col(T).asc)
    val gaps = pts
      .select(col(K), (col(T) - lag(col(T), 1).over(ord)).as("_gap"))
      .filter(col("_gap").isNotNull)
      .select(col(K), floor(col("_gap") / unitUs).cast("long").as("_d"),
        lit(1L).as("_e"))
    val lasts = pts.groupBy(col(K), col("actor")).agg(max(col(T)).as("_last"))
    val censored = horizonUs match {
      case Some(h) => lasts.select(col(K),
        floor((lit(h) - col("_last")) / unitUs).cast("long").as("_d"),
        lit(0L).as("_e"))
      case None =>
        val hz = df.agg(max(col(T)).as("_hz"))
        lasts.crossJoin(broadcast(hz)).select(col(K),
          floor((col("_hz") - col("_last")) / unitUs).cast("long").as("_d"),
          lit(0L).as("_e"))
    }
    val byD = gaps.unionByName(censored)
      .groupBy(col(K), col("_d"))
      .agg(count(lit(1)).as("_c"), sum(col("_e")).as("_ne"))
    val w = Window.partitionBy(col(K)).orderBy(col("_d").asc)
    val steps = byD
      .withColumn("_before",
        coalesce(sum(col("_c")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_total", sum(col("_c")).over(
        Window.partitionBy(col(K))))
      .withColumn("_nr", col("_total") - col("_before"))
      .filter(col("_ne") > 0)
    steps
      .groupBy(col(K))
      .agg(sort_array(collect_list(
        struct(col("_d").as("d"), col("_nr").as("nr"), col("_ne").as("ne"))))
        .as("_arr"))
      .select(col(K), explode(expr(
        """aggregate(
             _arr,
             struct(cast(1.0d as double) as s,
                    cast(array() as
                      array<struct<d:bigint, nr:bigint, ne:bigint,
                                   s:double>>) as out),
             (acc, x) -> struct(
               acc.s * (cast(x.nr - x.ne as double) / cast(x.nr as double))
                 as s,
               array_append(acc.out, struct(x.d as d, x.nr as nr,
                 x.ne as ne,
                 acc.s * (cast(x.nr - x.ne as double)
                   / cast(x.nr as double)) as s)) as out),
             acc -> acc.out)""")).as("_km"))
      .select(col(K), col("_km.d").as("d"), col("_km.nr").as("n_risk"),
        col("_km.ne").as("n_event"), round(col("_km.s"), 6).as("survival"))
  }

  /** Saturating running sum (two-barrier Lindley scan): per key in
    * (t, a) order, s ← min(cap, max(0, s + a)) from s = 0 — the
    * battery / credit-ledger / token-balance recurrence. `clipped`
    * reports where a barrier bit: +1 (ceiling), −1 (floor), 0.
    * Output (key, t, a, level, clipped).
    *
    * The recurrence looks sequential, but each step is the clamp-affine
    * map x ↦ min(hi, max(lo, x + a)), and those maps compose in closed
    * form — (a₂,lo₂,hi₂)∘(a₁,lo₁,hi₁) = (a₁+a₂, max(lo₂, lo₁+a₂),
    * min(hi₂, max(lo₂, hi₁+a₂))) — an associative monoid, so the scan
    * distributes exactly like [[graft.regularize.Regularize.holt]]'s
    * matrix-affine one:
    *
    *  1. rows bucket by `floor(t / bucketMicros)`; ONE `aggregate()`
    *     HOF over each (key, bucket)'s sorted row array emits every
    *     row's composed in-bucket prefix (A, LO, HI) — the function the
    *     bucket applies to whatever carry-in level it receives;
    *  2. per-bucket NET triples fold per key in a second tiny HOF (the
    *     ewma carries pattern), emitting each bucket's carry-in level;
    *     rows finish with level = min(HI, max(LO, carry + A)).
    *
    * Everything is exact LONG arithmetic — no rounding discipline is
    * even needed; results are bucketing-invariant (property-tested), so
    * the width is purely a performance/memory knob like holt's. */
  def saturatingSum(df: DataFrame, cap: Long,
      bucketMicros: Long): DataFrame = {
    require(cap > 0, s"capacity $cap must be positive")
    require(bucketMicros > 0, s"bucket width $bucketMicros must be positive")
    val d = df.select(col(K), col(T), col("a").cast("long").as("a"))
      .withColumn("_bkt", floor(col(T) / bucketMicros).cast("long"))
    val scanned = d
      .groupBy(col(K), col("_bkt"))
      .agg(sort_array(collect_list(struct(col(T).as("t"), col("a"))))
        .as("_arr"))
      .select(col(K), col("_bkt"), explode(expr(
        s"""aggregate(
              _arr,
              struct(true as first, cast(0 as bigint) as pa,
                     cast(0 as bigint) as lo, cast(0 as bigint) as hi,
                     cast(array() as
                       array<struct<t:bigint, a:bigint, pa:bigint,
                                    lo:bigint, hi:bigint>>) as out),
              (acc, x) -> struct(
                false as first,
                acc.pa + x.a as pa,
                if(acc.first, cast(0 as bigint),
                   greatest(cast(0 as bigint), acc.lo + x.a)) as lo,
                if(acc.first, cast(${cap} as bigint),
                   least(cast(${cap} as bigint),
                     greatest(cast(0 as bigint), acc.hi + x.a))) as hi,
                array_append(acc.out, struct(
                  x.t as t, x.a as a, acc.pa + x.a as pa,
                  if(acc.first, cast(0 as bigint),
                     greatest(cast(0 as bigint), acc.lo + x.a)) as lo,
                  if(acc.first, cast(${cap} as bigint),
                     least(cast(${cap} as bigint),
                       greatest(cast(0 as bigint), acc.hi + x.a))) as hi))
                  as out),
              acc -> acc.out)""")).as("_r"))
      .select(col(K), col("_bkt"), col("_r.t").as(T), col("_r.a").as("a"),
        col("_r.pa").as("_A"), col("_r.lo").as("_lo"), col("_r.hi").as("_hi"))
    // per-bucket net = the last row's composed triple
    val ordS = struct(col(T), col("a"))
    val nets = scanned.groupBy(col(K).as("_nk"), col("_bkt").as("_nb"))
      .agg(max_by(col("_A"), ordS).as("_An"),
        max_by(col("_lo"), ordS).as("_lon"),
        max_by(col("_hi"), ordS).as("_hin"))
    val carries = nets
      .groupBy(col("_nk"))
      .agg(sort_array(collect_list(struct(col("_nb"), col("_An"),
        col("_lon"), col("_hin")))).as("_arr"))
      .select(col("_nk"), explode(expr(
        """aggregate(
             _arr,
             struct(cast(0 as bigint) as y,
                    cast(array() as array<struct<b:bigint, yin:bigint>>)
                      as out),
             (acc, e) -> struct(
               least(e._hin, greatest(e._lon, acc.y + e._An)) as y,
               array_append(acc.out, struct(e._nb as b, acc.y as yin))
                 as out),
             acc -> acc.out)""")).as("_c"))
      .select(col("_nk"), col("_c.b").as("_cb"), col("_c.yin").as("_yin"))
    val leveled = scanned
      .join(carries,
        scanned(K) <=> carries("_nk") && scanned("_bkt") <=> carries("_cb"))
      .withColumn("level",
        least(col("_hi"), greatest(col("_lo"), col("_yin") + col("_A"))))
    // clip flag: compare to the previous level (in-bucket lag; the
    // bucket's first row compares to its carry-in)
    val wIn = Window.partitionBy(col(K), col("_bkt"))
      .orderBy(col(T).asc, col("a").asc)
    leveled
      .withColumn("_prev", coalesce(lag(col("level"), 1).over(wIn),
        col("_yin")))
      .select(col(K), col(T), col("a"), col("level"),
        when(col("_prev") + col("a") > col("level"), lit(1))
          .when(col("_prev") + col("a") < col("level"), lit(-1))
          .otherwise(lit(0)).as("clipped"))
  }

  /** Trailing-window maximum per point — max of v over (t − W, t] — in
    * O(n) aggregate work via the classic two-block decomposition,
    * instead of the O(n·W) a naive RANGE frame costs (Spark's window
    * max re-scans its frame per row; for a dense key and a wide window
    * that is the quadratic trap). Rows bucket by `floor(t / W)`, so the
    * window spans AT MOST two buckets: the answer is
    * greatest(prefix-max of the own bucket up to t, suffix-max of the
    * previous bucket past t − W). The suffix lookup rides the same
    * union-carry shape as [[graft.merge.MergeOps.alignPair]]: each
    * point posts a probe row at position t − W into its previous
    * bucket, and ONE descending in-bucket running max answers every
    * probe — two windows and one (key, t) self-join total, all state
    * O(1). Input dedupes to one value per (key, t) (max — the loader
    * convention). Output (key, t, v, win_max); values on the 1e-3 grid,
    * the boundary test is strict (t' > t − W) in exact longs.
    */
  def slidingMax(df: DataFrame, windowUs: Long): DataFrame = {
    require(windowUs > 0, s"window width $windowUs must be positive")
    val pts = df.filter(col(V).isNotNull)
      .groupBy(col(K), col(T)).agg(max(col(V)).as(V))
      .withColumn("_x", floor(col(V) * 1000 + 0.5).cast("long"))
      .withColumn("_b", floor(col(T) / windowUs).cast("long"))
    val data = pts.select(col(K), col("_b"), col(T).as("_pos"),
      lit(null).cast("long").as("_ot"), col("_x"))
    val probes = pts.select(col(K), (col("_b") - 1).as("_b"),
      (col(T) - windowUs).as("_pos"), col(T).as("_ot"),
      lit(null).cast("long").as("_x"))
    // suffix max within the bucket, scanned right-to-left; at equal
    // position the probe sorts FIRST so a data row exactly at t − W is
    // excluded (strict boundary)
    val wSuf = Window.partitionBy(col(K), col("_b"))
      .orderBy(col("_pos").desc, col("_ot").isNull.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val answered = data.unionByName(probes)
      .withColumn("_sm", max(col("_x")).over(wSuf))
      .filter(col("_ot").isNotNull)
      .select(col(K).as("_pk"), col("_ot"), col("_sm"))
    val wPre = Window.partitionBy(col(K), col("_b"))
      .orderBy(col(T).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts
      .withColumn("_pm", max(col("_x")).over(wPre))
      .join(answered, pts(K) <=> col("_pk") && pts(T) === col("_ot"))
      .select(col(K), col(T), col(V),
        (greatest(col("_pm"), col("_sm")) / 1000.0).as("win_max"))
  }

  /** Alert-flapping suppression: threshold the series into a boolean
    * state, keep the state CHANGES (crossings), and for each crossing
    * count the crossings in the trailing window (t − W, t] — a crossing
    * whose trailing count exceeds `maxFlips` is "flapping" and gets
    * suppressed (the classic alert-storm damper; [[threshold]] +
    * [[graft.core.SeriesOps.compact]] give the crossing stream, this op
    * adds the storm test). Trailing count in O(n): each crossing carries
    * its 1-based running index r, posts a probe at position t − W, and
    * ONE as-of window answers every probe with r_asof = #crossings at or
    * before t − W; the count is r − r_asof — no RANGE re-scan, state
    * O(1) per row. At equal position the probe sorts AFTER data, so a
    * crossing exactly at t − W lands in the subtracted prefix (strict
    * left boundary, matching the oracle's integer RANGE frame). Input
    * dedupes to max v per (key, t); windows partition by key alone —
    * the crossing stream is the COMPACTED state sequence (≪ raw
    * points), so a hot key carries only its state flips.
    * Output (key, t, state, n_cross, suppressed 0/1).
    */
  def flapSuppress(df: DataFrame, threshold: Column, windowUs: Long,
      maxFlips: Int): DataFrame = {
    require(windowUs > 0, s"window width $windowUs must be positive")
    val wk = Window.partitionBy(col(K)).orderBy(col(T).asc)
    val st = df.filter(col(V).isNotNull)
      .groupBy(col(K), col(T)).agg(max(col(V)).as(V))
      .withColumn("_st", (col(V) >= threshold).cast("int"))
      .withColumn("_pst", lag(col("_st"), 1).over(wk))
    val cross = st
      .filter(col("_pst").isNotNull && col("_st") =!= col("_pst"))
      .withColumn("_r", row_number().over(wk))
    val data = cross.select(col(K), col(T).as("_pos"),
      lit(null).cast("long").as("_ot"), col("_r"))
    val probes = cross.select(col(K), (col(T) - windowUs).as("_pos"),
      col(T).as("_ot"), lit(null).cast("int").as("_r"))
    // as-of prefix index: last data _r at position <= t − W; probe sorts
    // after data at equal position so a crossing exactly at t − W counts
    // into the subtracted prefix
    val wAsof = Window.partitionBy(col(K))
      .orderBy(col("_pos").asc, col("_ot").isNotNull.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val asof = data.unionByName(probes)
      .withColumn("_ra", last(col("_r"), ignoreNulls = true).over(wAsof))
      .filter(col("_ot").isNotNull)
      .select(col(K).as("_ak"), col("_ot"), coalesce(col("_ra"), lit(0)).as("_ra"))
    cross
      .join(asof, col(K) <=> col("_ak") && col(T) === col("_ot"))
      .select(col(K), col(T), col("_st").cast("long").as("state"),
        (col("_r") - col("_ra")).cast("long").as("n_cross"),
        (col("_r") - col("_ra") > maxFlips).cast("long").as("suppressed"))
  }

  /** Maximum drawdown per key: the deepest drop from a running peak —
    * dd(t) = runmax(v) − v(t), reported at its trough with the time of
    * the peak it fell from. Ties: the deepest drawdown breaks to the
    * EARLIEST trough; the peak is the EARLIEST time the running maximum
    * was attained at-or-before that trough. Keys that only rise report
    * max_dd = 0 at their first point. Output (key, n, max_dd, peak_t,
    * trough_t).
    *
    * Engine-exactness: v snaps to the 1e-3 grid as a LONG; the running
    * peak, drawdown and both argmax tie-breaks are integer struct
    * comparisons; the single division by 1000 at the end is exact IEEE.
    *
    * Scale: one unbounded-preceding struct-max frame over one per-key
    * sort (state = one (long, long) pair) + one per-key aggregate — the
    * [[records]] shape. A pathological single-key corpus would route
    * through [[graft.core.BucketedOps]]' per-bucket handoff instead. */
  def maxDrawdown(df: DataFrame): DataFrame = {
    val ord = Window.partitionBy(col(K)).orderBy(col(T).asc, col(V).asc)
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pts = df.filter(col(V).isNotNull)
      .withColumn("_x", floor(col(V) * 1000 + 0.5).cast("long"))
    // running max as a struct of (value, -t): lexicographic max = highest
    // value, tie -> max(-t) = earliest attaining time
    val peaked = pts
      .withColumn("_pk", max(struct(col("_x"), (-col(T)).as("_nt"))).over(run))
      .withColumn("_dd", col("_pk._x") - col("_x"))
    peaked
      .groupBy(col(K))
      .agg(count(lit(1)).as("n"),
        // deepest drawdown, tie -> earliest trough; carry its peak time
        max(struct(col("_dd"), (-col(T)).as("_nt"),
          (-col("_pk._nt")).as("_pt"))).as("_m"))
      .select(col(K), col("n"),
        round(col("_m._dd") / 1000.0, 6).as("max_dd"),
        col("_m._pt").as("peak_t"), (-col("_m._nt")).as("trough_t"))
  }

  /** Event-triggered average (the "event study" / stimulus-locked
    * profile): for each trigger event and each relative offset in
    * `offsetsUs`, sample the value series at `t_trigger + offset` with
    * previous-value interpolation (the reference's `get(t, "previous")`
    * semantics, traces/timeseries.py:91-110 — a measurement exactly at
    * the probe time counts), then average ACROSS triggers per (key,
    * offset) — "what does the series do, on average, around a deploy".
    * Probes before a key's first measurement answer null and are
    * excluded from the mean but counted (n_events vs n_sampled).
    *
    * Plan: triggers × broadcast offset axis → tagged probe rows riding
    * ONE union-then-window as-of per key (the [[graft.regularize
    * .Regularize.samplePrevious]] idiom with the offset carried through
    * — no per-offset data replication, no range join), then one
    * aggregate. Engine-exactness: the sampled value quantizes to the
    * 1e-3 grid as a LONG before the sum; the mean is ONE IEEE division.
    * Output (key, off_us, n_events, n_sampled, mean_v).
    */
  def eventTriggeredAverage(
      pts: DataFrame, triggers: DataFrame,
      offsetsUs: Seq[Long]): DataFrame = {
    require(offsetsUs.nonEmpty, "offsetsUs must be non-empty")
    val offs = offsetsUs.map(o => lit(o).cast("long"))
    val data = pts.filter(col(V).isNotNull)
      .groupBy(col(K), col(T)).agg(max(col(V)).as(V)) // loader convention
      .select(col(K), col(T), col(V),
        lit(null).cast("long").as("_off"), lit(0).as("_g"))
    val probe = triggers
      .select(col(K), col(T), explode(array(offs: _*)).as("_off"))
      .select(col(K), (col(T) + col("_off")).as(T),
        lit(null).cast("double").as(V), col("_off"), lit(1).as("_g"))
    val w = Window.partitionBy(K)
      .orderBy(col(T).asc, col("_g").asc) // data before probes at equal t
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    data.unionByName(probe)
      .withColumn("_s",
        last(when(col("_g") === 0, struct(col(V))), ignoreNulls = true).over(w))
      .filter(col("_g") === 1)
      .select(col(K), col("_off"), col("_s").getField(V).as("_sv"))
      .groupBy(col(K), col("_off").as("off_us"))
      .agg(count(lit(1)).as("n_events"),
        count(col("_sv")).as("n_sampled"),
        sum(floor(col("_sv") * 1000 + 0.5).cast("long")).as("_q"))
      .select(col(K), col("off_us"), col("n_events"), col("n_sampled"),
        round(col("_q") / 1000.0 / col("n_sampled"), 6).as("mean_v"))
  }

  /** Multi-window error-budget burn rate (the SRE workbook's
    * multiwindow multi-burn-rate alert, public sre.google — the
    * composition every SLO monitor runs): per key, each event is a
    * request, "bad" = `isBad`; at every distinct event time the
    * trailing windows (t − W, t] for W ∈ {shortUs, longUs} give
    * burn_W = (bad_W / total_W) / budget, and the alert fires when
    * BOTH windows burn at ≥ `burnThreshold` (the short window for
    * responsiveness, the long one to gate flickers). Trailing counts in
    * O(n) per window by the [[flapSuppress]] prefix-difference
    * identity: running (total, bad) prefixes + one as-of probe at
    * t − W — never a RANGE re-scan. Rows pre-aggregate to per-(key, t)
    * counts so prefixes are deterministic; a probe at an occupied
    * position sorts AFTER data (strict left boundary, matching the
    * integer RANGE frame of the oracle). Burn rates are two IEEE
    * divisions in a fixed order, rounded to 6 dp; the alert compares
    * the rounded values. Output (key, t, tot_s, bad_s, burn_s, tot_l,
    * bad_l, burn_l, alert).
    */
  def burnRate(df: DataFrame, isBad: Column, budget: Double,
      shortUs: Long, longUs: Long, burnThreshold: Double): DataFrame = {
    require(budget > 0 && budget <= 1, s"budget $budget must be in (0, 1]")
    require(shortUs > 0 && longUs > shortUs,
      s"windows must satisfy 0 < short ($shortUs) < long ($longUs)")
    val wk = Window.partitionBy(col(K)).orderBy(col(T).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val byT = df
      .groupBy(col(K), col(T))
      .agg(count(lit(1)).as("_n"),
        coalesce(sum(isBad.cast("long")), lit(0L)).as("_b"))
      .withColumn("_rt", sum(col("_n")).over(wk))
      .withColumn("_rb", sum(col("_b")).over(wk))
    val data = byT.select(col(K), col(T).as("_pos"),
      lit(null).cast("long").as("_ot"),
      struct(col("_rt"), col("_rb")).as("_pfx"))
    def answered(windowUs: Long, sfx: String) = {
      val probes = byT.select(col(K), (col(T) - windowUs).as("_pos"),
        col(T).as("_ot"),
        lit(null).cast("struct<_rt:bigint,_rb:bigint>").as("_pfx"))
      val wAsof = Window.partitionBy(col(K))
        .orderBy(col("_pos").asc, col("_ot").isNotNull.asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      data.unionByName(probes)
        .withColumn("_a", last(col("_pfx"), ignoreNulls = true).over(wAsof))
        .filter(col("_ot").isNotNull)
        .select(col(K).as(s"_ak$sfx"), col("_ot").as(s"_ot$sfx"),
          coalesce(col("_a._rt"), lit(0L)).as(s"_at$sfx"),
          coalesce(col("_a._rb"), lit(0L)).as(s"_ab$sfx"))
    }
    def burn(tot: Column, bad: Column) =
      round(bad.cast("double") / tot / budget, 6)
    byT
      .join(answered(shortUs, "s"),
        col(K) <=> col("_aks") && col(T) === col("_ots"))
      .join(answered(longUs, "l"),
        col(K) <=> col("_akl") && col(T) === col("_otl"))
      .withColumn("tot_s", col("_rt") - col("_ats"))
      .withColumn("bad_s", col("_rb") - col("_abs"))
      .withColumn("tot_l", col("_rt") - col("_atl"))
      .withColumn("bad_l", col("_rb") - col("_abl"))
      .withColumn("burn_s", burn(col("tot_s"), col("bad_s")))
      .withColumn("burn_l", burn(col("tot_l"), col("bad_l")))
      .select(col(K), col(T), col("tot_s"), col("bad_s"), col("burn_s"),
        col("tot_l"), col("bad_l"), col("burn_l"),
        (col("burn_s") >= burnThreshold && col("burn_l") >= burnThreshold)
          .cast("long").as("alert"))
  }

  /** Centered rolling-median despike filter (the classic robust
    * smoother — Tukey's median filter): per key, the lower median of
    * the ±`halfWidth`-ROW window around each point, plus a spike flag
    * when the point deviates from its local median by more than
    * `spikeThreshold`. Median on the 1e-3 integer grid — the window is
    * sorted as quantized longs and the LOWER median (1-based index
    * ⌊(n+1)/2⌋, n = 3..2·halfWidth+1 near series edges) is picked, so
    * the result is integer-exact in any engine. Input dedupes to max v
    * per (key, t) (the loader convention).
    *
    * Scale: one bounded ROWS frame per point (2·halfWidth+1 elements of
    * O(1) state — never a RANGE rescan), one exchange on key; the spike
    * test compares quantized longs, no float drift. Output
    * (key, t, v, med_v, is_spike 0/1).
    */
  def rollingMedian(df: DataFrame, halfWidth: Int,
      spikeThreshold: Double): DataFrame = {
    require(halfWidth > 0, s"halfWidth $halfWidth must be positive")
    val threshQ = math.floor(spikeThreshold * 1000 + 0.5).toLong
    val w = Window.partitionBy(col(K)).orderBy(col(T).asc)
      .rowsBetween(-halfWidth, halfWidth)
    df.filter(col(V).isNotNull)
      .groupBy(col(K), col(T)).agg(max(col(V)).as(V))
      .withColumn("_x", floor(col(V) * 1000 + 0.5).cast("long"))
      .withColumn("_arr", sort_array(collect_list(col("_x")).over(w)))
      .withColumn("_med",
        element_at(col("_arr"), ((size(col("_arr")) + 1) / 2).cast("int")))
      .select(col(K), col(T), col(V), (col("_med") / 1000.0).as("med_v"),
        (abs(col("_x") - col("_med")) > threshQ).cast("long").as("is_spike"))
  }

  /** Hill tail-index estimator on the inter-event gap distribution per
    * key: over the k largest positive gaps x₍₁₎ ≥ … ≥ x₍ₖ₎ and the
    * threshold x₍ₖ₊₁₎,
    *
    *   H = (1/k)·Σᵢ ln(x₍ᵢ₎ / x₍ₖ₊₁₎),   tail index α = 1/H
    *
    * — the classic heavy-tail screen (Hill 1975): α < 2 means gap
    * variance is effectively infinite and mean-based SLA math on this
    * key is meaningless; the burstiness coefficient says gaps VARY,
    * Hill says whether the variance even exists. k shrinks to
    * n_gaps − 1 on short keys; keys with fewer than 2 positive gaps
    * emit nothing.
    *
    * Engine-exactness: gaps are exact long µs; each ln is quantized to
    * the 2^20 grid (the Kleinberg/entropy-rate convention) so the log
    * sum is exact long algebra; H and α are one fixed float expression
    * each. Ties at the boundary cannot move the result: rank
    * membership only selects VALUES, and tied values contribute equal
    * terms. α is null when every top-k gap equals the threshold (H=0).
    *
    * Scale: one lag window + one row_number top-(k+1) window per key
    * (single hash(key) exchange, shared sort), then a k-row-per-key
    * aggregate and a tiny threshold join — per-key state is O(k). */
  def hillTailIndex(df: DataFrame, k: Int = 50): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    def qln(c: Column): Column = graft.core.Quant.qln20(c)
    val gaps = interEventTimes(df).filter(col("gap") > 0)
    val w = Window.partitionBy(col(K)).orderBy(col("gap").desc, col(T).asc)
    val ranked = gaps
      .withColumn("_r", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(col(K))))
      .withColumn("_k", least(lit(k.toLong), col("_n") - 1))
      .filter(col("_n") >= 2 && col("_r") <= col("_k") + 1)
    val thr = ranked.filter(col("_r") === col("_k") + 1)
      .select(col(K).as("_tk"), qln(col("gap")).as("_qthr"),
        col("_k").as("_ku"), col("_n").as("_nu"))
    val diff = col("_qsum") - col("_ku") * col("_qthr")
    ranked.filter(col("_r") <= col("_k"))
      .groupBy(col(K))
      .agg(sum(qln(col("gap"))).as("_qsum"))
      .join(thr, col(K) <=> col("_tk"))
      .select(col(K), col("_nu").as("n_gaps"), col("_ku").as("k_used"),
        round(diff.cast("double") / lit(1048576.0)
          / col("_ku").cast("double"), 6).as("hill_mean_log"),
        when(diff > 0, round(col("_ku").cast("double") * lit(1048576.0)
          / diff.cast("double"), 6)).as("tail_index"))
  }

  /** Daily KL divergence of the category mix vs the whole table's mix:
    * for each time bin d, KL(P_d ‖ P_global) in bits over the key
    * (category) distribution — the categorical drift screen
    * complementing [[psiDrift]] (which bins VALUES of one series; this
    * compares each day's MIX of categories against the global mix,
    * the "did today's traffic composition shift" question).
    *
    *   KL_d = Σ_e (n_ed/N_d)·log2( (n_ed/N_d) / (g_e/G) )
    *
    * Engine-exactness: all four factors are exact counts; each term is
    * n_ed·(qln(n_ed) + qln(G) − qln(N_d) − qln(g_e)) on the 2^20
    * quantized-ln grid — exact long algebra, order-independent — and
    * the bits conversion is one fixed float chain. Categories absent
    * from a day simply contribute no term (the day's mix assigns them
    * zero mass); every present category has g_e > 0 by construction,
    * so no term is infinite.
    *
    * Scale: one (bin, key) count whose groups collapse map-side, a
    * per-bin window over the GRID-sized frame (bins × categories), a
    * broadcast join of the per-category global totals, and a broadcast
    * 1-row grand total — no data-sized shuffle after the first
    * aggregate. Output (bin, n_events, n_cats, kl_bits). */
  def klMixDrift(df: DataFrame, binUs: Long = 86400000000L): DataFrame = {
    require(binUs > 0, s"binUs $binUs must be positive")
    def qln(c: Column): Column = graft.core.Quant.qln20(c)
    val cnt = df
      .groupBy(floor(col(T) / binUs).cast("long").as("bin"), col(K))
      .agg(count(lit(1)).as("_n"))
    val gk = cnt.groupBy(col(K)).agg(sum(col("_n")).as("_g"))
    val gt = gk.agg(sum(col("_g")).as("_gt")) // one row
    cnt
      .withColumn("_nd", sum(col("_n")).over(Window.partitionBy(col("bin"))))
      .join(broadcast(gk.withColumnRenamed(K, "_gk")), col(K) <=> col("_gk"))
      .crossJoin(broadcast(gt))
      .withColumn("_term", col("_n") *
        (qln(col("_n")) + qln(col("_gt")) - qln(col("_nd")) - qln(col("_g"))))
      .groupBy(col("bin"))
      .agg(first(col("_nd")).as("n_events"),
        count(lit(1)).as("n_cats"),
        sum(col("_term")).as("_qsum"))
      .select(col("bin"), col("n_events"), col("n_cats"),
        round(col("_qsum").cast("double") / lit(1048576.0)
          / col("n_events").cast("double")
          / lit(0.6931471805599453), 6).as("kl_bits"))
  }

  /** Typed profile of one JSON attribute in a string payload column —
    * the semi-structured face of the events table (every other
    * operator reads typed columns; real event streams carry a JSON
    * props blob whose attributes need extraction BEFORE any of them
    * apply). Per key: the count of rows whose `path` extracts to an
    * integer, the count where it does not (missing/corrupt — surfaced,
    * never silently dropped), distinct values, the modal value (ties →
    * smallest), its count, the exact mean, min and max. Output (key,
    * n_events, n_missing, n_distinct, mode_v, n_mode, mean_v, min_v,
    * max_v); a key whose EVERY row fails extraction still appears
    * (n_events 0, null stats).
    *
    * Engine-exactness: extraction is string→long with STRICT integer
    * parsing on both sides — Spark's non-ANSI cast nulls "3.7", so the
    * oracle gates its TRY_CAST behind an integer regex to match;
    * everything downstream is exact integer counts/sums plus one mean
    * division.
    *
    * Scale: one (key, value) aggregate whose groups collapse map-side
    * — the grid is value-cardinality-bounded, so the mode needs no
    * window and no per-key state beyond the grid row. */
  def jsonAttrProfile(df: DataFrame, propsCol: String = "props",
      path: String = "$.k"): DataFrame = {
    // gate the cast behind the SAME integer regex the oracle uses —
    // Spark's non-ANSI string→long accepts forms the oracle's
    // '^-?[0-9]+$' rejects ('+5', ' 3'), a latent engine/oracle
    // divergence for payloads outside the generated data (round-4
    // ADVICE); one parsing contract shared by both sides
    val raw = get_json_object(col(propsCol), path)
    val v = when(raw.rlike("^-?[0-9]+$"), raw.cast("long"))
    val cells = df.select(col(K), v.as("_v"))
    val missing = cells.filter(col("_v").isNull)
      .groupBy(col(K)).agg(count(lit(1)).as("_nm"))
    val grid = cells.filter(col("_v").isNotNull)
      .groupBy(col(K), col("_v")).agg(count(lit(1)).as("_n"))
    grid.groupBy(col(K))
      .agg(sum(col("_n")).as("n_events"),
        count(lit(1)).as("n_distinct"),
        min(struct((-col("_n")).as("_nn"), col("_v").as("_mv"))).as("_m"),
        sum(col("_v") * col("_n")).as("_sv"),
        min(col("_v")).as("min_v"), max(col("_v")).as("max_v"))
      // full outer: an all-missing key must still surface (n_events 0,
      // null stats) — that's what makes "never silently dropped" true
      .join(missing.withColumnRenamed(K, "_mk"), col(K) <=> col("_mk"), "full")
      .select(coalesce(col(K), col("_mk")).as(K),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("_nm"), lit(0L)).as("n_missing"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("_m").getField("_mv").as("mode_v"),
        (-col("_m").getField("_nn")).as("n_mode"),
        round(col("_sv").cast("double") / col("n_events"), 6).as("mean_v"),
        col("min_v"), col("max_v"))
  }

  /** Allan variance ladder of the per-bin event count: for each
    * averaging time τ, AVAR(τ) = Σᵢ(cᵢ₊₁ − cᵢ)² / (2(M−1)) over the
    * DENSE bin grid [min bin, max bin] (empty bins count 0 — skipping
    * them would splice non-adjacent bins into fake pairs). The
    * two-sample (Allan) variance is the classic stability-vs-averaging
    * -time fingerprint for counting processes: white (uncorrelated)
    * event noise falls as 1/τ on the ladder, rate drift flattens or
    * rises it — reading the ladder's slope separates the two where a
    * single variance number cannot.
    *
    * Engine-exactness: bin counts and squared differences are exact
    * integers summed exactly; AVAR and ADEV are one division and one
    * sqrt each on identical operands. Output (key, tau_us, n_pairs,
    * avar, adev); a (key, τ) whose grid holds a single bin has no pair
    * and emits nothing.
    *
    * Scale: one scan builds all τ levels (explode over the τ ladder),
    * counts collapse map-side; the dense grid is bounded by
    * time-span/τ — a TIME-grid object like the sample() grids, not a
    * data-sized one — chunked so no explode row exceeds 4096 entries;
    * one lead window per (key, τ) over grid-sized rows. */
  def allanVariance(df: DataFrame, taus: Seq[Long]): DataFrame = {
    require(taus.nonEmpty && taus.forall(_ > 0), "taus must be positive")
    val chunk = 4096L
    val binned = df
      .select(col(K), col(T), explode(array(taus.map(lit): _*)).as("tau"))
      .select(col(K), col("tau"),
        floor(col(T) / col("tau")).cast("long").as("_b"))
      .groupBy(col(K), col("tau"), col("_b"))
      .agg(count(lit(1)).as("_c"))
    val grid = binned
      .groupBy(col(K), col("tau"))
      .agg(min(col("_b")).as("_b0"), max(col("_b")).as("_b1"))
      .select(col(K), col("tau"), col("_b1"),
        explode(sequence(col("_b0"), col("_b1"), lit(chunk))).as("_c0"))
      .select(col(K), col("tau"),
        explode(sequence(col("_c0"),
          least(col("_c0") + (chunk - 1), col("_b1")))).as("_b"))
    val dense = grid
      .join(binned, Seq(K, "tau", "_b"), "left")
      .select(col(K), col("tau"), col("_b"),
        coalesce(col("_c"), lit(0L)).as("_c"))
    val w = Window.partitionBy(col(K), col("tau")).orderBy(col("_b"))
    dense
      .withColumn("_d", lead(col("_c"), 1).over(w) - col("_c"))
      .filter(col("_d").isNotNull)
      .groupBy(col(K), col("tau"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("_d") * col("_d")).as("_sd2"))
      .select(col(K), col("tau").as("tau_us"), col("n_pairs"),
        round(col("_sd2").cast("double") / (lit(2.0) * col("n_pairs")), 6)
          .as("avar"),
        round(sqrt(col("_sd2").cast("double") / (lit(2.0) * col("n_pairs"))), 6)
          .as("adev"))
  }
}
