package graft.rollup

import graft.core.SeriesOps
import graft.core.SeriesOps.{K, T, V}
import graft.regularize.{CalendarFloor, Regularize}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Calendar binning and the continuous-aggregate tier cascade
  * (reference `bin`/`rebin`, traces/timeseries.py:819-866; the
  * hourly→daily→weekly cascade is the `smaller=` path at :845-851, exact
  * because rebin sums *unnormalized* histograms — Histogram.add is
  * associative, traces/histogram.py:263-271).
  */
object Rollup {

  /** Duration-weighted histogram per calendar bin: rows
    * (key, bin_start, v, weight_micros). Bins cover
    * [floor(start), last boundary < end) exactly like the reference's
    * datetime_range + pairwise (which drops the partial tail bucket).
    * Optional mask intervals (m0, m1 [,key]) clip the weights.
    */
  def bin(
      df: DataFrame,
      startUs: Long,
      endUs: Long,
      unit: String,
      nUnits: Int = 1,
      mask: Option[DataFrame] = None,
      default: Column = lit(null).cast("double")): DataFrame = {
    val bounds = CalendarFloor.binBoundaries(startUs, endUs, unit, nUnits)
    require(bounds.size >= 2, s"no complete bins in [$startUs, $endUs)")
    val b0 = bounds.head
    val bLast = bounds.last // bins end here; partial tail dropped
    val step = CalendarFloor.unitMicros(unit, nUnits)
    val segs0 = SeriesOps.segmentsInRange(df, lit(b0), lit(bLast), default)
    val segs = mask.fold(segs0)(m => SeriesOps.intersectMask(segs0, m))
    Regularize
      .splitAtCells(segs, lit(b0), lit(step))
      .groupBy(col(K), col("cell_start").as("bin_start"), col(V))
      .agg(sum(col("t1") - col("t0")).as("weight"))
      .select(col(K), col("bin_start"), col(V), col("weight"))
  }

  /** Duration-weighted value histogram per fixed-step bin over
    * [startUs, endUs): range segments (zero-order hold carried from the
    * range start) split at step cells, grouped to (key, bin_start, v,
    * weight). The building block of the hist tier cascade AND the
    * real-time continuous-aggregate stitch: for any cell-aligned
    * watermark m, histTier(a, m) ∪ histTier(m, b) ≡ histTier(a, b) —
    * [[graft.core.SeriesOps.segmentsInRange]] carries each key's as-of
    * value across m, so the materialized-tier + raw-tail union is
    * seamless (ServingSpec asserts the identity on random series; the
    * q191 oracle proves it against DuckDB). */
  def histTier(
      df: DataFrame,
      startUs: Long,
      endUs: Long,
      stepUs: Long,
      default: Column = lit(null).cast("double")): DataFrame = {
    val segs = SeriesOps.segmentsInRange(df, lit(startUs), lit(endUs), default)
    Regularize
      .splitAtCells(segs, lit(0L), lit(stepUs))
      .groupBy(col(K), col("cell_start").as("bin_start"), col(V))
      .agg(sum(col("t1") - col("t0")).as("weight"))
  }

  /** Re-aggregate finer bins into coarser ones by summing unnormalized
    * histogram weights (reference `rebin`, traces/timeseries.py:819-829)
    * — the lossless tier cascade. `floorBin` maps a fine bin_start to its
    * coarse bin_start (e.g. µs-truncation to the day).
    */
  def rebin(binned: DataFrame, floorBin: Column => Column): DataFrame =
    binned
      .groupBy(col(K), floorBin(col("bin_start")).as("bin_start"), col(V))
      .agg(sum(col("weight")).as("weight"))

  /** Uniform-µs floor from an origin — per-row, codegen'd, used for the
    * hour→day→week cascades (UTC, fixed-width units). */
  def floorTo(step: Long, origin: Long = 0L): Column => Column =
    c => (floor((c - origin) / lit(step)) * step + origin).cast("long")

  /** Monday-aligned week floor in epoch µs (epoch day 0 = Thursday, so
    * shift by 4 days  — matches date_trunc('week') in UTC). */
  def floorWeek: Column => Column = {
    val shift = 4L * CalendarFloor.DAY
    c => (floor((c - shift) / lit(CalendarFloor.WEEK)) * CalendarFloor.WEEK + shift).cast("long")
  }

  /** Calendar-month floor in epoch µs (UTC session TZ) — months are
    * irregular (28-31 days), so unlike the fixed-step tiers this floor
    * goes through the builtin calendar truncation rather than integer
    * division; still per-row and codegen'd. */
  def floorMonth: Column => Column =
    c => unix_micros(date_trunc("month", timestamp_micros(c)))

  /** Rolled-up point statistics per bin — the tier table schema of the
    * north rule: per (key, bin): n points, time-weighted mean, min, max,
    * coverage µs. Derived from the same split-segment pass as [[bin]].
    */
  def tierStats(
      df: DataFrame,
      startUs: Long,
      endUs: Long,
      stepUs: Long,
      default: Column = lit(null).cast("double")): DataFrame = {
    val segs = SeriesOps.segmentsInRange(df, lit(startUs), lit(endUs), default)
    val cells = Regularize.splitAtCells(segs, lit(startUs), lit(stepUs))
    val dur = (col("t1") - col("t0")).cast("double")
    cells
      .groupBy(col(K), col("cell_start").as("bin_start"))
      .agg(
        sum(when(col(V).isNotNull, col("t1") - col("t0"))).as("covered_us"),
        (sum(when(col(V).isNotNull, col(V) * dur)) /
          sum(when(col(V).isNotNull, dur))).as("twa_mean"),
        min(col(V)).as("min"),
        max(col(V)).as("max"),
        count(when(col("p0") === col("t0"), 1)).as("n_points"))
  }

  /** Rebin tierStats rows into coarser calendar bins (the stats-table
    * counterpart of [[rebin]]; twa_mean recombines coverage-weighted). */
  def rebinStats(stats: DataFrame, floorBin: Column => Column): DataFrame =
    stats
      .groupBy(col(K), floorBin(col("bin_start")).as("bin_start"))
      .agg(
        sum("covered_us").as("covered_us"),
        (sum(col("twa_mean") * col("covered_us")) /
          sum(when(col("twa_mean").isNotNull, col("covered_us")))).as("twa_mean"),
        min("min").as("min"), max("max").as("max"),
        sum("n_points").as("n_points"))

  /** 24 duration-weighted distributions, one per hour of day (reference
    * `distribution_by_hour_of_day`, traces/timeseries.py:1641-1651): split
    * segments at hour boundaries, group by the UTC hour of each piece.
    * Output (key, hour, v, weight). */
  def distributionByHourOfDay(segs: DataFrame): DataFrame =
    Regularize
      .splitAtCells(segs, lit(0L), lit(CalendarFloor.HOUR))
      .groupBy(
        col(K),
        pmod(floor(col("cell_start") / CalendarFloor.HOUR), lit(24)).cast("int").as("hour"),
        col(V))
      .agg(sum(col("t1") - col("t0")).as("weight"))

  /** 7 distributions by day of week, Monday=0 (reference
    * `distribution_by_day_of_week`, traces/timeseries.py:1653-1663; epoch
    * day 0 = Thursday = weekday 3). Output (key, weekday, v, weight). */
  def distributionByDayOfWeek(segs: DataFrame): DataFrame =
    Regularize
      .splitAtCells(segs, lit(0L), lit(CalendarFloor.DAY))
      .groupBy(
        col(K),
        pmod(floor(col("cell_start") / CalendarFloor.DAY) + 3, lit(7)).cast("int").as("weekday"),
        col(V))
      .agg(sum(col("t1") - col("t0")).as("weight"))

  /** Calendar occupancy heatmap per key: event COUNT per (weekday, hour
    * of day) cell plus each cell's share of the key's total — the
    * "when does this series actually tick" fingerprint used for crawl
    * scheduling and load shaping (the count-based complement of the
    * duration-weighted [[distributionByHourOfDay]] /
    * [[distributionByDayOfWeek]] pair, same conventions: UTC hours,
    * Monday=0 via the epoch-day-0-is-Thursday shift). Output (key,
    * weekday, hour, n, share); share is ONE double division rounded to
    * 6 dp, every other column exact.
    *
    * Scale: one (key, weekday, hour) count aggregate with map-side
    * partials — at most 168 cells per key regardless of volume — and
    * the per-key total joins back off a second tiny aggregate rather
    * than a window so nothing ever sorts. */
  def calendarHeatmap(df: DataFrame): DataFrame = {
    val cells = df
      .groupBy(
        col(K),
        pmod(floor(col(T) / CalendarFloor.DAY) + 3, lit(7)).cast("int")
          .as("weekday"),
        pmod(floor(col(T) / CalendarFloor.HOUR), lit(24)).cast("int")
          .as("hour"))
      .agg(count(lit(1)).as("n"))
    val totals = cells.groupBy(col(K))
      .agg(sum(col("n")).as("_tot"))
      .select(col(K).as("_tk"), col("_tot"))
    cells.join(broadcast(totals), col(K) <=> col("_tk"))
      .select(col(K), col("weekday"), col("hour"), col("n"),
        round(col("n") / col("_tot").cast("double"), 6).as("share"))
  }

  /** OHLC bars per (key, bucket): open/high/low/close/count — the
    * finance-standard downsample, and the only tier in the battery that
    * is PURE SELECTION: no arithmetic at all, so no quantization or
    * rounding discipline is even needed (open/close pick by time,
    * high/low are max/min of the stored doubles). Input dedupes to one
    * value per (key, t) first (max — the SortedDict-overwrite loader
    * convention) so the by-time picks are unambiguous. Output (key,
    * bucket, open, high, low, close, n).
    *
    * Scale: ONE (key, bucket) hash aggregate with map-side partials —
    * min_by/max_by carry (t, v) pairs as constant state; the cheapest
    * possible tier shape, no window, no sort. */
  def ohlc(df: DataFrame, bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucket width $bucketUs must be positive")
    val pts = df.filter(col(V).isNotNull)
      .groupBy(col(K), col(T))
      .agg(max(col(V)).as(V))
      .withColumn("bucket", floor(col(T) / bucketUs).cast("long"))
    pts.groupBy(col(K), col("bucket"))
      .agg(min_by(col(V), col(T)).as("open"),
        max(col(V)).as("high"),
        min(col(V)).as("low"),
        max_by(col(V), col(T)).as("close"),
        count(lit(1)).as("n"))
  }

  /** Modal value per (key, bucket): the most frequent 1e-3-grid value,
    * ties to the SMALLEST value — the "dominant status per day" tier for
    * enum-like metrics where a mean is meaningless. Output (key, bucket,
    * mode_v, n_mode, n_total, n_distinct, share); everything is exact
    * integer counts/comparisons, one division for the share.
    *
    * Scale: two hash aggregates — (key, bucket, value) counts with
    * map-side combine (degenerate hot values collapse there), then one
    * struct-max per (key, bucket) with constant state. No windows. */
  def modeTier(df: DataFrame, bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucket width $bucketUs must be positive")
    val counts = df.filter(col(V).isNotNull)
      .groupBy(col(K), floor(col(T) / bucketUs).cast("long").as("bucket"),
        floor(col(V) * 1000 + 0.5).cast("long").as("_xq"))
      .agg(count(lit(1)).as("_c"))
    counts
      .groupBy(col(K), col("bucket"))
      .agg(sum(col("_c")).as("n_total"), count(lit(1)).as("n_distinct"),
        max(struct(col("_c").as("c"), (-col("_xq")).as("nx"))).as("_m"))
      .select(col(K), col("bucket"),
        ((-col("_m.nx")) / 1000.0).as("mode_v"),
        col("_m.c").as("n_mode"), col("n_total"), col("n_distinct"),
        round(col("_m.c") / col("n_total").cast("double"), 6).as("share"))
  }

  /** Hour-of-day seasonal index per key: each UTC hour's mean value as a
    * ratio to the key's overall mean — the multiplicative seasonal
    * profile a forecaster divides out before trending (the count-free
    * companion of [[calendarHeatmap]]; hours the key never ticks are
    * absent). Output (key, hour, n, hour_mean, seasonal_index); the
    * index is null when the overall mean is exactly zero (exact long
    * test). Means and index are fixed double expressions on exact 1e-3
    * long sums, reported via the floor-snap (ratios of integer sums can
    * land exactly on the 5e-7 rounding boundary).
    *
    * Scale: one (key, hour) aggregate (≤24 rows per key) + per-key
    * totals joined back broadcast — the [[calendarHeatmap]] shape. */
  def seasonalIndex(df: DataFrame): DataFrame = {
    val pts = df.filter(col(V).isNotNull)
      .withColumn("_x", floor(col(V) * 1000 + 0.5).cast("long"))
      .withColumn("hour",
        pmod(floor(col(T) / CalendarFloor.HOUR), lit(24)).cast("int"))
    val hours = pts.groupBy(col(K), col("hour"))
      .agg(count(lit(1)).as("n"), sum(col("_x")).as("_sh"))
    val totals = hours.groupBy(col(K))
      .agg(sum(col("n")).as("_nt"), sum(col("_sh")).as("_st"))
      .select(col(K).as("_tk"), col("_nt"), col("_st"))
    val hourMean = col("_sh").cast("double") / col("n")
    val overallMean = col("_st").cast("double") / col("_nt")
    hours.join(broadcast(totals), col(K) <=> col("_tk"))
      .select(col(K), col("hour"), col("n"),
        (floor(hourMean / 1000.0 * 1e6 + 0.5) / 1e6).as("hour_mean"),
        when(col("_st") =!= 0,
          floor(hourMean / overallMean * 1e6 + 0.5) / 1e6)
          .as("seasonal_index"))
  }

  /** Retention policy: given tier tables and a reference "now", keep raw
    * points for `rawKeepUs`, hourly bins for `hourlyKeepUs`, daily for
    * `dailyKeepUs`, weekly forever. Returns the filtered tiers; callers
    * overwrite storage partitions older than each horizon.
    */
  def applyRetention(
      raw: DataFrame,
      hourly: DataFrame,
      daily: DataFrame,
      weekly: DataFrame,
      nowUs: Long,
      rawKeepUs: Long,
      hourlyKeepUs: Long,
      dailyKeepUs: Long): (DataFrame, DataFrame, DataFrame, DataFrame) = (
    raw.filter(col(T) >= nowUs - rawKeepUs),
    hourly.filter(col("bin_start") >= nowUs - hourlyKeepUs),
    daily.filter(col("bin_start") >= nowUs - dailyKeepUs),
    weekly
  )

  /** Per-bin exact point-value percentiles — the monitoring-tier rollup
    * (p50/p95/p99 latency per hour). Point-based (every measurement
    * weighted once), complementing [[tierStats]]' time-weighted mean:
    * latency-style event values are samples of a process, not a step
    * function to integrate. Output one row per (key, bin, q):
    * (key, bin_start, n_points, q, value).
    *
    * Exact interpolated percentile (Spark's `percentile` aggregate —
    * rank q·(n−1) with linear interpolation, the same semantics as
    * DuckDB `quantile_cont` / numpy `linear`), all requested quantiles
    * computed by ONE aggregate pass over each bin. One shuffle on
    * (key, bin); per-group state is the bin's sample multiset — bounded
    * by bin width, never a key's full history, so a decade-long hot key
    * costs the same per bin as a cold one. At 100 TB the drop-in
    * scale escape is `percentile_approx` (t-digest, mergeable,
    * fixed-size state) in the same plan; the exact form is the one an
    * oracle can check bit-for-bit.
    *
    * Null-valued points carry no sample and are dropped UP FRONT (so
    * `n_points` counts measurements and an all-null bin emits nothing,
    * rather than `percentile` returning a null array that posexplode
    * silently swallows while n_points still counted the rows).
    */
  def tierPercentiles(
      df: DataFrame,
      startUs: Long,
      endUs: Long,
      stepUs: Long,
      qs: Seq[Double]): DataFrame = {
    require(stepUs > 0, s"bin width $stepUs must be positive")
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must be in [0,1]: $qs")
    val qArr = array(qs.map(lit): _*)
    df.filter(col(T) >= startUs && col(T) < endUs && col(V).isNotNull)
      .groupBy(col(K),
        (floor((col(T) - startUs) / stepUs) * stepUs + startUs)
          .cast("long").as("bin_start"))
      .agg(
        count(lit(1)).as("n_points"),
        percentile(col(V), qArr).as("_ps"))
      .select(col(K), col("bin_start"), col("n_points"),
        posexplode(col("_ps")))
      .select(col(K), col("bin_start"), col("n_points"),
        element_at(qArr, col("pos") + 1).as("q"),
        round(col("col"), 6).as("value"))
  }

  /** M4 downsampling (Jugel et al., "M4: A Visualization-Oriented Time
    * Series Data Aggregation", VLDB 2014 — public): per (key, pixel bin)
    * the first, last, min and max points, the four values that make a
    * line rendering of the bin pixel-exact at that resolution. Output
    * (key, bin_start, n_points, t_first, t_last, v_first, v_last,
    * v_min, v_max).
    *
    * Aggregate-only — min/max plus `min_by`/`max_by` ordered by the
    * deterministic (t, v) struct (ties at equal t break by value, so the
    * result is engine-independent). One shuffle on (key, bin) with
    * map-side partial aggregation: constant state per group, no window,
    * no sort — the cheapest possible 100 TB shape, and the reduction is
    * associative so AQE/combiners handle any bin-level skew. */
  def m4(df: DataFrame, startUs: Long, stepUs: Long): DataFrame = {
    require(stepUs > 0, s"bin width $stepUs must be positive")
    val ord = struct(col(T), col(V))
    df.groupBy(col(K),
        (floor((col(T) - startUs) / stepUs) * stepUs + startUs)
          .cast("long").as("bin_start"))
      .agg(
        count(lit(1)).as("n_points"),
        min(col(T)).as("t_first"),
        max(col(T)).as("t_last"),
        min_by(col(V), ord).as("v_first"),
        max_by(col(V), ord).as("v_last"),
        min(col(V)).as("v_min"),
        max(col(V)).as("v_max"))
  }

  /** Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013,
    * public), in the parallel fixed-anchor variant: every bucket keeps
    * the point maximizing the triangle area against the PREVIOUS and
    * NEXT buckets' mean points (the sequential original anchors on the
    * previously-selected point; anchoring on bucket means removes the
    * chain dependency so every bucket decides independently — the
    * standard distributed formulation). A key's first bucket keeps its
    * first point and its last bucket its last point (LTTB's fixed
    * endpoints); ties break by (t, v). Output (key, bin_start, t, v).
    *
    * Engine-exactness: the t-anchor is Σt/n on exact integer inputs
    * (one double division — identical in any engine, no rounding
    * step); the v-anchor is grid-snapped as floor(avg·1e6 + ½)/1e6
    * rather than round(avg, 6), whose half-up tie-break differs
    * between Spark (exact-binary BigDecimal) and multiply-based
    * engines (the Correlation.theilSen finding). The area is then a
    * fixed double expression on identical operands.
    *
    * Scale: one (key, bin) aggregate (the anchor table is |bins| rows —
    * the M4 shape), one per-key lag/lead window over bins (tiny), one
    * equi-join back to points, one per-(key, bin) top-1 window. The
    * top-1 sorts each bucket's points once; bucket width is the bound,
    * exactly like [[m4]]. */
  def lttb(df: DataFrame, startUs: Long, stepUs: Long): DataFrame = {
    require(stepUs > 0, s"bin width $stepUs must be positive")
    val bin = (floor((col(T) - startUs) / stepUs) * stepUs + startUs)
      .cast("long").as("bin_start")
    val pts = df.filter(col(V).isNotNull).select(col(K), bin, col(T), col(V))
    val anchors = pts.groupBy(col(K), col("bin_start"))
      .agg(sum(col(T)).as("_st"), count(lit(1)).as("_n"),
        (floor(avg(col(V)) * 1e6 + 0.5) / 1e6).as("_ay"))
      .withColumn("_ax", col("_st").cast("double") / col("_n"))
    val wb = Window.partitionBy(K).orderBy(col("bin_start"))
    val a2 = anchors.select(col(K).as("_ak"), col("bin_start").as("_ab"),
      lag(col("_ax"), 1).over(wb).as("_pax"),
      lag(col("_ay"), 1).over(wb).as("_pay"),
      lead(col("_ax"), 1).over(wb).as("_nax"),
      lead(col("_ay"), 1).over(wb).as("_nay"))
    // null-safe <=> on the key (repo convention)
    val j = pts.join(a2,
      pts(K) <=> a2("_ak") && pts("bin_start") === a2("_ab"))
    val area = abs(
      (col("_pax") - col("_nax")) * (col(V) - col("_pay")) -
      (col("_pax") - col(T)) * (col("_nay") - col("_pay")))
    val wp = Window.partitionBy(col(K), col("bin_start"))
    val rnArea = row_number().over(wp.orderBy(
      area.desc, col(T).asc, col(V).asc))
    val rnFirst = row_number().over(wp.orderBy(col(T).asc, col(V).asc))
    val rnLast = row_number().over(wp.orderBy(col(T).desc, col(V).desc))
    val keep = when(col("_pax").isNull, rnFirst === 1)      // first (or only) bucket
      .when(col("_nax").isNull, rnLast === 1)               // last bucket
      .otherwise(rnArea === 1)                              // interior: max area
    j.withColumn("_keep", keep)
      .filter(col("_keep"))
      .select(col(K), col("bin_start"), col(T), col(V))
  }

  /** SAX symbolic words (Lin et al. 2003, public), fixed-breakpoint
    * variant: per (key, `wordUs` window) the value series is reduced to
    * `wordUs / segUs` PAA segment means, each quantized into
    * `alphabet` equal-width symbols over [lo, hi) ('a', 'b', …; the
    * z-normalized Gaussian-breakpoint form trades engine-exactness for
    * scale invariance, so the tier pipeline uses the absolute grid —
    * same call as the grid histogram, q116). Segments with no points
    * render '_'. Output (key, word_start, word, n_segs) — identical
    * words across keys/windows are motif candidates, groupable
    * downstream by an equi-shuffle on the word itself.
    *
    * One (key, window, segment) aggregate then one (key, window)
    * aggregate assembling the word through an order-independent
    * segment→symbol map (collect order cannot matter). No windows, no
    * sorts — two hash exchanges, the cheapest shape. */
  def saxWords(
      df: DataFrame,
      wordUs: Long = 86400000000L,
      segUs: Long = 3L * 3600000000L,
      alphabet: Int = 4,
      lo: Double = 0.0,
      hi: Double = 500.0): DataFrame = {
    require(wordUs > 0 && segUs > 0 && wordUs % segUs == 0,
      s"word $wordUs must be a positive multiple of segment $segUs")
    require(alphabet >= 2 && alphabet <= 26 && hi > lo,
      "need 2..26 symbols and hi > lo")
    val nSegs = (wordUs / segUs).toInt
    val paa = df.filter(col(V).isNotNull)
      .groupBy(col(K),
        (floor(col(T) / wordUs) * wordUs).cast("long").as("word_start"),
        pmod(floor(col(T) / segUs), lit(nSegs.toLong)).cast("int").as("_seg"))
      // grid-snap via floor(x·1e6 + ½), not round(): engine-portable
      .agg((floor(avg(col(V)) * 1e6 + 0.5) / 1e6).as("_paa"))
    val sym = chr(lit(97) + least(lit(alphabet - 1), greatest(lit(0),
      floor((col("_paa") - lo) / ((hi - lo) / alphabet)))).cast("int"))
    paa.withColumn("_sym", sym)
      .groupBy(col(K), col("word_start"))
      .agg(
        map_from_entries(collect_list(struct(col("_seg"), col("_sym"))))
          .as("_m"),
        count(lit(1)).as("n_segs"))
      .select(col(K), col("word_start"),
        array_join(transform(sequence(lit(0), lit(nSegs - 1)),
          i => coalesce(element_at(col("_m"), i), lit("_"))), "").as("word"),
        col("n_segs"))
  }

  /** SAX discord per key (HOT-SAX's report shape, Keogh et al. 2005 —
    * public knowledge): the calendar word whose SAX symbol string is
    * RAREST within its key — the word-level anomaly/discord flag that
    * [[saxWords]]'s symbolization exists to enable. Ties break on
    * earliest word_start. All counting is exact integers over the
    * already-engine-exact word table, so the oracle extends the q121
    * SQL chain verbatim. Output (key, discord_start, word, n_occ,
    * n_words).
    *
    * Scale: one (key, word) count + one per-key argmin aggregate over
    * the word table (|keys|·|words| rows — already the downsampled
    * tier, never raw points). */
  def saxDiscord(df: DataFrame, wordUs: Long, segUs: Long, alphabet: Int,
      lo: Double, hi: Double): DataFrame = {
    val words = saxWords(df, wordUs, segUs, alphabet, lo, hi)
    val counts = words.groupBy(col(K), col("word"))
      .agg(count(lit(1)).as("n_occ"))
    words.join(counts, Seq(K, "word"))
      .groupBy(col(K))
      .agg(
        min(struct(col("n_occ"), col("word_start"), col("word"))).as("_d"),
        count(lit(1)).as("n_words"))
      .select(col(K), col("_d.word_start").as("discord_start"),
        col("_d.word").as("word"), col("_d.n_occ").as("n_occ"),
        col("n_words"))
  }

  /** Sequential RDP core over an integer-milli value sequence indexed
    * 1..n (bin index is the abscissa): returns the kept 1-based
    * indices. Split point = the interior point maximizing the SQUARED
    * cross product |seg × point| (ties → smallest index); a segment
    * splits when cross² > eps²·|seg|² — the perpendicular-distance
    * test with no division or sqrt, in exact BigInt arithmetic, so any
    * engine replays the selection bit-for-bit. */
  private[graft] def rdpKeep(xs: Array[Long], epsMilli: Long): Seq[Int] = {
    val n = xs.length
    if (n == 0) return Nil
    val keep = collection.mutable.SortedSet(1, n)
    val stack = collection.mutable.Stack((1, n))
    val eps2 = BigInt(epsMilli) * BigInt(epsMilli)
    while (stack.nonEmpty) {
      val (lo, hi) = stack.pop()
      if (hi - lo >= 2) {
        val di = BigInt(hi - lo)
        val dx = BigInt(xs(hi - 1) - xs(lo - 1))
        var bestI = -1
        var bestC2 = BigInt(-1)
        var i = lo + 1
        while (i < hi) {
          val cross = di * BigInt(xs(i - 1) - xs(lo - 1)) -
            dx * BigInt(i - lo)
          val c2 = cross * cross
          if (c2 > bestC2) { bestC2 = c2; bestI = i }
          i += 1
        }
        if (bestI >= 0 && bestC2 > eps2 * (di * di + dx * dx)) {
          keep += bestI
          stack.push((lo, bestI)); stack.push((bestI, hi))
        }
      }
    }
    keep.toSeq
  }

  /** Ramer–Douglas–Peucker polyline simplification per key over the
    * `binUs` mean-value grid (Ramer 1972 / Douglas & Peucker 1973 —
    * public knowledge): the error-bounded downsampler beside [[m4]]'s
    * extrema and [[lttb]]'s area heuristic — RDP GUARANTEES every
    * dropped point sits within `epsMilli`/1000 of the kept polyline.
    * Bin means are engine-exact (per-row 1e-3 quantization, one
    * deterministic integer-mean division — the dtwPairs convention);
    * the split rule is exact integer arithmetic ([[rdpKeep]]), so a
    * DuckDB recursive CTE over the segment frontier replays the kept
    * set hash-exactly.
    *
    * Scale shape: per-key-sequential / across-keys-parallel, same as
    * [[graft.events.Correlation.dtwPairs]] — the binned series is
    * bounded by `maxBins` (loud failure, never silent truncation), raw
    * point volume never enters the DP. Output
    * (key, i, bin_start, v) — the kept points in bin order. */
  def rdp(df: DataFrame, binUs: Long, epsMilli: Long,
      maxBins: Int = 65536): DataFrame = {
    require(binUs > 0, s"bin width $binUs must be positive")
    require(epsMilli >= 0, s"epsMilli $epsMilli must be >= 0")
    val spark = df.sparkSession
    import spark.implicits._
    val g = df.filter(col(V).isNotNull && col(K).isNotNull)
      .groupBy(col(K).cast("string").as(K),
        floor(col(T) / binUs).cast("long").as("_b"))
      .agg(sum(floor(col(V) * 1000 + 0.5)).as("_sx"), count(lit(1)).as("_nx"))
      .select(col(K), col("_b"),
        floor(col("_sx").cast("double") / col("_nx").cast("double") + 0.5)
          .cast("long").as("_x"))
    val seqs = g.groupBy(col(K))
      .agg(array_sort(collect_list(struct(col("_b"), col("_x")))).as("_s"))
      .withColumn("_s",
        when(size(col("_s")) <= maxBins, col("_s"))
          .otherwise(raise_error(concat(
            lit(s"rdp: binned series longer than maxBins=$maxBins for key "),
            col(K), lit("; widen binUs or raise maxBins")))))
      .as[(String, Seq[(Long, Long)])]
    seqs.flatMap { case (k, bx) =>
      val xs = bx.map(_._2).toArray
      rdpKeep(xs, epsMilli).map { i =>
        (k, i, bx(i - 1)._1 * binUs, xs(i - 1) / 1000.0)
      }
    }.toDF(K, "i", "bin_start", "v")
  }
}
