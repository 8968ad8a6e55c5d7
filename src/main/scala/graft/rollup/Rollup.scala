package graft.rollup

import graft.core.SeriesOps
import graft.core.SeriesOps.{K, T, V}
import graft.regularize.{CalendarFloor, Regularize}
import org.apache.spark.sql.{Column, DataFrame}
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
}
