package graft.regularize

import graft.core.SeriesOps._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regularization / resampling: evenly-spaced grids over unevenly-spaced
  * series (reference traces/timeseries.py:592-817 `sample`,
  * `sample_interval`, `moving_average`; :831-866 `bin`; :819-829 `rebin`).
  *
  * Design for scale: the grid (time axis) is generated once and broadcast;
  * the per-key expansion happens distributed via crossJoin with the key
  * universe. As-of sampling uses the union-then-window idiom (no as-of join
  * exists in OSS Spark; a sorted window after one shuffle is equivalent and
  * AQE-friendly). Moving averages use a *bucketed* range join: both sides
  * are assigned window-width time buckets so the join is an equi-join on
  * (key, bucket) — never an unbounded per-key cartesian.
  */
object Regularize {

  /** Driver-side grid mirroring the reference's accumulation loop
    * (`while current <= end: ... current += period`,
    * traces/timeseries.py:606-613) — bitwise-identical grid times.
    */
  def gridLongs(start: Long, end: Long, period: Long): Seq[Long] = {
    require(period > 0 && period <= end - start,
      s"sampling period $period not in (0, ${end - start}]") // timeseries.py:559-590
    val b = Seq.newBuilder[Long]
    var cur = start
    while (cur <= end) { b += cur; cur += period }
    b.result()
  }

  def gridDoubles(start: Double, end: Double, period: Double): Seq[Double] = {
    require(period > 0 && period <= end - start,
      s"sampling period $period not in (0, ${end - start}]")
    val b = Seq.newBuilder[Double]
    var cur = start
    while (cur <= end) { b += cur; cur += period }
    b.result()
  }

  /** keys × broadcast time axis -> probe rows (key, t). */
  def gridDf(keys: DataFrame, times: DataFrame): DataFrame =
    keys.select(col(K)).distinct().crossJoin(broadcast(times.select(col(T))))

  /** Point-sample the step function at probe times (key, t) with
    * "previous" interpolation: union-then-window as-of. A measurement
    * exactly at the probe time counts (bisect_right semantics,
    * traces/timeseries.py:91-110). Output (key, t, v).
    */
  def samplePrevious(df: DataFrame, probes: DataFrame, default: Column): DataFrame = {
    val data = df.select(col(K), col(T), col(V)).withColumn("_g", lit(0))
    val probe = probes
      .select(col(K), col(T))
      .withColumn(V, lit(null).cast("double"))
      .withColumn("_g", lit(1))
    val w = Window
      .partitionBy(K)
      .orderBy(col(T).asc, col("_g").asc) // data sorts before probes at equal t
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    data
      .unionByName(probe)
      .withColumn("_s", last(when(col("_g") === 0, struct(col(V))), ignoreNulls = true).over(w))
      .filter(col("_g") === 1)
      .select(
        col(K), col(T),
        when(col("_s").isNull, default).otherwise(col("_s").getField(V)).as(V))
  }

  /** Point-sample with linear interpolation (traces/timeseries.py:78-89):
    * before first measurement -> default; after last -> last value;
    * otherwise interpolate between bracketing measurements.
    */
  def sampleLinear(df: DataFrame, probes: DataFrame, default: Column): DataFrame = {
    val data = df.select(col(K), col(T), col(V)).withColumn("_g", lit(0))
    val probe = probes
      .select(col(K), col(T))
      .withColumn(V, lit(null).cast("double"))
      .withColumn("_g", lit(1))
    val ord = Window.partitionBy(K).orderBy(col(T).asc, col("_g").asc)
    val wPrev = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val dataStruct = when(col("_g") === 0, struct(col(T).as("pt"), col(V).as("pv")))
    val u = data
      .unionByName(probe)
      .withColumn("_p", last(dataStruct, ignoreNulls = true).over(wPrev))
      .withColumn("_n", first(dataStruct, ignoreNulls = true).over(wNext))
      .filter(col("_g") === 1)
    val pt = col("_p").getField("pt").cast("double")
    val pv = col("_p").getField("pv")
    val nt = col("_n").getField("pt").cast("double")
    val nv = col("_n").getField("pv")
    u.select(
      col(K), col(T),
      when(col("_p").isNull, default)          // before first measurement
        .when(col("_n").isNull, pv)            // after last -> last value
        .otherwise(pv + (col(T).cast("double") - pt) / (nt - pt) * (nv - pv))
        .as(V))
  }

  /** Split segments at the boundaries of uniform cells of width `period`
    * anchored at `origin`: one output row per (segment × overlapped cell)
    * with clipped t0/t1 and the cell index. Cells with zero overlap are
    * filtered. This is the distributed form of the reference's per-bucket
    * rescan in `bin`/`sample_interval` (traces/timeseries.py:616-745,
    * 831-866) — each segment is read once and exploded only into the cells
    * it actually covers.
    */
  def splitAtCells(segs: DataFrame, origin: Column, period: Column): DataFrame = {
    val c0 = floor((col("t0").cast("double") - origin.cast("double")) / period.cast("double")).cast("long")
    val c1 = floor((col("t1").cast("double") - origin.cast("double")) / period.cast("double")).cast("long")
    segs
      .withColumn("cell", explode(sequence(c0, c1)))
      .withColumn("cell_start", origin + col("cell") * period)
      .withColumn("cell_end", origin + (col("cell") + 1) * period)
      .withColumn("t0", greatest(col("t0"), col("cell_start")))
      .withColumn("t1", least(col("t1"), col("cell_end")))
      .filter(col("t1") > col("t0"))
  }

  /** Reference `sample_interval` (traces/timeseries.py:616-745): aggregate
    * the step function onto cells [b_i, b_{i+1}) of a uniform grid,
    * operation ∈ {mean, min, max}; the per-cell mean divides by the FULL
    * cell width (segments always cover the cell); empty cells (possible
    * only when the mask of covered cells has holes — with full segment
    * coverage there are none) forward-fill. Output (key, cell_start,
    * mean, min, max) for every cell.
    */
  def sampleInterval(
      df: DataFrame,
      start: Long,
      end: Long,
      period: Long,
      default: Column): DataFrame = {
    val boundaries = gridLongs(start, end, period)
    val lastBoundary = boundaries.last
    val segs = graft.core.SeriesOps.segmentsInRange(df, lit(start), lit(lastBoundary), default)
    val cells = splitAtCells(segs, lit(start), lit(period))
    val dur = (col("t1") - col("t0")).cast("double")
    cells
      .groupBy(col(K), col("cell_start"))
      .agg(
        (sum(col(V) * dur) / lit(period.toDouble)).as("mean"),
        min(col(V)).as("min"),
        max(col(V)).as("max"))
  }

  /** Reference `moving_average` (traces/timeseries.py:747-817): at each
    * grid time t, the time-weighted mean over [t-w/2, t+w/2] (center) /
    * [t, t+w] (left) / [t-w, t] (right). None-valued stretches are excluded
    * from the weighting; a window with no non-null coverage yields null.
    *
    * Implemented as a bucketed range join: windows and segments are both
    * assigned buckets of the window width, the join is an equi-join on
    * (key, bucket) plus overlap predicates, and each (window, segment)
    * pair is attributed to exactly one bucket (the one containing the
    * overlap start) so nothing double-counts. Skew-safe and shuffle-bounded
    * at any scale; never a per-key cartesian.
    */
  def movingAverage(
      df: DataFrame,
      gridTimes: Seq[Long],
      window: Long,
      placement: String,
      default: Column): DataFrame = {
    require(window > 0, "window_size must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val (wl, wr) = placement match {
      case "center" => (window / 2, window - window / 2)
      case "left"   => (0L, window)
      case "right"  => (window, 0L)
      case other    => throw new IllegalArgumentException(s"unknown placement '$other'")
    }
    val gstart = gridTimes.head - wl
    val gend = gridTimes.last + wr
    val segs = graft.core.SeriesOps
      .segmentsInRange(df, lit(gstart), lit(gend), default)
    val b = math.max(window, 1L)
    val grid = gridDf(df, gridTimes.toDF(T))
      .withColumn("ws", col(T) - wl)
      .withColumn("we", col(T) + wr)
      .withColumn("bkt", explode(array(floor(col("ws") / b), floor(col("we") / b))))
      .dropDuplicates(K, T, "bkt")
    val segB = segs.withColumn("bkt", explode(sequence(floor(col("t0") / b), floor(col("t1") / b))))
    val joined = grid
      .join(segB, Seq(K, "bkt"))
      .filter(col("t0") < col("we") && col("t1") > col("ws"))
      // attribute each (window, segment) pair to exactly one bucket
      .filter(col("bkt") === floor(greatest(col("t0"), col("ws")) / b))
      .withColumn("dur", (least(col("t1"), col("we")) - greatest(col("t0"), col("ws"))).cast("double"))
    joined
      .groupBy(col(K), col(T))
      .agg(
        (sum(when(col(V).isNotNull, col(V) * col("dur"))) /
          sum(when(col(V).isNotNull, col("dur")))).as("mean"))
  }
}
