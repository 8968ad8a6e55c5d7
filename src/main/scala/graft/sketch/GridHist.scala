package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-grid histogram sketch: per group, counts over nBins equal-width
  * value bins spanning [lo, hi) (out-of-range values clamp to the edge
  * bins — a monitoring tier wants "off the chart", not a dropped
  * sample). The MERGEABLE quantile tier: like [[CountMin]] the sketch
  * is LINEAR, so hourly→daily is a lossless cell-wise sum — the
  * continuous-aggregate property [[graft.rollup.Rollup.tierPercentiles]]
  * cannot offer (its exact per-bin state is the raw samples). Accuracy
  * is bounded by bin width, the classic sketch-vs-exact trade.
  *
  * Quantile read-out: target rank q·n against the cumulative counts;
  * the estimate interpolates linearly inside the first bin whose
  * cumulative reaches the target. Every step is plain IEEE double
  * arithmetic on md5-free inputs, so the DuckDB oracle replays
  * sketches, merges and estimates bit-for-bit.
  *
  * Scale: the sketch is one hash aggregate with ≤ nBins rows of state
  * per group (map-side combine absorbs hot values); quantile read-out
  * windows over ≤ nBins rows per group — never over raw data.
  */
object GridHist {

  private def binOf(v: Column, lo: Double, hi: Double, nBins: Int): Column = {
    val width = (hi - lo) / nBins
    greatest(lit(0L), least(lit(nBins - 1L),
      floor((v - lo) / width).cast("long")))
  }

  /** Histogram rows (groupCols*, bin, cnt); empty bins are absent. */
  def sketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
      lo: Double, hi: Double, nBins: Int): DataFrame = {
    require(nBins >= 1, s"nBins=$nBins must be >= 1")
    require(hi > lo, s"range [$lo, $hi) must be non-empty")
    df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ binOf(col(valueCol), lo, hi, nBins).as("bin"): _*)
      .groupBy(groupCols.map(col) :+ col("bin"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Lossless merge to a coarser key by linearity: bin-wise sum. */
  def merge(sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    sketches.groupBy(groupCols.map(col) :+ col("bin"): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Quantile estimates from sketch rows: for each q, the first bin
    * whose cumulative count reaches q·n, linearly interpolated inside
    * the bin. Output (groupCols*, q, est), est rounded to the 1e-6
    * grid. q = 0 reads the first occupied bin's lower edge; q = 1 the
    * last occupied bin's upper edge. */
  def quantiles(sk: DataFrame, groupCols: Seq[String], qs: Seq[Double],
      lo: Double, hi: Double, nBins: Int): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1),
      s"quantiles $qs must lie in [0, 1]")
    val width = (hi - lo) / nBins
    val wCum = Window.partitionBy(groupCols.map(col): _*).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    val withCum = sk
      .withColumn("_cum", sum(col("cnt")).over(wCum))
      .withColumn("_n", sum(col("cnt")).over(wAll))
      .withColumn("q", explode(array(qs.map(lit): _*)))
      .withColumn("_target", col("q") * col("_n"))
      .filter(col("_cum") >= col("_target"))
    val est = lit(lo) + lit(width) *
      (col("bin") + (col("_target") - (col("_cum") - col("cnt"))) / col("cnt"))
    withCum
      .groupBy((groupCols :+ "q").map(col): _*)
      .agg(round(min_by(est, col("bin")), 6).as("est"))
  }
}
