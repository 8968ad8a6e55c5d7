package graft.sources

import graft.core.SeriesOps.{K, T, V}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Series sources/sinks mirroring the reference's I/O surface
  * (traces/timeseries.py:1172-1397 `from_csv`, `from_json`, `to_json`),
  * re-expressed as Spark readers producing the canonical points schema
  * (key, t: long epoch-µs, v: double). Parquet/Iceberg is the production
  * persistence; these cover interchange formats.
  */
object Sources {

  /** CSV with a header, one series per file or a key column
    * (from_csv, traces/timeseries.py:1172-1239; default time format
    * `%Y-%m-%d %H:%M:%S`). */
  def fromCsv(
      spark: SparkSession,
      path: String,
      timeColumn: String,
      valueColumn: String,
      keyColumn: Option[String] = None,
      timeFormat: String = "yyyy-MM-dd HH:mm:ss"): DataFrame = {
    val raw = spark.read.option("header", "true").csv(path)
    val key = keyColumn.map(col).getOrElse(lit("csv"))
    raw.select(
      key.as(K),
      unix_micros(to_timestamp(col(timeColumn), timeFormat)).as(T),
      col(valueColumn).cast("double").as(V))
  }

  /** JSON list-of-records `[{"time": iso8601, "value": v}, ...]`
    * (from_json, traces/timeseries.py:1241-1333; `Z` suffix handled). */
  def fromJson(
      spark: SparkSession,
      path: String,
      timeKey: String = "time",
      valueKey: String = "value",
      keyColumn: Option[String] = None,
      multiLine: Boolean = true): DataFrame = {
    // multiLine=true parses a whole-file JSON array (the reference's
    // list-of-records form); multiLine=false parses JSON-lines (what
    // toJson/Spark writers emit)
    val raw = spark.read.option("multiLine", multiLine.toString).json(path)
    val key = keyColumn.map(col).getOrElse(lit("json"))
    raw.select(
      key.as(K),
      unix_micros(to_timestamp(regexp_replace(col(timeKey), "Z$", "+00:00"))).as(T),
      col(valueKey).cast("double").as(V))
  }

  /** to_json list format with ISO times (traces/timeseries.py:1335-1397). */
  def toJson(points: DataFrame, path: String): Unit =
    points
      .select(
        col(K),
        date_format(timestamp_micros(col(T)), "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").as("time"),
        col(V).as("value"))
      .write.mode("overwrite").json(path)
}
