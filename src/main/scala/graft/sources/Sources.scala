package graft.sources

import graft.core.SeriesOps.{K, T, V}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    * `%Y-%m-%d %H:%M:%S`).
    *
    * `timeTransform`/`valueTransform` mirror the reference's
    * `time_transform`/`value_transform` callables (timeseries.py:
    * 1178-1235): arbitrary per-column Column functions applied to the RAW
    * string columns IN PLACE OF the default parses. The result of
    * timeTransform is cast to the canonical long epoch-µs time;
    * valueTransform's to double. */
  def fromCsv(
      spark: SparkSession,
      path: String,
      timeColumn: String,
      valueColumn: String,
      keyColumn: Option[String] = None,
      timeFormat: String = "yyyy-MM-dd HH:mm:ss",
      timeTransform: Option[Column => Column] = None,
      valueTransform: Option[Column => Column] = None): DataFrame = {
    val raw = spark.read.option("header", "true").csv(path)
    val key = keyColumn.map(col).getOrElse(lit("csv"))
    val t = timeTransform.map(f => f(col(timeColumn)).cast("long"))
      .getOrElse(unix_micros(to_timestamp(col(timeColumn), timeFormat)))
    val v = valueTransform.map(f => f(col(valueColumn)).cast("double"))
      .getOrElse(col(valueColumn).cast("double"))
    raw.select(key.as(K), t.as(T), v.as(V))
  }

  /** JSON list-of-records `[{"time": iso8601, "value": v}, ...]`
    * (from_json, traces/timeseries.py:1241-1333; `Z` suffix handled).
    * `timeTransform`/`valueTransform` as in [[fromCsv]] (the reference's
    * from_json takes the same pair, timeseries.py:1248-1299). */
  def fromJson(
      spark: SparkSession,
      path: String,
      timeKey: String = "time",
      valueKey: String = "value",
      keyColumn: Option[String] = None,
      multiLine: Boolean = true,
      timeTransform: Option[Column => Column] = None,
      valueTransform: Option[Column => Column] = None): DataFrame = {
    // multiLine=true parses a whole-file JSON array (the reference's
    // list-of-records form); multiLine=false parses JSON-lines (what
    // toJson/Spark writers emit)
    val raw = spark.read.option("multiLine", multiLine.toString).json(path)
    val key = keyColumn.map(col).getOrElse(lit("json"))
    val t = timeTransform.map(f => f(col(timeKey)).cast("long"))
      .getOrElse(unix_micros(to_timestamp(regexp_replace(col(timeKey), "Z$", "+00:00"))))
    val v = valueTransform.map(f => f(col(valueKey)).cast("double"))
      .getOrElse(col(valueKey).cast("double"))
    raw.select(key.as(K), t.as(T), v.as(V))
  }

  /** from_json dict form `{"t1": v1, "t2": v2, ...}` — the reference's
    * second accepted input shape (traces/timeseries.py:1322-1329) — as a
    * column transform: `jsonCol` holds one dict string per row (one row
    * per series), exploded into canonical (key, t, v) points. */
  def fromJsonDict(df: DataFrame, keyCol: String, jsonCol: String): DataFrame =
    df.select(col(keyCol).as(K),
        explode(from_json(col(jsonCol), org.apache.spark.sql.types.DataType.fromDDL("map<string,string>"))).as(Seq("_jt", "_jv")))
      .select(
        col(K),
        unix_micros(to_timestamp(regexp_replace(col("_jt"), "Z$", "+00:00"))).as(T),
        col("_jv").cast("double").as(V))

  /** from_json dict form from FILES: each file (or JSON-line) is one
    * `{"key": k, "series": {t: v, ...}}` record, mirroring the reference's
    * single-object file (traces/timeseries.py:1322-1329) keyed for the
    * multi-series table. */
  def fromJsonDictFile(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .schema("key STRING, series STRING")
      .option("multiLine", "false")
      .json(path)
    fromJsonDict(raw, "key", "series")
  }

  /** to_json(dict_format=True) (traces/timeseries.py:1381-1385): one JSON
    * object `{"t1": v1, ...}` per series, times ISO-formatted, entries in
    * time order (the reference iterates the sorted dict). Returns
    * (key, series) — the whole series renders as ONE string, exactly like
    * the reference's in-memory dict; write with `toJsonDictFile`. */
  def toJsonDict(points: DataFrame): DataFrame =
    points
      .select(col(K),
        date_format(timestamp_micros(col(T)), "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").as("_ts"),
        col(V))
      .groupBy(col(K))
      .agg(to_json(map_from_entries(array_sort(collect_list(struct(col("_ts"), col(V))))))
        .as("series"))

  def toJsonDictFile(points: DataFrame, path: String): Unit =
    toJsonDict(points).write.mode("overwrite").json(path)

  /** to_json list format with ISO times (traces/timeseries.py:1335-1397).
    * `timeTransform`/`valueTransform` mirror the reference's export-side
    * callables (timeseries.py:1358-1380): applied to the canonical t/v
    * columns IN PLACE OF the default ISO formatting / identity — e.g.
    * `timeTransform = Some(c => c / 1000000L)` exports epoch seconds like
    * the docstring's `lambda dt: dt.timestamp()`. */
  def toJson(points: DataFrame, path: String,
      timeTransform: Option[Column => Column] = None,
      valueTransform: Option[Column => Column] = None): Unit = {
    val t = timeTransform.map(f => f(col(T))).getOrElse(
      date_format(timestamp_micros(col(T)), "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"))
    val v = valueTransform.map(f => f(col(V))).getOrElse(col(V))
    points
      .select(col(K), t.as("time"), v.as("value"))
      .write.mode("overwrite").json(path)
  }
}
