package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The north-rule ingest surface: a Common-Crawl-style pages table
  * (url: string, warc_ts: timestamp, html: binary, text: string,
  * lang: string) — BASELINE.json `input_hint`. In production this is an
  * Iceberg/Parquet table; here a deterministic synthetic generator of
  * exactly that shape (seeded, no external data) used for tests and
  * benches.
  *
  * Scale design notes:
  *  - `html` (the fat column) is never read by the pipeline: every
  *    downstream op selects only (url, warc_ts, text|value), so Parquet
  *    column pruning skips the binary bytes entirely.
  *  - urls are skewed across hot domains on purpose (pow-law-ish) to
  *    exercise salting/AQE paths.
  */
object Pages {

  /** Deterministic synthetic pages. Skew: domain d is hit ~1/(d+1) of the
    * time (hash-mod of a triangular index), so domain 0 is a hot key.
    * text is a pure function of url (the recrawl invariant: byte-identical
    * extracted text per url); warc_ts is unevenly spaced via a hash jitter.
    */
  def synthPages(spark: SparkSession, nRows: Long, nDomains: Int = 16, seed: Long = 42L): DataFrame = {
    val base = lit(1704067200000000L) // 2024-01-01 UTC in µs
    spark
      .range(nRows)
      .withColumn("_h", abs(xxhash64(col("id"), lit(seed))))
      // triangular skew: domain = number of set low bits, capped
      .withColumn("_dom", least(pmod(col("_h"), lit(nDomains * (nDomains + 1) / 2)), lit(nDomains - 1)))
      .withColumn("_dom", floor((sqrt(col("_dom") * 8 + 1) - 1) / 2).cast("int"))
      .withColumn("url",
        concat(lit("https://d"), col("_dom"), lit(".example.org/page/"),
          pmod(xxhash64(col("id"), lit(seed + 2)), lit(1000))))
      // crawl timestamps spread over a fixed 30-day window (dense enough
      // that the hourly gap-fill stays ~O(points), not O(keys × span))
      .withColumn("warc_ts_us",
        (base + pmod(xxhash64(col("id"), lit(seed + 1)), lit(30L * 86400000000L))).cast("long"))
      .withColumn("warc_ts", timestamp_micros(col("warc_ts_us")))
      .withColumn("text",
        concat(lit("Document for "), col("url"), lit(". "),
          repeat(concat(lit("word"), pmod(xxhash64(col("url")), lit(97)), lit(" ")),
            (pmod(xxhash64(col("url"), lit(1L)), lit(40)) + 5).cast("int"))))
      .withColumn("html",
        concat(lit("<html><head><title>t</title></head><body><p>"), col("text"),
          lit("</p></body></html>")).cast("binary"))
      .withColumn("lang",
        element_at(array(lit("en"), lit("de"), lit("fr"), lit("es")),
          (pmod(xxhash64(col("url"), lit(2L)), lit(4)) + 1).cast("int")))
      .select("url", "warc_ts", "html", "text", "lang", "warc_ts_us")
  }

  /** Deterministic text extraction from html — the per-row invariant the
    * north rule checks: extractText(html) must be byte-identical to `text`
    * for every url. (Strip tags; our generator wraps text in a fixed
    * template, so the inverse is exact.)
    */
  def extractText(html: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(
      regexp_replace(html.cast("string"), lit("^.*<body><p>"), lit("")),
      lit("</p></body></html>$"), lit(""))

  /** pages -> series points (key=url, t=µs, v): the measurement the rollup
    * tiers aggregate. Only (url, warc_ts, text) are read — html prunes
    * away at the scan. v is the extracted-text length plus a small
    * per-crawl component derived from (url, warc_ts): text itself is
    * byte-identical per url (the invariant), so a text-only measurement
    * would make every series constant and compaction degenerate; the
    * crawl-derived term keeps the value stream realistic (mostly-stable
    * with occasional changes) while staying a pure function of the
    * input schema.
    */
  def toSeries(pages: DataFrame): DataFrame = {
    val ts = if (pages.columns.contains("warc_ts_us")) col("warc_ts_us") else unix_micros(col("warc_ts"))
    pages.select(
      col("url").as("key"),
      ts.as("t"),
      (length(col("text")) + pmod(xxhash64(col("url"), ts), lit(16))).cast("double").as("v"))
  }
}
