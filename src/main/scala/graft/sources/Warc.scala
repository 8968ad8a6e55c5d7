package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** WARC (ISO 28500, the Common-Crawl container format) record synthesis
  * and header parsing — the step in front of the north-rule input table:
  * crawls arrive as WARC response records, and the ingest job parses them
  * into `(url, warc_ts, html)` rows (then [[graft.text.HtmlOps]] extracts
  * the text). Real WARC files are gzip-member-per-record; the member
  * framing is a file-source concern (Spark's binaryFile + a splittable
  * gzip reader in production) — what this module owns is the record
  * grammar, as pure codegen'd column expressions:
  *
  *   WARC/1.0\r\n
  *   WARC-Type: response\r\n
  *   WARC-Date: 2024-01-01T00:00:00Z\r\n
  *   WARC-Target-URI: https://…\r\n
  *   Content-Length: N\r\n
  *   \r\n
  *   <payload bytes>
  *
  * Both directions are deterministic and RE2-safe, so a DuckDB oracle
  * replays build → parse bit-for-bit (q83).
  */
object Warc {

  val dateFmt = "yyyy-MM-dd'T'HH:mm:ss'Z'"

  /** A WARC/1.0 response record (string column) for the given fields.
    * `ts` is a timestamp column; the date header renders in UTC. */
  def buildRecord(uri: Column, ts: Column, payload: Column): Column = {
    val crlf = lit("\r\n")
    concat(
      lit("WARC/1.0"), crlf,
      lit("WARC-Type: response"), crlf,
      lit("WARC-Date: "), date_format(ts, dateFmt), crlf,
      lit("WARC-Target-URI: "), uri, crlf,
      lit("Content-Length: "), length(payload.cast("binary")), crlf,
      crlf, payload)
  }

  private def header(rec: Column, name: String): Column =
    regexp_extract(rec, s"$name: ([^\\r\\n]+)", 1)

  /** Parsed fields of a record (string or binary column), as a struct:
    * (warc_type, uri, ts_us: long epoch-µs, content_length: long,
    * payload). Missing headers parse to ''/null — parse, don't throw:
    * a 10^12-record crawl always contains malformed members, and a
    * downstream filter on `warc_type` is the standard response-only cut. */
  def parseRecord(rec0: Column): Column = {
    val rec = rec0.cast("string")
    struct(
      header(rec, "WARC-Type").as("warc_type"),
      header(rec, "WARC-Target-URI").as("uri"),
      unix_micros(try_to_timestamp(header(rec, "WARC-Date"), lit(dateFmt))).as("ts_us"),
      header(rec, "Content-Length").try_cast("long").as("content_length"),
      regexp_extract(rec, "(?s)\\r\\n\\r\\n(.*)$", 1).as("payload"))
  }
}
