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

  /** Render pattern: UTC wall-clock with a literal Z (the WARC canonical
    * form). Parse pattern: XXX reads the Z (or any offset) as a real zone
    * designator, so ts_us is exact epoch-µs under ANY session time zone. */
  val dateFmtOut = "yyyy-MM-dd'T'HH:mm:ss'Z'"
  val dateFmtIn = "yyyy-MM-dd'T'HH:mm:ssXXX"

  /** A WARC/1.0 response record (string column) for the given fields.
    * `ts` is a timestamp column; the date header renders in UTC regardless
    * of the session time zone (shift-to-UTC before the zoneless format). */
  def buildRecord(uri: Column, ts: Column, payload: Column): Column = {
    val crlf = lit("\r\n")
    concat(
      lit("WARC/1.0"), crlf,
      lit("WARC-Type: response"), crlf,
      lit("WARC-Date: "),
      date_format(to_utc_timestamp(ts, current_timezone()), dateFmtOut), crlf,
      lit("WARC-Target-URI: "), uri, crlf,
      lit("Content-Length: "), length(payload.cast("binary")), crlf,
      crlf, payload)
  }

  private def header(hdr: Column, name: String): Column =
    regexp_extract(hdr, s"(?m)^$name: ([^\\r\\n]+)", 1)

  /** Parsed fields of a record (string or binary column), as a struct:
    * (warc_type, uri, ts_us: long epoch-µs, content_length: long,
    * payload). Headers are matched ONLY inside the block before the first
    * blank line — a payload is typically a full HTTP response whose own
    * `Content-Length:` must never stand in for a missing WARC header — and
    * anchored at line starts. Missing headers parse to ''/null — parse,
    * don't throw: a 10^12-record crawl always contains malformed members,
    * and a downstream filter on `warc_type` is the standard response-only
    * cut. */
  def parseRecord(rec0: Column): Column = {
    val rec = rec0.cast("string")
    // header block only; a record with no blank line is all headers
    val hdr = when(rec.contains("\r\n\r\n"),
      regexp_extract(rec, "(?s)^(.*?)\\r\\n\\r\\n", 1)).otherwise(rec)
    struct(
      header(hdr, "WARC-Type").as("warc_type"),
      header(hdr, "WARC-Target-URI").as("uri"),
      unix_micros(try_to_timestamp(header(hdr, "WARC-Date"), lit(dateFmtIn))).as("ts_us"),
      header(hdr, "Content-Length").try_cast("long").as("content_length"),
      regexp_extract(rec, "(?s)\\r\\n\\r\\n(.*)$", 1).as("payload"))
  }
}
