package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + host/domain extraction — the first step of any
  * web-corpus pipeline (Common-Crawl dedup keys on canonical URL; domain
  * quotas and per-host stats key on the registered domain).
  *
  * The rules are deterministic and RE2-compatible (no lookarounds) so any
  * engine reproduces them byte-for-byte:
  *   1. fragment (`#...`) dropped;
  *   2. the `scheme://authority` prefix lowercased — path/query case kept;
  *   3. default ports dropped (`:80` for http, `:443` for https);
  *   4. a leading `www.` dropped;
  *   5. `utm_*` tracking params dropped FROM THE QUERY ONLY (a `&` or
  *      `utm_` inside the path is legal RFC 3986 path data and is kept),
  *      separator repaired — a surviving first param regains its `?`;
  *   6. one trailing `/` dropped from the PATH only (a `/` ending a query
  *      value is data).
  *
  * Pure scan-projection Column expressions: codegen'd, no UDF, no shuffle.
  * No public-suffix list ships here; [[registeredDomain]] takes the
  * multi-label suffixes it should honor as a parameter — at scale that
  * list is broadcast-small, which is exactly how a real PSL deploys.
  */
object UrlOps {

  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val prefix = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", 0)
    val rest = noFrag.substr(length(prefix) + 1, length(noFrag))
    val auth = regexp_replace(
      regexp_replace(
        regexp_replace(lower(prefix), "^(http://[^/:]+):80$", "$1"),
        "^(https://[^/:]+):443$", "$1"),
      "^(https?://)www\\.", "$1")
    val path = regexp_extract(rest, "^[^?]*", 0)
    val query = rest.substr(length(path) + 1, length(rest))
    val noUtm = regexp_replace(query, "[?&]utm_[A-Za-z_]+=[^&]*", "")
    val fixedSep = regexp_replace(noUtm, "^&", "?")
    concat(auth, regexp_replace(path, "/$", ""), fixedSep)
  }

  /** Host of an already-canonical URL (lowercased by canonicalizeUrl). */
  def hostOf(canonUrl: Column): Column =
    regexp_extract(canonUrl, "^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)

  /** Registered domain: last two labels, or last three when the host ends
    * in one of the given multi-label public suffixes; a dot-less host is
    * returned unchanged. */
  def registeredDomain(
      host: Column,
      multiLabelSuffixes: Seq[String] = Seq("co.uk", "com.au", "co.jp")): Column = {
    val twoLabel = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    val base = when(twoLabel === "", host).otherwise(twoLabel)
    multiLabelSuffixes.foldLeft(base) { (acc, sfx) =>
      val quoted = sfx.replace(".", "\\.")
      when(host.rlike("[^.]+\\." + quoted + "$"),
        regexp_extract(host, "([^.]+\\." + quoted + ")$", 1)).otherwise(acc)
    }
  }

  /** RefinedWeb/C4-style URL filtering (Penedo et al. 2023; the public
    * UT1-blocklist + weighted-subword scheme): hard block when the host is
    * on a blocklist; soft score = Σ weight over flagged words appearing as
    * substrings of the lowercased RAW url (RefinedWeb scores the raw url —
    * canonicalization may strip the offending query). Both parameter
    * tables are model state (the UT1 lists are a few MB — a broadcast in
    * the general deployment; as literals here they fold into the scan
    * projection, zero joins). The literal-fold sum is left-to-right, so
    * the score is bit-reproducible cross-engine.
    *
    * Returns struct(blocked, url_score, url_keep) with
    * url_keep = !blocked && score < threshold. */
  def urlFilter(
      rawUrl: Column,
      host: Column,
      blockedHosts: Seq[String],
      flaggedWords: Seq[(String, Double)],
      threshold: Double): Column = {
    require(flaggedWords.nonEmpty, "flaggedWords must be non-empty")
    val blocked = host.isin(blockedHosts: _*)
    val low = lower(rawUrl)
    val score = round(flaggedWords
      .map { case (w, wt) => when(low.contains(w), lit(wt)).otherwise(lit(0.0)) }
      .reduce(_ + _), 6)
    struct(
      blocked.as("blocked"),
      score.as("url_score"),
      // threshold compares the ROUNDED score so a last-ulp float sum can
      // never flip keep between engines
      (!blocked && score < threshold).as("url_keep"))
  }
}
