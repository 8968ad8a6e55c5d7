package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction: the ingest step of the north-rule pipeline
  * (`input_hint`: pages arrive as `(url, warc_ts, html: binary, text,
  * lang)` and the per-url invariant is over the EXTRACTED text). This is
  * the jusText/trafilatura-shaped core transform (public knowledge)
  * reduced to a deterministic, engine-portable regexp chain:
  *
  *   1. drop `<!-- comments -->` FIRST — a commented-out `<script>`
  *      opener (common in real pages) must never arm the script rule,
  *      which would otherwise swallow legitimate body text up to the
  *      next real `</script>`,
  *   2. drop `<head>…</head>` (title/meta/inline css+js are boilerplate),
  *   3. drop any remaining `<script>`/`<style>` blocks (body-embedded),
  *   4. every remaining tag → a single space (so `a</p><p>b` keeps its
  *      word boundary),
  *   5. decode the core entities — `&lt; &gt; &quot; &#39; &apos; &nbsp;`
  *      first, `&amp;` LAST so `&amp;lt;` correctly yields the literal
  *      `&lt;` rather than double-decoding to `<`,
  *   6. collapse runs of whitespace to one space and trim.
  *
  * Every step is a codegen'd `regexp_replace`/`replace` Column expression
  * — at 100 TB this runs inside the parquet scan projection, one pass per
  * row, nothing shuffled. Patterns are RE2-compatible (inline `(?is)`
  * flags, non-greedy spans, no lookarounds or backrefs) so DuckDB replays
  * the chain bit-for-bit (q81's oracle does exactly that).
  *
  * Declared limits (regexes, not a parser — same trade as WET extraction):
  * a literal `>` inside an attribute value ends that tag early, and
  * malformed nesting (`<script>` with no closer) drops to end-of-input.
  * Both fail toward dropping markup, never toward leaking it into text.
  */
object HtmlOps {

  /** (pattern, replacement) chain, in application order. Exposed so the
    * oracle-SQL builder renders the SAME chain for DuckDB. */
  val stripChain: Seq[(String, String)] = Seq(
    "(?s)<!--.*?-->" -> " ",
    "(?is)<head\\b[^>]*>.*?</head\\s*>" -> " ",
    "(?is)<script\\b[^>]*>.*?</script\\s*>" -> " ",
    "(?is)<style\\b[^>]*>.*?</style\\s*>" -> " ",
    "(?s)<[^>]*>" -> " ")

  /** Literal entity decodes, in application order (`&amp;` last). */
  val entityChain: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** Extracted visible text of an html document (string or binary column). */
  def extractText(html: Column): Column = {
    val stripped = stripChain.foldLeft(html.cast("string")) {
      case (c, (pat, rep)) => regexp_replace(c, lit(pat), lit(rep))
    }
    val decoded = entityChain.foldLeft(stripped) {
      case (c, (from, to)) => replace(c, lit(from), lit(to))
    }
    trim(regexp_replace(decoded, lit("\\s+"), lit(" ")))
  }

  /** The same chain as DuckDB SQL over an expression string (oracle side).
    * DuckDB's regexp_replace needs the explicit 'g' option where Spark's
    * is always-global; inline (?is) flags ride in the pattern for both. */
  def extractTextSql(expr: String): String = {
    def q(s: String) = "'" + s.replace("'", "''") + "'"
    val stripped = stripChain.foldLeft(expr) {
      case (e, (pat, rep)) => s"regexp_replace($e, ${q(pat)}, ${q(rep)}, 'g')"
    }
    val decoded = entityChain.foldLeft(stripped) {
      case (e, (from, to)) => s"replace($e, ${q(from)}, ${q(to)})"
    }
    s"trim(regexp_replace($decoded, '\\s+', ' ', 'g'))"
  }
}
