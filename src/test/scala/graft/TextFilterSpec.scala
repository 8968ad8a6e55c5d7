package graft

import graft.text.TextOps
import org.apache.spark.sql.functions._

/** PII redaction + Gopher repetition filters on hand-built texts with
  * known answers. */
class TextFilterSpec extends SparkSpec {

  private def one(text: String) = {
    val s = spark
    import s.implicits._
    Seq((1L, text)).toDF("doc_id", "text")
  }

  test("redactPii replaces emails, IPs and phone runs; email first") {
    val df = one("mail a.b+c@foo-bar.org or 192.168.1.200, call +4915123456789 now")
    val red = df.select(TextOps.redactPii(col("text"))).head().getString(0)
    assert(red == "mail <EMAIL> or <IP>, call <PHONE> now", red)
    val counts = TextOps.piiCounts(df)
      .select("n_emails", "n_ips", "n_phones").head()
    assert((counts.getInt(0), counts.getInt(1), counts.getInt(2)) == ((1, 1, 1)))
  }

  test("redactPii leaves clean text untouched and short digit runs alone") {
    val txt = "version 1.2.3 of thing costs +99 dollars at example.com shop"
    val red = one(txt).select(TextOps.redactPii(col("text"))).head().getString(0)
    // 1.2.3 is not 4 octets; +99 is under 9 digits; example.com has no @
    assert(red == txt, red)
  }

  test("repetitionFeatures: known 2-gram and line statistics") {
    // tokens: a b a b a -> 2-grams: "a b","b a","a b","b a" -> top 2/4
    val df = one("a b a b a")
    val r = TextOps.repetitionFeatures(df)
      .select("n_lines", "dup_line_frac", "total_2grams", "distinct_2grams",
        "top_2gram_frac", "dup_2gram_frac", "repetition_keep").head()
    assert(r.getInt(0) == 1)
    assert(r.getDouble(1) == 0.0)
    assert(r.getLong(2) == 4L && r.getLong(3) == 2L)
    assert(r.getDouble(4) == 0.5 && r.getDouble(5) == 0.5)
    assert(!r.getBoolean(6)) // top frac 0.5 > 0.2 -> filtered
  }

  test("repetitionFeatures: duplicate lines and the keep thresholds") {
    val df = one("x y z w\nx y z w\nq r s t\n")
    val r = TextOps.repetitionFeatures(df)
      .select("n_lines", "dup_line_frac", "repetition_keep").head()
    assert(r.getInt(0) == 3)
    assert(math.abs(r.getDouble(1) - 0.333333) < 1e-9, r.getDouble(1).toString)
    // dup_line_frac 0.33 > 0.3 -> filtered even though grams are unique
    assert(!r.getBoolean(2))
    val clean = TextOps.repetitionFeatures(one("all tokens here are fully distinct words"))
      .select("repetition_keep").head().getBoolean(0)
    assert(clean)
  }

  test("contamination counts benchmark shingle overlaps per doc") {
    val s = spark
    import s.implicits._
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    // doc 1 shares shingle "alpha beta gamma" + "beta gamma delta";
    // doc 2 shares none; doc 3 is a full copy (all shingles hit)
    val corpus = Seq(
      (1L, "zero alpha beta gamma delta"),
      (2L, "totally unrelated words here"),
      (3L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val got = graft.dedup.Dedup.contamination(corpus, bench)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getBoolean(4))))
      .toMap
    assert(got(1L) == ((3L, 2L, true)), got.toString)
    assert(got(2L) == ((2L, 0L, false)), got.toString)
    assert(got(3L) == ((2L, 2L, true)), got.toString)
  }

  test("repetitionFeatures: degenerate docs (empty, single token)") {
    val r = TextOps.repetitionFeatures(one("solo"))
      .select("total_2grams", "top_2gram_frac", "repetition_keep").head()
    assert(r.getLong(0) == 0L && r.getDouble(1) == 0.0 && r.getBoolean(2))
    val e = TextOps.repetitionFeatures(one(""))
      .select("n_lines", "dup_line_frac", "repetition_keep").head()
    assert(e.getInt(0) == 0 && e.getDouble(1) == 0.0 && e.getBoolean(2))
  }

  private def extract(html: String): String =
    one(html).select(graft.text.HtmlOps.extractText(col("text"))).head().getString(0)

  test("extractText strips head/script/style/comments/tags and keeps word boundaries") {
    val html = "<html><head><title>skip</title><style>p{}</style></head>" +
      "<body><h1>Hi</h1><p>one</p><p>two</p>" +
      "<SCRIPT type=\"x\">if(1<2){s=\"</div>\"}</SCRIPT>" +
      "<!-- note <b>bold</b> --><div   class='c'>three</div></body></html>"
    assert(extract(html) == "Hi one two three", extract(html))
  }

  test("extractText decodes entities, &amp; last (no double-decode)") {
    val html = "<p>a &lt;b&gt; &quot;c&quot; &#39;d&#39; &apos;e&apos;" +
      "&nbsp;f &amp; &amp;lt; g</p>"
    assert(extract(html) == "a <b> \"c\" 'd' 'e' f & &lt; g", extract(html))
  }

  test("extractText collapses whitespace runs, works on binary, null-safe") {
    val s = spark
    import s.implicits._
    val html = " <p> a\n\n b\t c </p> "
    assert(extract(html) == "a b c")
    val bin = Seq((1L, html.getBytes("UTF-8"))).toDF("doc_id", "html")
    assert(bin.select(graft.text.HtmlOps.extractText(col("html"))).head().getString(0)
      == "a b c")
    val nul = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
    assert(nul.select(graft.text.HtmlOps.extractText(col("text"))).head().isNullAt(0))
  }

  test("extractText: commented-out script opener never arms the script rule") {
    val html = "<!-- <script> disabled --><p>keep me</p><script>a()</script>"
    assert(extract(html) == "keep me", extract(html))
    // comment containing a closing head tag doesn't end head stripping early
    val h2 = "<head><!-- </head> --><title>x</title></head><body><p>body</p></body>"
    assert(extract(h2) == "body", extract(h2))
  }

  test("extractText recovers the synthetic pages invariant text") {
    val pages = graft.pipeline.Pages.synthPages(spark, 50L)
    val bad = pages.select(
      graft.text.HtmlOps.extractText(col("html")).as("e"), trim(col("text")).as("t"))
      .filter(col("e") =!= col("t"))
    assert(bad.count() == 0L)
  }
  test("BPE training replays the classic subword example with deterministic ties") {
    val s = spark
    import s.implicits._
    import graft.text.Bpe
    // Sennrich et al. 2016 vocabulary: low x5, lower x2, newest x6, widest x3
    val docs = Seq(
      (1L, Array.fill(5)("low").mkString(" ")),
      (2L, Array.fill(2)("lower").mkString(" ")),
      (3L, Array.fill(6)("newest").mkString(" ")),
      (4L, Array.fill(3)("widest").mkString(" "))).toDF("doc_id", "text")
    val m = Bpe.train(docs, 6).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(m == Seq(
      (1L, "e", "s", 9L), (2L, "es", "t", 9L), (3L, "est", "</w>", 9L),
      (4L, "l", "o", 7L), (5L, "lo", "w", 7L), (6L, "e", "w", 6L)), m.toString)
  }

  test("BPE greedy merge is left-to-right non-overlapping on doubled symbols") {
    val s = spark
    import s.implicits._
    import graft.text.Bpe
    val w = Bpe.wordTable(Seq((1L, "aaaa aaa")).toDF("doc_id", "text"))
    val out = Bpe.applyMerge(w, "a", "a").collect()
      .map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(out("aaaa") == Seq("aa", "aa", "</w>"), out.toString)
    assert(out("aaa") == Seq("aa", "a", "</w>"), out.toString)
  }
  test("BPE encode maps the classic example to the standard vocab layout") {
    val s = spark
    import s.implicits._
    import graft.text.Bpe
    val docs = Seq(
      (1L, Array.fill(5)("low").mkString(" ")),
      (2L, Array.fill(2)("lower").mkString(" ")),
      (3L, Array.fill(6)("newest").mkString(" ")),
      (4L, Array.fill(3)("widest").mkString(" "))).toDF("doc_id", "text")
    val enc = Bpe.encode(docs, 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
    // base vocab sorted: </w>=0 d=1 e=2 i=3 l=4 n=5 o=6 r=7 s=8 t=9 w=10;
    // merges: es=11 est=12 est</w>=13 lo=14 low=15 ew=16
    val low0 = enc.filter(x => x._1 == 1L && x._2 == 0L).sortBy(_._3)
    assert(low0.map(x => (x._4, x._5)).toSeq == Seq(("low", 15L), ("</w>", 0L)), low0.toSeq)
    val newest0 = enc.filter(x => x._1 == 3L && x._2 == 0L).sortBy(_._3)
    assert(newest0.map(x => (x._4, x._5)).toSeq
      == Seq(("n", 5L), ("ew", 16L), ("est</w>", 13L)), newest0.toSeq)
    // every word occurrence encodes: 5+2+6+3 words, stream lengths per word
    assert(enc.count(_._1 == 1L) == 5 * 2)
    assert(enc.count(_._1 == 3L) == 6 * 3)
  }

  // --- Gopher quality rules (Rae et al. 2021, Table A1) ---

  private def gopherOf(text: String, minWords: Int = 50) = {
    val r = TextOps.gopherRules(one(text), minWords = minWords)
      .select("n_words", "mean_word_len", "hash_ratio", "ellipsis_ratio",
        "bullet_frac", "ellipsis_line_frac", "alpha_word_frac", "stop_hits",
        "gopher_keep").head()
    (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3),
      r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getInt(7), r.getInt(8))
  }

  test("gopherRules: clean prose with required stop words keeps") {
    val (n, mwl, hr, er, bf, elf, awf, hits, keep) = gopherOf(
      "the quick brown fox jumps over that lazy dog with great style today",
      minWords = 10)
    assert(n == 13L && hits == 3, (n, hits)) // the, that, with
    assert(hr == 0.0 && er == 0.0 && bf == 0.0 && elf == 0.0)
    assert(awf == 1.0 && mwl > 3.0 && mwl < 10.0 && keep == 1, (mwl, keep))
  }

  test("gopherRules: word count, bullet and ellipsis-line gates") {
    // under minWords
    assert(gopherOf("the short one with few words", minWords = 10)._9 == 0)
    // 2 of 3 lines are bullets -> frac 0.666667 <= 0.9 passes the published
    // default, but the words are fine so only the bullet signal moves
    val bulleted = "the first line has that normal prose text with words\n" +
      "• bullet one\n• bullet two"
    val b = gopherOf(bulleted, minWords = 10)
    assert(b._5 == 0.666667 && b._9 == 1, b)
    // every line ends with ellipsis -> ellipsis_line_frac 1.0 > 0.3 rejects
    val trailing = "the thought with that trails away here..." +
      "\nanother trailing thought of mine..."
    val t = gopherOf(trailing, minWords = 10)
    assert(t._6 == 1.0 && t._9 == 0, t)
  }

  test("gopherRules: symbol ratios and alpha-word fraction") {
    // 8 hash chars over 11 words -> 0.727273 > 0.1 rejects
    val hashy = "the heading #### with that marker #### stays loud here today"
    val h = gopherOf(hashy, minWords = 10)
    assert(h._3 == round6(8.0 / 11) && h._9 == 0, h)
    // numeric soup: 8 of 12 words lack alphabetic chars -> 0.333333 < 0.8
    val nums = "the 11 22 33 44 55 66 77 88 of that table"
    val a = gopherOf(nums, minWords = 10)
    assert(a._7 == round6(4.0 / 12) && a._9 == 0, a)
    // stop-hit gate: alpha prose but only one required stop word
    assert(gopherOf("the wordy prose keeps rolling forward nicely without pause anywhere",
      minWords = 5)._9 == 0)
  }

  test("gopherRules: degenerate inputs are zero-safe") {
    val (n, mwl, hr, er, bf, elf, awf, hits, keep) = gopherOf("")
    assert(n == 0L && mwl == 0.0 && hr == 0.0 && er == 0.0 && bf == 0.0
      && elf == 0.0 && awf == 0.0 && hits == 0 && keep == 0)
  }

  private def round6(x: Double): Double = math.rint(x * 1e6) / 1e6

  // --- C4 heuristic page cleaning ---

  private def c4Of(text: String) = {
    val r = TextOps.c4Clean(one(text))
      .select("n_lines", "n_kept", "n_sentences", "keep", "clean_digest").head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getString(4))
  }

  test("c4Clean line gates: terminal punct, min words, javascript; page sentence gate") {
    val (nLines, nKept, nSent, keep, digest) = c4Of(
      "This is a good sentence with many words.\n" +
        "short line.\n" + // 2 words < 5
        "This line has no terminal punct\n" +
        "Please enable JavaScript to view this page.\n" + // word gate passes, js gate drops
        "Another proper sentence with enough words here!")
    assert(nLines == 5L && nKept == 2L && nSent == 2L, (nLines, nKept, nSent))
    assert(keep == 0) // 2 sentence enders < 3
    val clean = "This is a good sentence with many words.\n" +
      "Another proper sentence with enough words here!"
    assert(digest == java.security.MessageDigest.getInstance("MD5")
      .digest(clean.getBytes("UTF-8")).map("%02x".format(_)).mkString)
  }

  test("c4Clean keeps a page with three proper sentences, quote-ended lines count") {
    val (_, nKept, nSent, keep, _) = c4Of(
      "The first proper sentence has plenty of words.\n" +
        "He said the second line ends with a \"quoted phrase.\"\n" +
        "A third full sentence closes out the page today!")
    assert(nKept == 3L && nSent == 3L && keep == 1, (nKept, nSent, keep))
  }

  test("c4Clean page gates: lorem ipsum and curly brace reject the page") {
    val good = "One proper sentence with enough words inside.\n" +
      "Two proper sentences with enough words inside.\n" +
      "Three proper sentences with enough words inside."
    assert(c4Of(good)._4 == 1)
    assert(c4Of(good + "\nAlso some Lorem Ipsum filler text appears.")._4 == 0)
    assert(c4Of(good + "\nfunction f() { return 1; }")._4 == 0)
  }

  test("c4Clean degenerate inputs: empty text and whitespace-only lines") {
    val (nLines, nKept, nSent, keep, digest) = c4Of("")
    assert(nLines == 0L && nKept == 0L && nSent == 0L && keep == 0)
    assert(digest == "d41d8cd98f00b204e9800998ecf8427e") // md5("")
    assert(c4Of("   \n\n  \n")._1 == 0L) // trimmed-empty lines don't count
  }

  test("chunkOverlap: starts every stride, full coverage, short tail") {
    // 10 tokens, window 4, stride 3 -> starts 0,3,6,9: sizes 4,4,4,1
    val df = one((1 to 10).map(i => s"w$i").mkString(" "))
    val out = TextOps.chunkOverlap(df, window = 4, stride = 3)
      .orderBy("chunk_idx").collect()
      .map(r => (r.getLong(1), r.getInt(2))).toSeq
    assert(out == Seq((0L, 4), (1L, 4), (2L, 4), (3L, 1)))
  }

  test("chunkOverlap: consecutive chunks overlap by window - stride") {
    val s = spark; import s.implicits._
    val df = one((1 to 9).map(i => s"w$i").mkString("  ")) // messy spacing
    val chunks = TextOps.chunkOverlap(df, window = 4, stride = 3)
    // re-derive the windows to check the digests are of the right text
    val exp = Seq("w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9")
    val expMd5 = exp.map(t => java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    assert(chunks.orderBy("chunk_idx").collect().map(_.getString(3)).toSeq
      == expMd5)
  }

  test("chunkOverlap: one short doc = one chunk; empty doc drops") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "only two"), (2L, "   ")).toDF("doc_id", "text")
    val out = TextOps.chunkOverlap(df, window = 64, stride = 48).collect()
    assert(out.length == 1 && out.head.getLong(0) == 1L
      && out.head.getInt(2) == 2)
  }
}
