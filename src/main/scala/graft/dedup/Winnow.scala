package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
  * SIGMOD 2003 — the MOSS algorithm; public knowledge): hash every
  * character k-gram, slide a w-gram window, and keep each window's
  * minimal hash. The guarantee the MinHash/SimHash shingle paths don't
  * give: ANY shared substring of at least w + k − 1 characters yields at
  * least one shared fingerprint, position-independently — the
  * plagiarism/boilerplate detection modality, complementing
  * [[Dedup]]'s probabilistic families with a deterministic one.
  *
  * Engine-exactness: gram hashes are the first 40 bits of md5 (the
  * repo's md5-grid convention, [[graft.sketch.Kmv.hash60]] shape), and
  * each (hash, position) pair packs into ONE long `h·2²⁰ + pos`, so the
  * per-window argmin with leftmost-on-tie ordering is a plain integer
  * minimum — bit-replayable in any engine (the oracle computes the same
  * mins as windowed SQL aggregates). Positions are bounded by 2²⁰
  * grams/doc (the pack's invariant — enforced with a loud failure,
  * never silent).
  *
  * Scale shape: the whole gram-hash + sliding-min pass runs INSIDE the
  * row as one linear typed-UDF scan (a designated UDF site beside the
  * Gorilla codec and holtScanUdf, SURVEY §4) — the k-gram blow-up
  * (|text| values per doc) never enters a shuffle; only the winnowed
  * fingerprints (expected density 2/(w+1) of grams) leave the row.
  * NOT an expression-HOF: `transform(windows, j -> array_min(slice(
  * grams, j, w)))` re-evaluates the O(n)-md5 gram subtree once per
  * window — O(n²) hashing, measured 880 s at sf0.1 — the same
  * lambda-recapture trap the round-2 MinHash signature hit (README
  * "Expression hygiene"). The UDF hashes each gram once and slides a
  * monotonic deque: O(n) total. The near-dup join downstream is a
  * capped bucketed equi-join on fingerprint hash, the same
  * never-all-pairs contract as every [[Dedup]] candidate generator.
  */
object Winnow {

  /** Pack bound: gram positions must stay strictly below 2²⁰. */
  val MaxGrams: Int = 1 << 20

  /** One linear pass: packed gram values h·2²⁰ + pos (pos 1-based),
    * then the per-window minimum via a monotonic deque — identical
    * output to min-of-each-w-slice with leftmost-min tie-break (packed
    * values are distinct, so the lexicographic (hash, pos) order IS the
    * packed order). n < w degenerates to one whole-array window. */
  private[graft] def winnowPacked(text: String, k: Int, w: Int): Array[Long] = {
    if (text == null) return Array.empty[Long]
    // iterate by CODE POINT, not UTF-16 unit, so grams match the oracle's
    // codepoint-based substr/length on astral-plane text (ADVICE r5); for
    // BMP-only text the offsets coincide and the output is unchanged
    val cps = {
      val b = new Array[Int](text.codePointCount(0, text.length) + 1)
      var ci = 0; var off = 0
      while (off < text.length) {
        b(ci) = off; ci += 1
        off += Character.charCount(text.codePointAt(off))
      }
      b(ci) = text.length
      b
    }
    val nCp = cps.length - 1
    val n = nCp - k + 1
    if (n < 1) return Array.empty[Long]
    require(n < MaxGrams,
      s"Winnow: document has $n grams >= $MaxGrams; raise k or pre-chunk")
    val md = java.security.MessageDigest.getInstance("MD5")
    val packed = new Array[Long](n)
    var i = 0
    while (i < n) {
      val d = md.digest(text.substring(cps(i), cps(i + k)).getBytes("UTF-8"))
      // first 10 hex chars of the digest = first 5 bytes, big-endian
      var h = 0L
      var b = 0
      while (b < 5) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      packed(i) = h * 1048576L + (i + 1)
      md.reset()
      i += 1
    }
    val out = collection.mutable.LinkedHashSet.empty[Long]
    if (n <= w) {
      var m = packed(0); i = 1
      while (i < n) { if (packed(i) < m) m = packed(i); i += 1 }
      out += m
    } else {
      val dq = new java.util.ArrayDeque[Int]()
      var e = 0
      while (e < n) {
        while (!dq.isEmpty && packed(dq.peekLast()) > packed(e)) dq.pollLast()
        dq.addLast(e)
        if (e >= w - 1) {
          while (dq.peekFirst() < e - w + 1) dq.pollFirst()
          out += packed(dq.peekFirst())
        }
        e += 1
      }
    }
    out.toArray
  }

  /** One row per (doc, fingerprint): (idCol, fp_pos, fp_hash) — fp_pos
    * is the 1-based gram position whose window selected it. Docs with
    * fewer than k chars emit nothing. */
  def fingerprints(docs: DataFrame, k: Int = 8, w: Int = 16,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k >= 1 && w >= 1, s"k $k and w $w must be >= 1")
    val fpUdf = udf((text: String) => winnowPacked(text, k, w))
    docs
      .select(col(idCol), explode(fpUdf(col(textCol))).as("_p"))
      .select(col(idCol),
        pmod(col("_p"), lit(1048576L)).cast("long").as("fp_pos"),
        // exact integer div, matching the oracle's `sel // 1048576`: the
        // double-division floor form could round packed values >= 2^53
        // with pos within 64 of the 2^20 boundary up to h+1 (ADVICE r5)
        expr("_p div 1048576").cast("long").as("fp_hash"))
  }

  /** Near-duplicate pairs by shared winnowed fingerprints — the MOSS
    * similarity report: docs sharing at least `minShared` distinct
    * fingerprint hashes, with the fingerprint-set Jaccard. Hashes
    * appearing in more than `maxDf` docs are boilerplate (headers,
    * license blocks) and are dropped BEFORE the pair join — the cap
    * that keeps the join's fan-out bounded at corpus scale (a hash in
    * d docs contributes d² pair rows; uncapped, one ubiquitous template
    * string would quadratically dominate the shuffle).
    * Output (doc_a, doc_b, n_shared, n_a, n_b, jaccard), doc_a < doc_b. */
  def nearDupPairs(docs: DataFrame, k: Int = 8, w: Int = 16,
      minShared: Int = 2, maxDf: Int = 50,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val fps = fingerprints(docs, k, w, idCol, textCol)
      .select(col(idCol), col("fp_hash")).distinct()
    val sizes = fps.groupBy(col(idCol)).agg(count(lit(1)).as("_sz"))
    val kept = fps.join(
      fps.groupBy(col("fp_hash")).agg(count(lit(1)).as("_df"))
        .filter(col("_df") <= maxDf),
      Seq("fp_hash"))
    val pairs = kept.select(col("fp_hash"), col(idCol).as("doc_a"))
      .join(kept.select(col("fp_hash"), col(idCol).as("doc_b")),
        Seq("fp_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    pairs
      .join(sizes.select(col(idCol).as("doc_a"), col("_sz").as("n_a")),
        Seq("doc_a"))
      .join(sizes.select(col(idCol).as("doc_b"), col("_sz").as("n_b")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        col("n_a"), col("n_b"),
        round(col("n_shared").cast("double") /
          (col("n_a") + col("n_b") - col("n_shared")), 6).as("jaccard"))
  }
}
