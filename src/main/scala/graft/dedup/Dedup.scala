package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for web-scale training data over a documents
  * table (doc_id, text, ...). Hashing is md5-based so results are engine-
  * independent (verifiable against any SQL oracle) and fully deterministic.
  *
  * Scale shapes:
  *  - exact: one groupBy on a 128-bit digest (never on raw text — the
  *    shuffle carries 16 bytes, not documents).
  *  - MinHash+LSH: shingle → NH minhashes → B bands; candidate pairs come
  *    from an equi-join on (band, band_hash) — no pairwise cross join ever
  *    happens; bucket sizes are bounded and AQE splits stragglers.
  *  - SimHash: 64 explode-free bit votes via column expressions.
  */
object Dedup {

  /** Word shingles (n-grams) from an already-materialized token-array
    * COLUMN — keep the tokenization in its own projection; a lambda that
    * captures a non-attribute expression re-evaluates it per element
    * (plan-audit finding: splitting the text once per shingle). */
  def shinglesOf(tk: Column, n: Int = 3): Column =
    array_distinct(transform(
      sequence(lit(0), greatest(size(tk) - n, lit(0))),
      i => concat_ws(" ", slice(tk, i + 1, lit(n)))))

  /** Word shingles (n-grams) of the text; a document with fewer than n
    * words contributes its whole token sequence as one shingle. */
  def shingles(text: Column, n: Int = 3): Column =
    shinglesOf(graft.text.TextOps.wsTokens(text), n)

  /** Exact dedup: survivor = min doc_id per md5(text); returns
    * (digest, survivor_id, group_size). */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .groupBy(md5(col(textCol).cast("binary")).as("digest"))
      .agg(min(col(idCol)).as("survivor_id"), count(lit(1)).as("group_size"))

  /** MinHash parameters: nh independent linear permutations
    * h_j(x) = (A_j·x + B_j) mod P over a 32-bit md5-derived base hash —
    * one md5 per shingle total (not per permutation), the rest is
    * codegen'd integer arithmetic; overflow-free in int64 so any SQL
    * engine reproduces it exactly. */
  final val MINHASH_P = 2305843009213693951L // 2^61 - 1
  def minhashA(j: Int): Long = 1000003L * (j + 1) * 2 + 1
  def minhashB(j: Int): Long = 7919L * (j + 1)

  /** explode-shingles → one md5 per shingle → 16 codegen'd min-aggregates
    * (partial+final). The signature join back to `docs` is on the id —
    * broadcastable when docs is small, shuffle-hash otherwise. This shape
    * costs exactly one pass over the shingles at any scale; the
    * alternative (16 array_min lambdas over one row) is interpreted and
    * duplicates the shingle pipeline per permutation (measured 60x slower).
    */
  def minhashSignature(docs: DataFrame, textCol: String = "text", nh: Int = 16, shingleN: Int = 3,
      idCol: String = "doc_id"): DataFrame = {
    // spread the tokenize/shingle/md5 work across cores first: a
    // single-file docs scan would otherwise compute every signature in one
    // task (measured: 0.8s serial at sf0.1)
    val ex = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol), graft.text.TextOps.wsTokens(col(textCol)).as("_tk"))
      .select(col(idCol), explode(shinglesOf(col("_tk"), shingleN)).as("_s"))
      .select(col(idCol),
        conv(substring(md5(col("_s").cast("binary")), 1, 8), 16, 10).cast("long").as("_x"))
    val aggs = (0 until nh).map { j =>
      min(pmod(col("_x") * minhashA(j) + minhashB(j), lit(MINHASH_P))).as(s"_mh$j")
    }
    ex.groupBy(col(idCol))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(idCol), array((0 until nh).map(j => col(s"_mh$j")): _*).as("sig"))
  }

  /** LSH bands: band b's key = the "|"-joined `rows` signature slots (a
    * plain equi-join key; no re-hash needed). Output: (doc_id, band,
    * band_hash). */
  def lshBands(signed: DataFrame, idCol: String = "doc_id", bands: Int = 4, rows: Int = 4): DataFrame = {
    val bandStructs = array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        concat_ws("|", slice(col("sig"), b * rows + 1, rows)).as("band_hash"))
    }: _*)
    signed
      .select(col(idCol), explode(bandStructs).as("bh"))
      .select(col(idCol), col("bh.band").as("band"), col("bh.band_hash").as("band_hash"))
  }

  /** Candidate near-duplicate pairs (a < b) sharing at least one LSH
    * band bucket. Buckets larger than `maxBucket` members are EXCLUDED
    * from pair generation: a degenerate bucket (e.g. millions of
    * boilerplate/empty docs sharing one band hash) would otherwise emit a
    * quadratic pair blowup inside one task. Members of such buckets are
    * either exact duplicates (already caught by [[exact]], which shuffles
    * 16-byte digests, never pairs) or need a cheaper grouping than
    * pairwise verification; audit them with [[lshOversizedBuckets]].
    */
  def minhashCandidates(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      nh: Int = 16, bands: Int = 4, shingleN: Int = 3, maxBucket: Int = 2000): DataFrame = {
    val bandsDf = lshBands(minhashSignature(docs, textCol, nh, shingleN, idCol), idCol, bands, nh / bands)
      .withColumn("_cnt",
        count(lit(1)).over(Window.partitionBy("band", "band_hash")))
      .filter(col("_cnt") <= maxBucket)
      .drop("_cnt")
    val l = bandsDf.select(col("band"), col("band_hash"), col(idCol).as("a"))
    val r = bandsDf.select(col("band"), col("band_hash"), col(idCol).as("b"))
    l.join(r, Seq("band", "band_hash"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** Audit of LSH buckets the `maxBucket` cap would drop: (band, band_hash,
    * n_docs). Emit/log this next to candidate generation so capped coverage
    * is visible, never silent. */
  def lshOversizedBuckets(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      nh: Int = 16, bands: Int = 4, shingleN: Int = 3, maxBucket: Int = 2000): DataFrame =
    lshBands(minhashSignature(docs, textCol, nh, shingleN, idCol), idCol, bands, nh / bands)
      .groupBy(col("band"), col("band_hash"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > maxBucket)

  /** Exact n-gram Jaccard similarity for given candidate pairs
    * (columns a, b): |shingles_a ∩ shingles_b| / |union|. */
  def ngramJaccard(docs: DataFrame, pairs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", shingleN: Int = 3): DataFrame = {
    val sh = docs
      .select(col(idCol), graft.text.TextOps.wsTokens(col(textCol)).as("_tk"))
      .select(col(idCol), shinglesOf(col("_tk"), shingleN).as("sh"))
    pairs
      .join(sh.select(col(idCol).as("a"), col("sh").as("sha")), Seq("a"))
      .join(sh.select(col(idCol).as("b"), col("sh").as("shb")), Seq("b"))
      .select(col("a"), col("b"),
        round(
          size(array_intersect(col("sha"), col("shb"))).cast("double") /
            size(array_union(col("sha"), col("shb"))), 6).as("jaccard"))
  }

  /** Benchmark-contamination check: for every corpus doc, how many of its
    * word shingles appear in the evaluation set's shingle vocabulary
    * (n-gram-overlap decontamination, the public GPT-3/PaLM appendix
    * method). Scale shape: the BENCHMARK side is small by definition —
    * its distinct shingles broadcast; the corpus side is one explode +
    * broadcast semi-probe + per-doc re-aggregation, no shuffle of text
    * and no corpus×benchmark join. Returns (idCol, n_shingles,
    * n_contaminated, contamination_frac, contaminated≥`flagAt`).
    */
  def contamination(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleN: Int = 3,
      flagAt: Int = 1): DataFrame = {
    val benchShingles = benchmark
      .select(explode(shingles(col(textCol), shingleN)).as("_s"))
      .distinct()
    val docShingles = corpus
      .select(col(idCol), graft.text.TextOps.wsTokens(col(textCol)).as("_tk"))
      .select(col(idCol), explode(shinglesOf(col("_tk"), shingleN)).as("_s"))
    docShingles
      .join(broadcast(benchShingles.withColumn("_hit", lit(1))), Seq("_s"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(coalesce(col("_hit"), lit(0))).as("n_contaminated"))
      .select(col(idCol), col("n_shingles"), col("n_contaminated"),
        round(col("n_contaminated").cast("double") / col("n_shingles"), 6)
          .as("contamination_frac"),
        (col("n_contaminated") >= flagAt).as("contaminated"))
  }

  /** [[contamination]] with a Bloom-filter prefilter — the 100 TB shape
    * when the evaluation set is too big to broadcast as a hash relation.
    * A benchmark of 10^9 distinct shingles is a ~30 GB broadcast hash
    * table (kills [[contamination]]'s broadcast semi-probe) but a ~1.2 GB
    * Bloom filter at 1% fpp: the filter is built distributedly
    * (`stat.bloomFilter` tree-aggregates per-partition bitsets; the driver
    * holds only the compact filter — declared model state, like the IVF
    * centroids), broadcast once, and probed map-side so only the tiny
    * surviving fraction of corpus shingles reaches the exact
    * verification join. Bloom filters have no false negatives and the
    * inner join removes the false positives, so the OUTPUT IS EXACTLY
    * [[contamination]]'s — the filter is purely a shuffle-volume knob,
    * which is what makes the result oracle-checkable. The membership
    * probe is a closure over the broadcast filter (a UDF, the third in
    * the engine): there is no public codegen expression over an opaque
    * 10^10-bit sketch, and the probe replaces a corpus-scale shuffle, the
    * one trade where an interpreted row hop is the cheap side.
    *
    * `verifyBroadcast=false` (the default) lets the verification join
    * shuffle on the shingle — at scale both sides are post-prune small
    * relative to the corpus but the benchmark side may still exceed
    * broadcast limits; AQE upgrades it to broadcast when it fits.
    */
  def contaminationBloom(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleN: Int = 3,
      flagAt: Int = 1,
      fpp: Double = 0.01,
      verifyBroadcast: Boolean = false): DataFrame = {
    val spark = corpus.sparkSession
    val benchShingles = benchmark
      .select(explode(shingles(col(textCol), shingleN)).as("_s"))
      .distinct()
    // model-build step: the count sizes the filter and the build is one
    // tree-aggregate — two driver-blocking jobs over the same
    // benchmark-shingle frame, so it is persisted across them and
    // released immediately after (lifecycle-managed, like Bench's; the
    // later verification join re-derives the frame lazily — one
    // recomputation instead of three, and no cache entry outlives the
    // call)
    benchShingles.persist()
    val bloom =
      try {
        val nBench = math.max(benchShingles.count(), 1L)
        benchShingles.stat.bloomFilter("_s", nBench, fpp)
      } finally benchShingles.unpersist()
    val bloomB = spark.sparkContext.broadcast(bloom)
    val mightContain = udf { s: String =>
      s != null && bloomB.value.mightContainString(s)
    }
    val perDoc = corpus
      .select(col(idCol), graft.text.TextOps.wsTokens(col(textCol)).as("_tk"))
      .select(col(idCol), shinglesOf(col("_tk"), shingleN).as("_sh"))
      .select(col(idCol), size(col("_sh")).cast("long").as("n_shingles"), col("_sh"))
    val survivors = perDoc
      .select(col(idCol), explode(col("_sh")).as("_s"))
      .filter(mightContain(col("_s")))
    val verifySide =
      if (verifyBroadcast) broadcast(benchShingles) else benchShingles
    val hits = survivors
      .join(verifySide, Seq("_s")) // inner: exact membership kills bloom FPs
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("_nc"))
    perDoc
      .select(col(idCol), col("n_shingles"))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), col("n_shingles"),
        coalesce(col("_nc"), lit(0L)).as("n_contaminated"),
        round(coalesce(col("_nc"), lit(0L)).cast("double") / col("n_shingles"), 6)
          .as("contamination_frac"),
        (coalesce(col("_nc"), lit(0L)) >= flagAt).as("contaminated"))
  }

  /** SimHash as a DataFrame op: token hashes materialized ONCE into a
    * column, then `bits` aggregate() passes over the in-row array (cheap;
    * no md5 duplication across bit positions). */
  def simhashDf(docs: DataFrame, textCol: String = "text", bits: Int = 32,
      idCol: String = "doc_id", outCol: String = "simhash"): DataFrame = {
    val withH = docs
      .select(col(idCol), graft.text.TextOps.wsTokens(col(textCol)).as("_tk"))
      .select(col(idCol),
        transform(col("_tk"), t =>
          conv(substring(md5(t.cast("binary")), 1, 8), 16, 10).cast("long")).as("_h"))
    val bitCols = (0 until bits).map { k =>
      val vote = aggregate(col("_h"), lit(0L),
        (acc, h) => acc + when(shiftright(h, k).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(vote > 0, shiftleft(lit(1L), k)).otherwise(lit(0L))
    }
    withH.select(col(idCol), bitCols.reduce(_ + _).as(outCol))
  }

  /** SimHash as a single Column (convenient for tiny inputs; prefer
    * [[simhashDf]] in pipelines — this form re-derives the token hashes
    * once per bit position). */
  def simhash(text: Column, bits: Int = 32): Column = {
    val toks = graft.text.TextOps.wsTokens(text)
    val hashed = transform(toks, t =>
      conv(substring(md5(t.cast("binary")), 1, 8), 16, 10).cast("long"))
    val bitCols = (0 until bits).map { k =>
      val vote = aggregate(hashed, lit(0L),
        (acc, h) => acc + when(shiftright(h, k).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(vote > 0, shiftleft(lit(1L), k)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** Hamming distance between two simhash fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Embedding cosine near-duplicate pairs above a threshold, restricted to
    * LSH-style buckets to avoid the cross join: bucket = sign bits of the
    * first `planes` dimensions (a crude but deterministic random-projection
    * LSH; real deployments use learned or random planes). */
  def embeddingNearDup(emb: DataFrame, idCol: String = "vec_id", vecCol: String = "embedding",
      threshold: Double = 0.9, planes: Int = 8): DataFrame = {
    val sig = (0 until planes).map { i =>
      when(element_at(col(vecCol), i + 1) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_ + _)
    val withSig = emb.select(col(idCol), col(vecCol), sig.as("bucket"))
    val l = withSig.select(col("bucket"), col(idCol).as("a"), col(vecCol).as("va"))
    val r = withSig.select(col("bucket"), col(idCol).as("b"), col(vecCol).as("vb"))
    l.join(r, Seq("bucket"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), graft.ann.Ann.cosine(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Signed-random-projection LSH near-duplicates (Charikar STOC'02, the
    * public SRP-LSH scheme): `bands` bands of `rowsPerBand` deterministic
    * seeded Gaussian hyperplanes; a pair is a candidate when it shares ALL
    * sign bits in AT LEAST ONE band (OR-amplification across bands recovers
    * the near-dups a single signature misses — the recall gap of
    * [[embeddingNearDup]]'s one axis-aligned signature), then exact cosine
    * verifies. Same scale shape as [[minhashCandidates]]: candidates come
    * from an equi-join on (band, signature) with an oversized-bucket cap,
    * never a cross join; the exact cosine runs on candidates only.
    *
    * The signature arithmetic is EXACT, not FP-tolerant: plane entries are
    * integer-valued (round(1000·gaussian)) and embedding elements quantize
    * to round(x·1024) — ·1024 is a power of two, so the scaled value is
    * computed exactly by any IEEE engine — making every sign bit (and thus
    * every bucket) bit-identical across engines; a SQL oracle can replay
    * the signatures verbatim (q58). The ~1e-3 relative quantization error
    * is far below the sign-resolution of a random projection. */
  def embeddingNearDupSRP(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", dim: Int, threshold: Double = 0.9,
      bands: Int = 8, rowsPerBand: Int = 4, seed: Long = 42L,
      maxBucket: Int = 10000): DataFrame = {
    val planes = srpPlanes(bands, rowsPerBand, dim, seed)
    val nPlanes = bands * rowsPerBand
    // a vector of the wrong length would silently hash as "missing
    // dimensions" on every plane — fail loudly instead
    val vecChecked = when(size(col(vecCol)) === dim, col(vecCol))
      .otherwise(raise_error(concat(
        lit(s"embeddingNearDupSRP: vector length != dim=$dim for id "), col(idCol).cast("string"))))
    // Signature plan (round-4 rework, each step measured):
    //  - posexplode the vector to (id, pos, x) rows, then the 32 plane
    //    dots are codegen'd HASH-AGGREGATE sums of x * element_at(litW, pos)
    //    — constant-array lookups inside whole-stage codegen. The previous
    //    form (32 aggregate/zip_with higher-order functions per vector) was
    //    interpreted and dominated the query (~1.1s of 3.3s at sf0.1); a
    //    2048-term fixed-index expansion was worse still (3x: optimizer
    //    cost of the huge tree). Every id's element rows stay inside one
    //    partition (they come from one input row), so partial aggregation
    //    collapses them before the tiny per-id exchange.
    //  - all arithmetic is integer-valued doubles (quantized x, integer
    //    planes; |dot| < 2^53), so the sums are EXACT and order-free — the
    //    signatures stay bit-identical to the spec the oracle replays.
    //  - the repartition spreads the work: a single-file parquet scan
    //    would otherwise compute every signature in one task.
    val exploded = emb
      .repartition(emb.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol), posexplode(vecChecked).as(Seq("_p", "_x")))
      .select(col(idCol), col("_p"), round(col("_x").cast("double") * 1024).as("_q"))
    val dotAggs = (0 until nPlanes).map { p =>
      sum(col("_q") * element_at(lit(planes(p)), col("_p") + 1)).as(s"_d$p")
    }
    val dots = exploded.groupBy(col(idCol)).agg(dotAggs.head, dotAggs.tail: _*)
    val bandSigs = (0 until bands).map { b =>
      (0 until rowsPerBand).map { r =>
        when(col(s"_d${b * rowsPerBand + r}") >= 0, shiftleft(lit(1L), r)).otherwise(lit(0L))
      }.reduce(_ + _)
    }
    val sigs = dots
      .select(col(idCol),
        explode(array(bandSigs.zipWithIndex.map { case (s, b) =>
          struct(lit(b).as("band"), s.as("sig"))
        }: _*)).as("_bs"))
      .select(col(idCol), col("_bs.band").as("band"), col("_bs.sig").as("sig"))
      .withColumn("_cnt", count(lit(1)).over(Window.partitionBy("band", "sig")))
      .filter(col("_cnt") <= maxBucket)
      .drop("_cnt")
    // candidate pairs ride the bucket join as BARE IDS — the 64-double
    // vectors never shuffle with the band rows (they used to: ~38 MB of
    // payload at sf0.1, and at 100 TB the difference between shuffling
    // signatures and shuffling the corpus); the exact cosine fetches
    // vectors for the few surviving unique pairs only
    val l = sigs.select(col("band"), col("sig"), col(idCol).as("a"))
    val r = sigs.select(col("band"), col("sig"), col(idCol).as("b"))
    val pairs = l.join(r, Seq("band", "sig"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    val vecs = emb.select(col(idCol), col(vecCol))
    pairs
      .join(vecs.select(col(idCol).as("a"), col(vecCol).as("va")), Seq("a"))
      .join(vecs.select(col(idCol).as("b"), col(vecCol).as("vb")), Seq("b"))
      .select(col("a"), col("b"), graft.ann.Ann.cosine(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** The deterministic integer-valued hyperplanes behind
    * [[embeddingNearDupSRP]], exposed so an external oracle can embed the
    * exact same constants (plane p = round(1000·N(0,1)) draws from
    * java.util.Random(seed), row-major over planes then dims). */
  def srpPlanes(bands: Int, rowsPerBand: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rng = new java.util.Random(seed)
    Array.fill(bands * rowsPerBand)(Array.fill(dim)(math.round(1000.0 * rng.nextGaussian()).toDouble))
  }

  /** Fixed-width word windows: text -> array of w-word segments, the
    * segmentation [[segmentDedup]]'s tests use (production callers pass
    * e.g. `split(text, "\n{2,}")` for real paragraphs). A text of n words
    * yields ceil(n/w) segments; the last may be short.
    *
    * NB the per-index lambda captures `toks`, so each evaluation re-splits
    * the text per SEGMENT (O(n²/w) characters) — fine for segmentDedup's
    * one explode per row, but do not reference this expression from a
    * filter predicate or any multi-reference projection (see the zip_with
    * bigram forms in TextOps/Classifier for the cheap-under-duplication
    * alternative; non-overlapping windows have no such 2-slice form). */
  def wordWindows(text: Column, w: Int): Column = {
    val toks = split(text, " ")
    val nseg = ceil(size(toks) / lit(w.toDouble)).cast("int")
    transform(sequence(lit(0), nseg - 1), i => array_join(slice(toks, i * w + 1, lit(w)), " "))
  }

  /** CCNet-style segment-level dedup (Wenzek et al. 2020 deduplicate web
    * text at the PARAGRAPH level before any document-level pass): across
    * the whole corpus, each distinct segment survives only at its first
    * occurrence — the lexicographically least (doc, position) — and every
    * document is rewritten to its surviving segments in original order.
    *
    * Scale shape: text NEVER enters the dedup shuffle. Segments are
    * reduced to md5 digests; the global winner per digest is found with
    * two scalar hash-aggregations (per-(digest, doc) min position, then
    * per-digest min doc + min_by position — all primitive buffers, so both
    * stages run as partial+final HashAggregate with map-side combine, and
    * a degenerate segment repeated 10^8 times collapses map-side instead
    * of hot-spotting a reducer). The winners ARE the kept (doc, pos) pairs
    * — no join back onto the exploded frame. The only text movement is the
    * final doc-keyed join that rewrites each document, which re-derives
    * the segment array and indexes it by the kept positions (O(n_kept)).
    *
    * Returns (idCol, n_segments, n_kept, text_dedup) where text_dedup
    * joins surviving segments with `sep`.
    */
  def segmentDedup(
      docs: DataFrame,
      segsOf: Column => Column,
      sep: String = " ",
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val hashed = docs
      .select(col(idCol), posexplode(segsOf(col(textCol))).as(Seq("pos", "_seg")))
      .select(col(idCol), col("pos"), md5(col("_seg").cast("binary")).as("_h"))
    val perDoc = hashed.groupBy(col("_h"), col(idCol)).agg(min(col("pos")).as("pos"))
    val winners = perDoc.groupBy(col("_h"))
      .agg(min(col(idCol)).as(idCol), min_by(col("pos"), col(idCol)).as("pos"))
    val keptSets = winners.groupBy(col(idCol))
      .agg(sort_array(collect_list(col("pos"))).as("_keep"))
    docs
      .join(keptSets, Seq(idCol), "left")
      .select(
        col(idCol),
        size(segsOf(col(textCol))).as("n_segments"),
        coalesce(size(col("_keep")), lit(0)).as("n_kept"),
        // _keep is already position-sorted, so indexing into the segment
        // array is O(n_kept) — a filter with array_contains would rescan
        // _keep once per segment, O(n_segments × n_kept) on big docs
        array_join(
          transform(coalesce(col("_keep"), array().cast("array<int>")),
            p => element_at(segsOf(col(textCol)), p + 1)),
          sep).as("text_dedup"))
  }

  /** ExactSubstr-style duplicated-span removal (Lee et al. 2021,
    * "Deduplicating Training Data Makes Language Models Better", public):
    * any token run of length ≥ L that occurs more than once in the corpus
    * is removed from every occurrence EXCEPT the globally first one. The
    * paper builds a corpus-wide suffix array; the distributed reformulation
    * here is rolling windows — every length-L token window is hashed, and
    * a span duplicated anywhere shares ALL its length-L windows with the
    * other occurrence regardless of alignment, so marking non-first window
    * occurrences and removing the union of their [p, p+L) extents removes
    * exactly the duplicated spans (first occurrences keep their text).
    *
    * Scale shape: text never enters a shuffle — windows become md5 digests
    * at the scan (`_tk` is materialized ONCE as a column so the per-window
    * lambda references a bound attribute, not a re-split; cost O(n·L) per
    * doc, the same work a suffix-array build's data movement costs). The
    * global winner per digest uses segmentDedup's two scalar
    * hash-aggregations (map-side combine absorbs degenerate hot windows);
    * non-winners are found with ONE digest-keyed equi-join (16-byte keys;
    * a 10^8-fold repeated window is a skew key AQE splits — the winner
    * side holds one row per digest). Covered token positions explode only
    * from DUPLICATE windows (O(dups·L)), and the final rewrite is a
    * doc-keyed join + linear `array_except` index filter.
    *
    * Returns (idCol, n_tokens, n_dup_windows, n_removed, text_dedup).
    */
  def exactSubstrDedup(
      docs: DataFrame,
      L: Int,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(L >= 2, s"window length must be >= 2, got $L")
    val toks = graft.text.TextOps.wsTokens(coalesce(col(textCol), lit("")))
    // (doc, pos, h): every window occurrence. sequence(0, n-L) DESCENDS
    // when n < L (Spark generates backwards for start > stop) — guard it.
    val hashed = docs
      .select(col(idCol), toks.as("_tk"))
      .select(col(idCol),
        posexplode(when(size(col("_tk")) >= L,
          transform(sequence(lit(0), size(col("_tk")) - L),
            i => md5(array_join(slice(col("_tk"), i + 1, lit(L)), " ").cast("binary"))))
          .otherwise(array().cast("array<string>"))).as(Seq("pos", "_h")))
    val perDoc = hashed.groupBy(col("_h"), col(idCol)).agg(min(col("pos")).as("pos"))
    val winners = perDoc.groupBy(col("_h"))
      .agg(min(col(idCol)).as("_wd"), min_by(col("pos"), col(idCol)).as("_wp"))
    val marked = hashed.join(winners, Seq("_h"))
      .filter(!(col(idCol) === col("_wd") && col("pos") === col("_wp")))
    val perDocCut = marked
      .select(col(idCol), col("pos"),
        explode(sequence(col("pos"), col("pos") + L - 1)).as("_tp"))
      .groupBy(col(idCol))
      // the grouped frame is post-explode (one row per (window, extent
      // token)), so the window count must be count_distinct(pos)
      .agg(count_distinct(col("pos")).as("n_dup_windows"),
        collect_set(col("_tp")).as("_cut"))
    docs
      .join(perDocCut, Seq(idCol), "left")
      .select(col(idCol), toks.as("_tk"), col("n_dup_windows"), col("_cut"))
      .select(
        col(idCol),
        size(col("_tk")).cast("long").as("n_tokens"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(size(col("_cut")), lit(0)).cast("long").as("n_removed"),
        array_join(
          transform(
            // array_except keeps first-array order, so positions stay sorted
            array_except(
              when(size(col("_tk")) > 0, sequence(lit(0), size(col("_tk")) - 1))
                .otherwise(array().cast("array<int>")),
              coalesce(col("_cut"), array().cast("array<int>"))),
            p => element_at(col("_tk"), p + 1)),
          " ").as("text_dedup"))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — public): semantic
    * deduplication via embedding clustering. A coarse quantizer (the
    * [[graft.ann.Ann.kMeans]] trainer, or any centroid table) confines the
    * pairwise-cosine pass to WITHIN-cluster pairs — O(n²/k) work per cell
    * instead of O(n²) over the corpus — and of each eps-similar pair the
    * paper keeps the item with LOWER cosine to its cluster centroid (the
    * more atypical example; ties break on lower id).
    *
    * Engine-exact by construction: every comparison (assignment argmax,
    * the eps test, the keep rule) uses cosines rounded to 6 digits, so a
    * SQL oracle replays membership bit-for-bit (q90).
    *
    * Scale shape: centroids are broadcast model state (k rows); the only
    * corpus-scale shuffle hash-partitions (cell, id, vector) for the
    * within-cell self-join (k is large at scale — the paper uses 50k
    * clusters — so cells are small and uniform); a degenerate cell is
    * excluded from pairing past `maxCell` rows (its members stay kept)
    * under the same loud-audit contract as [[minhashCandidates]] — surface
    * the exclusions with [[semdedupOversizedCells]].
    *
    * Returns every corpus row as (idCol, cell, csim, kept:int) — kept=0
    * marks the rows SemDeDup removes.
    */
  def semanticDedup(corpus: DataFrame, centroids: DataFrame, eps: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      cellCol: String = null, maxCell: Int = 10000): DataFrame = {
    import graft.ann.Ann
    val assigned = Ann.ivfAssign(corpus, centroids, idCol, vecCol, cellCol,
        keepSim = true)
      .select(col("cell"), col(idCol), col(vecCol), col("sim").as("csim"))
    val pairable = assigned
      .withColumn("_n", count(lit(1)).over(Window.partitionBy("cell")))
      .filter(col("_n") <= maxCell)
      .drop("_n")
    val l = pairable.select(col("cell"), col(idCol).as("_ia"),
      col(vecCol).as("_va"), col("csim").as("_ca"))
    val r = pairable.select(col("cell"), col(idCol).as("_ib"),
      col(vecCol).as("_vb"), col("csim").as("_cb"))
    val dropped = l.join(r, Seq("cell"))
      .filter(col("_ia") =!= col("_ib"))
      .filter(round(Ann.cosine(col("_va"), col("_vb")), 6) >= eps)
      // the cell-mate b outranks a (keeps): lower centroid-cosine, id tiebreak
      .filter(col("_cb") < col("_ca") ||
        (col("_cb") === col("_ca") && col("_ib") < col("_ia")))
      .select(col("_ia").as(idCol)).distinct()
    assigned
      .join(dropped.withColumn("_drop", lit(true)), Seq(idCol), "left")
      .select(col(idCol), col("cell"), col("csim"),
        (!coalesce(col("_drop"), lit(false))).cast("int").as("kept"))
  }

  /** Audit of cells the [[semanticDedup]] `maxCell` cap excludes from
    * pairing: (cell, n_vecs). Emit this next to the dedup output so capped
    * coverage is visible, never silent. Takes any frame with a `cell`
    * column — pass [[semanticDedup]]'s OWN output (it carries every corpus
    * row with its cell), which avoids re-running the assignment pass. */
  def semdedupOversizedCells(assigned: DataFrame, maxCell: Int = 10000): DataFrame =
    assigned.groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vecs"))
      .filter(col("n_vecs") > maxCell)
}
