package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization for vector search (Jégou, Douze & Schmid, TPAMI
  * 2011 — public knowledge): split each embedding into `m` subspaces,
  * train an independent k-code codebook per subspace (Lloyd's), encode
  * every corpus vector as m small codes, and answer queries by
  * asymmetric distance computation (ADC) — per query, an m×k lookup
  * table of exact subspace distances, summed per candidate. The memory
  * path to billion-vector search: 64 floats become m bytes, and the
  * scan never touches raw vectors.
  *
  * Engine-exactness — STRONGER than the IVF path's rounded-cosine rule
  * (Ann.scala): coordinates are quantized ONCE to the 1e-4 integer grid
  * (xq = floor(x·1e4 + 0.5), a lossy-by-design quantizer exactly like
  * PQ itself), after which every distance is an exact LONG
  * Σ(xq − cq)², every Lloyd mean is floor(avg + 0.5) of a long sum
  * (one exact double division), and the ADC sum is a sum of longs — no
  * float comparison anywhere, so assignments, codebooks, rankings and
  * recalls replay bit-identically in any engine and any summation
  * order. (xq − cq)² ≤ 4·10⁸ per coordinate bounds the per-subspace
  * distance far under long.
  *
  * Scale shape: training state is m·k codebook rows on the driver
  * (model, not data — same contract as Ann.kMeans); assignment and ADC
  * are broadcast joins against that model; the only per-corpus shuffle
  * is the (q_id, n_id) ADC aggregate whose rows are (candidates × m)
  * longs, never vectors. For a query CORPUS rather than a query set,
  * shuffle-join the LUT on (sub, code) instead of broadcasting —
  * the same escape documented on ivfTopK.
  */
object Pq {

  /** Exact squared L2 between two array<long> columns — a sequential
    * fold, but over EXACT integers, so any evaluation order agrees. */
  def l2sqI(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, x) => acc + x)

  /** The vector stack's ONE coordinate quantizer: the 1e-4 integer grid
    * as longs, floor(x·10⁴ + 0.5). Every module whose oracle-exactness
    * rests on integer vector algebra (PQ, VectorDrift, and the oracle
    * SQL that hardcodes the same expression) must share this — a
    * diverging private copy breaks cross-module bit-identity. */
  def quantize1e4(c: Column): Column =
    transform(c, x => floor(x.cast("double") * 10000 + 0.5).cast("long"))

  /** Quantize to the 1e-4 grid and explode into m subvectors:
    * (idCol, sub, subvec: array<long>). */
  def subVectors(corpus: DataFrame, m: Int, subDim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = quantize1e4(col(vecCol))
    corpus
      .select(col(idCol), posexplode(transform(sequence(lit(0), lit(m - 1)),
        s => slice(q, s * subDim + 1, lit(subDim)))).as(Seq("sub", "subvec")))
  }

  /** Nearest-code assignment per (id, sub): exact integer distance,
    * ties break on code asc. Output (idCol, sub, code, d) — plus the
    * subvector when `keepVec` (the Lloyd mean step needs it; a second
    * join back to `subs` would shuffle the corpus again). */
  def assign(subs: DataFrame, books: DataFrame,
      idCol: String = "vec_id", keepVec: Boolean = false): DataFrame = {
    val b = broadcast(books.select(col("sub").as("_bs"), col("code"),
      col("cvec")))
    // argmin via min(struct(d, code)) — lexicographic struct order IS the
    // (d asc, code asc) tie-break, and unlike a row_number window the
    // aggregate combines map-side, so the shuffle carries one row per
    // (id, sub) instead of the k×-exploded scored frame. The Lloyd loop
    // calls this every iteration; at bench SF the window sort was the
    // trainer's dominant cost (round-4 verdict #7).
    val scored = subs.join(b, col("sub") <=> col("_bs"))
      .withColumn("d", l2sqI(col("subvec"), col("cvec")))
    val base = scored.groupBy(col(idCol), col("sub"))
    val out =
      if (keepVec)
        // subvec is constant within an (id, sub) group, so first() is
        // value-deterministic here
        base.agg(min(struct(col("d"), col("code"))).as("_dc"),
          first(col("subvec")).as("subvec"))
      else base.agg(min(struct(col("d"), col("code"))).as("_dc"))
    val cols = Seq(col(idCol), col("sub"), col("_dc.code").as("code"),
      col("_dc.d").as("d")) ++ (if (keepVec) Seq(col("subvec")) else Nil)
    out.select(cols: _*)
  }

  /** Train the m codebooks (k codes each, `iters` Lloyd iterations).
    * Seeds are the k lowest-id vectors' subvectors per subspace; means
    * are floor(avg + 0.5) back onto the integer grid; empty codes keep
    * their previous centroid. Returns (sub, code, cvec: array<long>) —
    * m·k model rows, exactly reproducible.
    *
    * Fully LAZY: books is a tiny DataFrame chained through `iters`
    * assign→mean→coalesce rounds, so a caller that trains, encodes and
    * scores runs the entire pipeline as ONE Spark action instead of
    * 1 + iters sequential driver collects — at bench SF the collect
    * round-trips were the trainer's whole cost (round-4 verdict #7),
    * and at cluster scale one action lets the scheduler overlap the
    * model chain with independent subtrees (e.g. the ground-truth
    * scan). The per-corpus subvector frame is persisted so each Lloyd
    * round reuses one materialization; the caller owns cache lifecycle
    * (Verify/Bench clear the cache between queries). */
  def train(corpus: DataFrame, m: Int, subDim: Int, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // the lazy chain references the previous `books` plan twice per Lloyd
    // round (assign + the empty-code coalesce join), so the LOGICAL plan
    // doubles per iteration — fine at small iters, exponential
    // analysis/optimization cost beyond (ADVICE r5). Fail loudly instead
    // of silently melting the driver; callers needing deeper training
    // should materialize books per round (collect or checkpoint).
    require(iters <= 6,
      s"Pq.train: iters=$iters doubles the lazy plan per round (2^iters " +
        "subtrees); keep iters <= 6 or materialize books per iteration")
    val subs = subVectors(corpus, m, subDim, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wSeed = Window.partitionBy(col("sub")).orderBy(col(idCol).asc)
    var books: DataFrame = subs
      .withColumn("_r", row_number().over(wSeed))
      .filter(col("_r") <= k)
      .select(col("sub"), (col("_r") - 1).cast("int").as("code"),
        col("subvec").as("cvec"))
    for (_ <- 1 to iters) {
      val asg = assign(subs, books, idCol, keepVec = true)
      val means = asg
        .select(col("sub"), col("code"), posexplode(col("subvec")))
        .groupBy(col("sub"), col("code"), col("pos"))
        .agg(floor(avg(col("col")) + 0.5).cast("long").as("m"))
        .groupBy(col("sub"), col("code"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m"))))
          .as("pm"))
        .select(col("sub"), col("code"),
          transform(col("pm"), p => p.getField("m")).as("mvec"))
      // empty codes keep their previous centroid
      books = books.join(means, Seq("sub", "code"), "left")
        .select(col("sub"), col("code"),
          coalesce(col("mvec"), col("cvec")).as("cvec"))
    }
    books
  }

  /** Encode the corpus: (idCol, sub, code) — m codes per vector. */
  def encode(corpus: DataFrame, books: DataFrame, m: Int, subDim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    assign(subVectors(corpus, m, subDim, idCol, vecCol), books, idCol)
      .select(col(idCol), col("sub"), col("code"))

  /** ADC top-k: per query, the m×k lookup table of exact subspace
    * distances joins the code table on (sub, code) and sums to an exact
    * long per candidate; ranking ties break on n_id asc. Output
    * (q_id, n_id, dist, rank). */
  def adcTopK(codes: DataFrame, books: DataFrame, queries: DataFrame,
      k: Int, m: Int, subDim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val lut = subVectors(queries, m, subDim, idCol, vecCol)
      .withColumnRenamed(idCol, "q_id")
      .join(broadcast(books), Seq("sub"))
      .select(col("q_id"), col("sub"), col("code"),
        l2sqI(col("subvec"), col("cvec")).as("dq"))
    val scored = codes
      .join(broadcast(lut), Seq("sub", "code"))
      .filter(col("q_id") =!= col(idCol))
      .groupBy(col("q_id"), col(idCol).as("n_id"))
      .agg(sum(col("dq")).as("dist"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("dist").asc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** ADC shortlist + exact re-rank — the production PQ serving shape
    * (FAISS IVFPQ+refine): the cheap code scan proposes `shortlist`
    * candidates per query, then only those fetch their true vectors for
    * an exact-grid L2 re-rank to top-k. On weakly-clustered data this
    * is what restores recall: ADC's per-subspace quantization noise is
    * enough to shuffle CLOSE ranks but not to push a true neighbor out
    * of a 5–10× shortlist. The re-rank join touches shortlist·|queries|
    * rows, never the corpus. Output (q_id, n_id, dist, rank). */
  def adcRerankTopK(codes: DataFrame, books: DataFrame, queries: DataFrame,
      corpus: DataFrame, k: Int, shortlist: Int, m: Int, subDim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val cand = adcTopK(codes, books, queries, shortlist, m, subDim,
      idCol, vecCol).select(col("q_id"), col("n_id"))
    rerankTopK(cand, queries, corpus, k, idCol, vecCol)
  }

  /** Exact-grid L2 re-rank of a precomputed candidate frame
    * (q_id, n_id) — split out of [[adcRerankTopK]] so a caller that
    * already holds the ADC shortlist (e.g. one that also reads its
    * rank ≤ k prefix as the plain-ADC answer) re-ranks WITHOUT a second
    * corpus code scan. Output (q_id, n_id, dist, rank). */
  def rerankTopK(cand: DataFrame, queries: DataFrame, corpus: DataFrame,
      k: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    def qz(c: Column): Column = quantize1e4(c)
    val qv = broadcast(queries.select(col(idCol).as("q_id"),
      qz(col(vecCol)).as("q_vec")))
    val cv = corpus.select(col(idCol).as("n_id"), qz(col(vecCol)).as("n_vec"))
    val scored = cand.join(qv, Seq("q_id")).join(cv, Seq("n_id"))
      .select(col("q_id"), col("n_id"),
        l2sqI(col("q_vec"), col("n_vec")).as("dist"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("dist").asc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Exact L2 top-k ground truth on the SAME 1e-4 grid (so recall
    * measures the codebook's loss, not the grid's): one exact long
    * distance per (query, candidate). Output (q_id, n_id, dist, rank). */
  def bruteForceL2TopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    def qz(c: Column): Column = quantize1e4(c)
    val q = broadcast(queries.select(col(idCol).as("q_id"),
      qz(col(vecCol)).as("q_vec")))
    val c = corpus.select(col(idCol).as("n_id"), qz(col(vecCol)).as("n_vec"))
    val scored = c.crossJoin(q)
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        l2sqI(col("q_vec"), col("n_vec")).as("dist"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("dist").asc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
