package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level lexical-statistics screens: Zipf's rank-frequency slope
  * and Heaps' vocabulary-growth exponent — the two classic "does this
  * crawl look like natural language" diagnostics (a spam/boilerplate/
  * machine-generated shard bends both laws, so a pipeline watches the
  * fitted exponents per shard before training on it).
  *
  * Engine-exactness: token counts, ranks and prefix totals are exact
  * integers; each log is quantized to the 2^20 grid (the Kleinberg /
  * entropy-rate convention) and the OLS sufficient statistics are
  * decimal(38,0) sums of quantized-long products (rank·count products
  * overflow int64, so the decimal lift is load-bearing — the oracle
  * mirrors in HUGEINT); slope and R² are one fixed float expression
  * each on identical operands.
  *
  * Scale: the only corpus-sized stage is the token count, which
  * collapses map-side; the Zipf head is a TakeOrdered top-R (per-
  * partition top-R then merge — no global sort, no unpartitioned
  * window: ranks come from one array_sort over the R-row head); Heaps
  * prefix totals live on a ≤`nCk`-row grid cumulated with a broadcast
  * triangle join.
  */
object LexStats {

  private def qln(c: Column): Column = graft.core.Quant.qln20(c)

  private val Dec = "decimal(38,0)"

  /** OLS sufficient statistics of (qln x, qln y) pairs → one row
    * (_k, _num, _den, _deny) with num/den the slope's cross-moment and
    * variance and _deny the y-variance (for R²), all cast to double
    * from exact decimal algebra. */
  private def olsQln(pairs: DataFrame, x: Column, y: Column): DataFrame = {
    val s = pairs
      .select(qln(x).cast(Dec).as("_x"), qln(y).cast(Dec).as("_y"))
      .agg(count(lit(1)).cast(Dec).as("_k"),
        sum(col("_x")).as("_sx"), sum(col("_y")).as("_sy"),
        sum(col("_x") * col("_x")).as("_sxx"),
        sum(col("_x") * col("_y")).as("_sxy"),
        sum(col("_y") * col("_y")).as("_syy"))
    s.select(col("_k").cast("long").as("_k"),
      (col("_k") * col("_sxy") - col("_sx") * col("_sy")).cast("double")
        .as("_num"),
      (col("_k") * col("_sxx") - col("_sx") * col("_sx")).cast("double")
        .as("_den"),
      (col("_k") * col("_syy") - col("_sy") * col("_sy")).cast("double")
        .as("_deny"))
  }

  /** Zipf head fit: log-log OLS of token frequency on rank over the
    * `topR` most frequent tokens (ties rank by term asc). Natural text
    * reads slope ≈ −1. Output one row (n_fit, total_tokens, vocab,
    * zipf_slope, zipf_r2); slope/r2 null when the head is degenerate
    * (all-equal ranks or counts). */
  def zipfFit(docs: DataFrame, topR: Int = 1000,
      textCol: String = "text"): DataFrame = {
    require(topR >= 2, s"topR=$topR must be >= 2")
    val freq = docs
      .select(explode(TextOps.wsTokens(col(textCol))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
    val tot = freq.agg(sum(col("n")).as("total_tokens"),
      count(lit(1)).as("vocab"))
    val ranked = freq
      .orderBy(col("n").desc, col("term").asc).limit(topR)
      .agg(array_sort(collect_list(struct((-col("n")).as("_nn"),
        col("term").as("_t")))).as("_a"))
      .select(posexplode(col("_a")))
      .select((col("pos") + 1).cast("long").as("_r"),
        (-col("col").getField("_nn")).as("_n"))
    olsQln(ranked, col("_r"), col("_n"))
      .crossJoin(broadcast(tot))
      .select(col("_k").as("n_fit"), col("total_tokens"), col("vocab"),
        when(col("_den") > 0, round(col("_num") / col("_den"), 6))
          .as("zipf_slope"),
        when(col("_den") > 0 && col("_deny") > 0,
          round(col("_num") * col("_num")
            / (col("_den") * col("_deny")), 6)).as("zipf_r2"))
  }

  /** Trending terms: per day, the top-`k` tokens by burst lift over
    * their own trailing-`window`-day baseline,
    *
    *   lift = n_today · window / Σ_{d-window ≤ b < d} n_b
    *
    * (terms with an EMPTY baseline — brand-new tokens — get the
    * sentinel lift null and rank ahead of every finite lift: a term
    * appearing `minN`+ times from nothing is the strongest trend
    * signal there is). The term-level complement of the event-rate
    * burst scans (q128/q137): what is being SAID more, not just how
    * often events fire. Output (day, term, n_today, n_base, lift,
    * term_rank), rank 1..k per day.
    *
    * Engine-exactness: counts are exact; lift is one double division
    * of exact long products; per-day ranking orders by (new-term
    * first, lift desc, term asc) — a deterministic total order.
    *
    * Scale: one token count whose groups collapse map-side; the
    * baseline is a (term, day-offset) self equi-join of the GRID-sized
    * (day × term) count frame — |window| bounded offsets, no raw
    * rescan; ranking is a per-day window over candidates that already
    * passed the `minN` gate. */
  def trendingTerms(docs: DataFrame, dayCol: Column, k: Int = 10,
      window: Int = 7, minN: Long = 5,
      textCol: String = "text"): DataFrame = {
    require(k >= 1 && window >= 1, "need k >= 1 and window >= 1")
    val cnt = docs
      .select(dayCol.cast("long").as("day"),
        explode(TextOps.wsTokens(col(textCol))).as("term"))
      .groupBy(col("day"), col("term"))
      .agg(count(lit(1)).as("n"))
    val offsets = explode(sequence(lit(1), lit(window))).as("_off")
    val base = cnt.select(col("term").as("_bt"), col("day").as("_bd"),
        col("n").as("_bn"), offsets)
      .select(col("_bt"), (col("_bd") + col("_off")).as("_day"), col("_bn"))
      .groupBy(col("_bt"), col("_day"))
      .agg(sum(col("_bn")).as("n_base"))
    val scored = cnt.filter(col("n") >= minN)
      .join(base, col("term") === col("_bt") && col("day") === col("_day"),
        "left")
      .select(col("day"), col("term"), col("n").as("n_today"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        when(col("n_base").isNotNull,
          round((col("n") * window).cast("double")
            / col("n_base").cast("double"), 6)).as("lift"))
    // desc_nulls_first puts the empty-baseline (new) terms ahead of
    // every finite lift, then term asc breaks all ties
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("day"))
      .orderBy(col("lift").desc_nulls_first, col("term").asc)
    scored
      .withColumn("term_rank", row_number().over(w))
      .filter(col("term_rank") <= k)
  }

  /** Term dispersion census — the boilerplate screen at TERM level:
    * for each token with total frequency ≥ `minTf`, how its
    * occurrences spread across documents. Natural-language terms have
    * doc_rate = df/tf near their document frequency share and a small
    * top_share; template/boilerplate/spam terms repeat inside few
    * documents (LOW doc_rate, HIGH top_share — e.g. a nav-bar token
    * appearing 40× in each of 3 pages). Output the `k` most
    * concentrated terms — (term, tf, df, max_in_doc, doc_rate,
    * top_share), ordered by doc_rate asc then term.
    *
    * Engine-exactness: all three counts are exact integers; the two
    * ratios are one double division each. Selection is a TakeOrdered
    * top-k on a deterministic total order — no window, no global sort.
    *
    * Scale: one (doc, term) count that collapses map-side, one (term)
    * re-aggregate — nothing holds per-term doc lists; the max/df/tf
    * triple is all the concentration read needs. */
  def termDispersion(docs: DataFrame, k: Int = 20, minTf: Long = 50,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val perDoc = docs
      .select(col(idCol), explode(TextOps.wsTokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("_n"))
    perDoc.groupBy(col("term"))
      .agg(sum(col("_n")).as("tf"), count(lit(1)).as("df"),
        max(col("_n")).as("max_in_doc"))
      .filter(col("tf") >= minTf)
      .select(col("term"), col("tf"), col("df"), col("max_in_doc"),
        round(col("df").cast("double") / col("tf"), 6).as("doc_rate"),
        round(col("max_in_doc").cast("double") / col("tf"), 6)
          .as("top_share"))
      .orderBy(col("doc_rate").asc, col("term").asc)
      .limit(k)
  }

  /** Heaps vocabulary-growth fit: cumulative (tokens, distinct types)
    * at `nCk` doc-id-ordered corpus prefixes, log-log OLS → the Heaps
    * exponent β (natural text β ≈ 0.4-0.6; templated/duplicated shards
    * read lower). Requires a dense 0..N−1 id in `idCol` (the driver
    * tables' contract) so prefix membership is pure arithmetic — no
    * global rank. Output one row (n_checkpoints, total_tokens, vocab,
    * heaps_beta, heaps_r2). */
  def heapsFit(docs: DataFrame, nCk: Int = 10, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(nCk >= 2, s"nCk=$nCk must be >= 2")
    val nRow = docs.agg(count(lit(1)).as("_nd"))
    val toks = docs
      .select(col(idCol), explode(TextOps.wsTokens(col(textCol))).as("term"))
      .crossJoin(broadcast(nRow))
      // dense ids make the checkpoint a pure expression: products stay
      // far under 2^53, so the double floor equals integer division
      .select(least(lit(nCk - 1), floor((col(idCol) * nCk).cast("double")
        / col("_nd")).cast("long")).as("_ck"), col("term"))
    val tk = toks.groupBy(col("_ck")).agg(count(lit(1)).as("_tk"))
    val ty = toks.groupBy(col("term")).agg(min(col("_ck")).as("_ck"))
      .groupBy(col("_ck")).agg(count(lit(1)).as("_ty"))
    val grid = tk.join(ty, Seq("_ck"), "full")
      .select(col("_ck"), coalesce(col("_tk"), lit(0L)).as("_tk"),
        coalesce(col("_ty"), lit(0L)).as("_ty"))
    val cum = grid
      .join(broadcast(grid.select(col("_ck").as("_b"), col("_tk").as("_tk2"),
        col("_ty").as("_ty2"))), col("_b") <= col("_ck"))
      .groupBy(col("_ck"))
      .agg(sum(col("_tk2")).as("_ct"), sum(col("_ty2")).as("_cy"))
      .filter(col("_ct") > 0 && col("_cy") > 0)
    olsQln(cum, col("_ct"), col("_cy"))
      .crossJoin(broadcast(cum.agg(max(col("_ct")).as("total_tokens"),
        max(col("_cy")).as("vocab"))))
      .select(col("_k").as("n_checkpoints"), col("total_tokens"),
        col("vocab"),
        when(col("_den") > 0, round(col("_num") / col("_den"), 6))
          .as("heaps_beta"),
        when(col("_den") > 0 && col("_deny") > 0,
          round(col("_num") * col("_num")
            / (col("_den") * col("_deny")), 6)).as("heaps_r2"))
  }
}
