package graft.stats

import graft.core.SeriesOps.{K, T, V}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-sectional distribution statistics over per-unit aggregates —
  * the "who dominates this corpus" scans a crawl curator runs beside the
  * time-series tiers (hot-domain concentration, value-plausibility
  * screens). No reference counterpart; standard published estimators.
  */
object StatsOps {

  /** Quantile-mapping normalization (empirical CDF matching — the
    * public bias-correction / quantile-normalization classic): map each
    * point's value to the REFERENCE key's value at the same quantile,
    * v' = F_ref⁻¹(F_key(v)), so every key's marginal distribution is
    * calibrated onto `refKey`'s. Quantiles are exact midranks on the
    * 1e-3 value grid: the source fraction (2·W(<x) + w(x) + 1)/(2n) and
    * the reference inverse CDF (smallest ref value whose cumulative
    * count reaches that fraction) compare as CROSS-MULTIPLIED LONGS —
    * probe position R·n_ref vs data position 2·C_ref·n_src — so the
    * whole mapping is integer-exact in any engine, and the reference
    * key maps to ITSELF (w ≥ 1 makes its own bin the first to qualify —
    * the identity invariant the spec pins). Output (key, t, v, v_norm).
    *
    * Scale: two histogram-sized aggregates + one union-then-window
    * as-of per key over (source bins + replicated ref bins) — the ref
    * histogram broadcasts; nothing row-sized crosses a shuffle twice.
    * Positions bound by 2·C·n: move to DECIMAL(38) past ~10⁹ points
    * per key (documented, not hit at any test SF). */
  def quantileMap(df: DataFrame, refKey: String): DataFrame = {
    val pts = df.filter(col(V).isNotNull)
      .withColumn("_x", floor(col(V) * 1000 + 0.5).cast("long"))
    val wCum = Window.partitionBy(col(K)).orderBy(col("_x").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hist = pts.groupBy(col(K), col("_x")).agg(count(lit(1)).as("_w"))
      .withColumn("_c", sum(col("_w")).over(wCum))
    val tot = pts.groupBy(col(K).as("_tk")).agg(count(lit(1)).as("_n"))
    val ref = hist.filter(col(K) === refKey)
      .select(col("_x").as("_rx"), col("_c").as("_rc"))
    val refN = tot.filter(col("_tk") === refKey)
      .select(col("_n").as("_nref"))
    // probes: one per distinct (key, bin) at position R·n_ref
    val probes = hist
      .join(tot, col(K) <=> col("_tk")).drop("_tk")
      .crossJoin(broadcast(refN))
      .select(col(K), col("_x"),
        ((lit(2) * col("_c") - col("_w") + 1) * col("_nref")).as("_pos"),
        lit(null).cast("long").as("_mx"), lit(1).as("_g"))
    // data: the ref histogram replicated per source key at 2·C_ref·n_src
    val data = tot
      .crossJoin(broadcast(ref))
      .select(col("_tk").as(K), lit(null).cast("long").as("_x"),
        (lit(2) * col("_rc") * col("_n")).as("_pos"),
        col("_rx").as("_mx"), lit(0).as("_g"))
    // first data row at-or-after the probe: probes sort BEFORE data at
    // equal position so the ≥ boundary includes the tie
    val wNext = Window.partitionBy(col(K))
      .orderBy(col("_pos").asc, col("_g").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val mapped = probes.unionByName(data)
      .withColumn("_m",
        first(when(col("_g") === 0, col("_mx")), ignoreNulls = true)
          .over(wNext))
      .filter(col("_g") === 1)
      .select(col(K).as("_mk"), col("_x").as("_mxx"), col("_m"))
    pts
      .join(mapped, col(K) <=> col("_mk") && col("_x") === col("_mxx"))
      .select(col(K), col(T), col(V), (col("_m") / 1000.0).as("v_norm"))
  }

  /** Winsorize + robust-scale normalization: per key, clip values to
    * the [pLo, pHi] empirical quantiles and center/scale by
    * median/IQR — the outlier-immune feature prep every training
    * pipeline runs before z-scores would explode. Quantiles are the
    * classic type-1 inverse CDF (smallest value whose cumulative count
    * reaches p·n) evaluated on the exact 1e-3 grid with p as a RATIONAL
    * (num/den): the test C·den ≥ num·n is pure long arithmetic, so the
    * thresholds (and the clip) are integer-exact in any engine; only
    * the final (x − median)/IQR is IEEE (one subtraction, one division,
    * 6-dp round; IQR = 0 → null). Output (key, t, v, v_clip,
    * v_robust).
    *
    * Scale: one histogram aggregate + one per-key threshold aggregate
    * (4 conditional mins over histogram-sized frames) joined back to
    * the points — the quantileMap plan without the as-of. */
  def winsorizeScale(df: DataFrame,
      pLoNum: Long = 1, pLoDen: Long = 100,
      pHiNum: Long = 99, pHiDen: Long = 100): DataFrame = {
    require(pLoNum >= 0 && pLoNum <= pLoDen && pLoDen > 0 &&
      pHiNum >= 0 && pHiNum <= pHiDen && pHiDen > 0 &&
      pLoNum * pHiDen <= pHiNum * pLoDen, "need 0 <= pLo <= pHi <= 1")
    val pts = df.filter(col(V).isNotNull)
      .withColumn("_x", floor(col(V) * 1000 + 0.5).cast("long"))
    val wCum = Window.partitionBy(col(K)).orderBy(col("_x").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hist = pts.groupBy(col(K), col("_x")).agg(count(lit(1)).as("_w"))
      .withColumn("_c", sum(col("_w")).over(wCum))
      .withColumn("_n", sum(col("_w")).over(Window.partitionBy(col(K))))
    def qAt(num: Long, den: Long) =
      min(when(col("_c") * den >= col("_n") * num, col("_x")))
    val thr = hist.groupBy(col(K).as("_qk")).agg(
      qAt(pLoNum, pLoDen).as("_lo"), qAt(pHiNum, pHiDen).as("_hi"),
      qAt(1, 2).as("_med"), qAt(1, 4).as("_q1"), qAt(3, 4).as("_q3"))
    pts
      .join(thr, col(K) <=> col("_qk"))
      .withColumn("_cl", least(greatest(col("_x"), col("_lo")), col("_hi")))
      .select(col(K), col(T), col(V),
        (col("_cl") / 1000.0).as("v_clip"),
        when(col("_q3") > col("_q1"),
          round((col("_cl") - col("_med")).cast("double")
            / (col("_q3") - col("_q1")), 6)).as("v_robust"))
  }

  /** Value-at-Risk + expected shortfall (CVaR) per key: the exact
    * empirical p-quantile (type-1 inverse CDF at the RATIONAL p =
    * num/den, the [[winsorizeScale]] threshold machinery) and the mean
    * of everything AT OR ABOVE it — "how bad is the bad tail", the
    * risk pair every SLO/latency review reads together. Integer-exact:
    * the threshold is a long grid value, tail membership is a long
    * compare, and the tail mean is one division of exact long sums.
    * Output (key, n, var_p, n_tail, es). */
  def tailRisk(df: DataFrame,
      pNum: Long = 19, pDen: Long = 20): DataFrame = {
    require(pNum > 0 && pNum <= pDen && pDen > 0,
      s"need 0 < p = $pNum/$pDen <= 1")
    val pts = df.filter(col(V).isNotNull)
      .withColumn("_x", floor(col(V) * 1000 + 0.5).cast("long"))
    val wCum = Window.partitionBy(col(K)).orderBy(col("_x").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val thr = pts.groupBy(col(K), col("_x")).agg(count(lit(1)).as("_w"))
      .withColumn("_c", sum(col("_w")).over(wCum))
      .withColumn("_n", sum(col("_w")).over(Window.partitionBy(col(K))))
      .groupBy(col(K).as("_qk"))
      .agg(min(when(col("_c") * pDen >= col("_n") * pNum, col("_x")))
        .as("_vp"), first(col("_n")).as("n"))
    pts
      .join(thr, col(K) <=> col("_qk"))
      .filter(col("_x") >= col("_vp"))
      .groupBy(col(K))
      .agg(first(col("n")).as("n"), first(col("_vp")).as("_vpx"),
        count(lit(1)).as("n_tail"), sum(col("_x")).as("_ts"))
      .select(col(K), col("n"), (col("_vpx") / 1000.0).as("var_p"),
        col("n_tail"),
        round(col("_ts") / 1000.0 / col("n_tail"), 6).as("es"))
  }

  /** Gini concentration coefficient per key over non-negative integer
    * weights x (one row per (key, unit), `x` pre-aggregated by the
    * caller): with units sorted ascending by x,
    *
    *   G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx)
    *
    * 0 = perfectly even, →1 = one unit holds everything. Tie order
    * among equal x does not affect the sum (Σi over an equal-x block is
    * fixed), so no tie-break column is needed and the result is
    * engine-exact: every term is BIGINT until the single final divide.
    * Keys with Σx = 0 report null. Output (key, n_units, total, gini).
    *
    * Scale: the input is already a per-(key, unit) AGGREGATE (the
    * exchange carries one row per unit, never raw events), so the rank
    * window partitions over tier-sized groups — the [[graft.events
    * .EventOps.leaderboard]] regime. A group too big for one task would
    * rank via the 256-ordered-bucket exclusive prefix sum of
    * [[graft.pack.Packing.packSequences]]; at 10^12 raw rows the
    * BIGINT products also move to DECIMAL(38). */
  def gini(df: DataFrame, x: Column): DataFrame = {
    df.select(col("key"), x.cast("long").as("_x"))
      .withColumn("_i", row_number().over(Window.partitionBy(col("key"))
        .orderBy(col("_x").asc)))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_units"), sum(col("_x")).as("total"),
        sum(col("_i") * col("_x")).as("_ix"))
      .select(col("key"), col("n_units"), col("total"),
        when(col("total") > 0,
          round((lit(2) * col("_ix") - (col("n_units") + 1) * col("total"))
            / (col("n_units") * col("total")).cast("double"), 6))
          .as("gini"))
  }

  /** Benford first-digit screen per key over pre-quantized positive
    * LONG values: observed count and share per leading digit 1-9
    * (zero-filled), the Benford expectation, and the key-level χ²
    * statistic against it — the classic fabricated-data / unit-mixup
    * detector for metric pipelines.
    *
    * Engine-exactness: the leading digit is the first character of the
    * BIGINT's decimal string (identical in any engine — no float log10
    * at bin edges); the expected shares are fixed decimal literals (the
    * model's constants, shared with the oracle); each χ² term is one
    * deterministic IEEE expression snapped to the 1e-6 grid as a LONG
    * before the 9-term sum, so partial-aggregation order cannot move
    * the result. Output (key, digit, n, share, exp_p, chi2).
    *
    * Scale: one (key, digit) count aggregate (≤ 9 rows per key after
    * map-side combine) + a 9-row broadcast digit grid. */
  def benford(df: DataFrame, xq: Column): DataFrame = {
    val pos = df.select(col("key"), xq.cast("long").as("_x"))
      .filter(col("_x") > 0)
      .withColumn("digit", substring(col("_x").cast("string"), 1, 1).cast("int"))
    val counts = pos.groupBy(col("key"), col("digit"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("key").as("_tk"))
      .agg(sum(col("n")).as("_tot"))
    val digits = pos.sparkSession.range(1, 10)
      .select(col("id").cast("int").as("_d"))
    val probs = map(BenfordP.flatMap { case (d, p) =>
      Seq(lit(d), lit(p)) }: _*)
    val grid = totals.crossJoin(broadcast(digits))
      .join(counts,
        col("_tk") <=> counts("key") && col("_d") === counts("digit"),
        "left")
      .select(col("_tk").as("key"), col("_d").as("digit"),
        coalesce(col("n"), lit(0L)).as("n"), col("_tot"))
      .withColumn("exp_p", probs(col("digit")))
      .withColumn("_e", col("_tot").cast("double") * col("exp_p"))
      .withColumn("_term",
        floor((col("n").cast("double") - col("_e")) *
          (col("n").cast("double") - col("_e")) / col("_e") * 1e6 + 0.5)
          .cast("long"))
    val chi = grid.groupBy(col("key").as("_ck"))
      .agg(sum(col("_term")).as("_chi_u"))
    grid.join(chi, col("key") <=> col("_ck"))
      .select(col("key"), col("digit"), col("n"),
        round(col("n") / col("_tot").cast("double"), 6).as("share"),
        col("exp_p"), (col("_chi_u") / 1e6).as("chi2"))
  }

  /** Per-point rarity (self-information) against the key's own value-bin
    * histogram: surprise = −log₂(n_bin / n_key) — 0 bits for a value in
    * a bin the key always occupies, high for a bin it almost never
    * visits. The histogram-frequency anomaly score every metrics
    * pipeline ends up with: no distributional assumption (unlike the
    * z-score family), robust to multi-modal series. `bin` is the
    * caller's quantization (engine-exact, e.g. `floor(v / width)`).
    *
    * Scale: two count aggregates — (key, bin) and (key) — whose results
    * are FLEET-SIZED (keys × occupied bins), broadcast back onto the raw
    * stream; the full point stream is touched once with no wide shuffle.
    * Both counts are exact longs; the single float op is the final log₂
    * of their ratio, snapped to the 1e-6 grid.
    * Output (key, t, v, bin, n_bin, n_key, surprise). */
  def rarity(df: DataFrame, bin: Column): DataFrame = {
    val binned = df.select(col("key"), col("t"), col("v"),
      bin.cast("long").as("bin"))
    val counts = binned.groupBy(col("key").as("_bk"), col("bin").as("_bb"))
      .agg(count(lit(1)).as("n_bin"))
    val totals = binned.groupBy(col("key").as("_tk"))
      .agg(count(lit(1)).as("n_key"))
    binned
      .join(broadcast(counts),
        col("key") <=> col("_bk") && col("bin") <=> col("_bb"))
      .join(broadcast(totals), col("key") <=> col("_tk"))
      .select(col("key"), col("t"), col("v"), col("bin"),
        col("n_bin"), col("n_key"),
        round(-log2(col("n_bin").cast("double") / col("n_key")), 6)
          .as("surprise"))
  }

  /** log10(1 + 1/d), d = 1..9, as fixed 15-digit literals — the model
    * constants the oracle shares verbatim. */
  final val BenfordP: Seq[(Int, Double)] = Seq(
    1 -> 0.301029995663981, 2 -> 0.176091259055681, 3 -> 0.124938736608300,
    4 -> 0.096910013008056, 5 -> 0.079181246047625, 6 -> 0.066946789630613,
    7 -> 0.057991946977687, 8 -> 0.051152522447381, 9 -> 0.045757490560675)

  /** Seasonal strength as the one-way-ANOVA effect size η² of the value
    * against a calendar bin (hour-of-day, day-of-week, …): the fraction
    * of the series' variance explained by the bin means,
    * η² = SSB/SST ∈ [0, 1]. A flat daily profile scores ~0; a pure
    * daily cycle sampled densely scores ~1 — the "does this signal
    * breathe with the clock" screen run before picking a rollup tier.
    *
    * Exactness: values on the 1e-3 grid; per-bin n_h, S_h = Σx and
    * SXX_h = Σx² are exact longs. The between-group sum uses the
    * FLOORED integer division S_h² div n_h per bin (documented
    * quantization — it biases η² by < bins/SST, i.e. ~1e-14 here, and
    * both engines floor identically), accumulated in DECIMAL(38,0) /
    * HUGEINT, so η² = (n·B − S²)/(n·SXX − S²) is a ratio of EXACT
    * integers; the only float ops are the two final integer→double
    * conversions and one division (error ~1e-16, far under the 1e-6
    * rounding grid). S_h² needs n_h·|x|max ≤ 3·10⁹ grid units to fit
    * the pre-decimal long product — past that, quantize coarser or lift
    * the product itself to decimal (documented, not hit at any SF).
    *
    * Scale: one (key, bin) aggregate with map-side partials, then one
    * fleet-sized (key) aggregate — bins never exceed the calendar
    * period, so the second stage is tiny. Output (key, n, n_bins,
    * eta2); eta2 null for degenerate keys (zero variance or < 2 bins). */
  def seasonalStrength(df: DataFrame, bin: Column): DataFrame = {
    val q = df.filter(col(V).isNotNull)
      .withColumn("_x", floor(col(V) * 1000 + 0.5).cast("long"))
      .withColumn("_h", bin.cast("long"))
    val byBin = q.groupBy(col(K), col("_h")).agg(
      count(lit(1)).as("_nh"),
      sum(col("_x")).as("_sh"),
      sum(col("_x") * col("_x")).as("_sxxh"))
      // exact floored per-bin between-group term S_h² div n_h; the
      // product is lifted to decimal so ~9e8-unit bin sums can't wrap,
      // and |S_h| keeps the non-negative product's div = floor in every
      // engine (Spark div truncates, DuckDB // floors — equal on ≥ 0)
      .withColumn("_bh",
        expr("CAST(abs(_sh) AS DECIMAL(38,0)) * abs(_sh) div _nh"))
    val agg = byBin.groupBy(col(K)).agg(
      sum(col("_nh")).as("n"),
      count(lit(1)).as("n_bins"),
      sum(col("_sh").cast("decimal(38,0)")).as("_s"),
      sum(col("_sxxh").cast("decimal(38,0)")).as("_sxx"),
      sum(col("_bh").cast("decimal(38,0)")).as("_b"))
    val nD = col("n").cast("decimal(38,0)")
    val num = (nD * col("_b") - col("_s") * col("_s")).cast("double")
    val den = (nD * col("_sxx") - col("_s") * col("_s")).cast("double")
    agg.select(col(K), col("n"), col("n_bins"),
      when(col("n_bins") >= 2 && den > 0, round(num / den, 6)).as("eta2"))
  }

  /** Turning-points randomness test (Kendall 1976): a point is a turning
    * point when it is a strict local max or min of the quantized value
    * sequence in time order (plateau members are NOT turning points —
    * strict comparisons, documented). For an i.i.d. series the count is
    * asymptotically normal with mean 2(n−2)/3 and variance (16n−29)/90,
    * so z far from 0 flags trend/oscillation. The count is an exact
    * integer; e_tp and z are fixed IEEE sequences on integer-derived
    * doubles (sqrt is correctly rounded), so the oracle replay is
    * bit-exact. Output (key, n, n_tp, e_tp, z); null stats for n < 3.
    *
    * Scale: one per-key ordered lag/lead window + one count — the same
    * shape as counterResets; run per retention window at 100 TB. */
  def turningPoints(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col(K)).orderBy(col(T).asc)
    val q = df.filter(col(V).isNotNull)
      .withColumn("_x", floor(col(V) * 1000 + 0.5).cast("long"))
      .withColumn("_p", lag(col("_x"), 1).over(w))
      .withColumn("_f", lead(col("_x"), 1).over(w))
    val tp = (col("_p") < col("_x") && col("_f") < col("_x")) ||
      (col("_p") > col("_x") && col("_f") > col("_x"))
    val agg = q.groupBy(col(K)).agg(
      count(lit(1)).as("n"),
      count(when(tp, 1)).as("n_tp"))
    val nD = col("n").cast("double")
    val eTp = lit(2.0) * (nD - 2.0) / 3.0
    val vTp = (lit(16.0) * nD - 29.0) / 90.0
    agg.select(col(K), col("n"), col("n_tp"),
      when(col("n") >= 3, round(eTp, 6)).as("e_tp"),
      when(col("n") >= 3,
        round((col("n_tp").cast("double") - eTp) / sqrt(vTp), 6)).as("z"))
  }
}
