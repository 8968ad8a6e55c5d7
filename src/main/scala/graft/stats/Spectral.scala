package graft.stats

import graft.core.SeriesOps.{K, T, V}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spectral analysis for UNEVENLY-SPACED series: the floating-mean
  * Lomb–Scargle periodogram and its single-period harmonic fit. This is
  * the canonical "is there a daily/weekly rhythm" tool when the samples
  * are irregular — binning-based ACF (see [[graft.events.Correlation]])
  * loses power when bins are sparse, while Lomb–Scargle evaluates the
  * harmonic least-squares fit AT THE RAW SAMPLE TIMES (Lomb 1976,
  * Scargle 1982; the floating-mean / "generalized" form with a fitted
  * intercept is Zechmeister & Kürster 2009, and VanderPlas 2018 §5 shows
  * it is exactly the R² of the regression x ~ 1 + cos ωt + sin ωt).
  * The reference library stops at moving_average/distribution; this is
  * the public textbook extension for its own data model.
  *
  * Engine-exactness discipline (the repo's psiDrift/perplexity
  * convention): per-row cos/sin are quantized to the 1e-6 integer grid
  * and values to the 1e-3 grid BEFORE any sum, so all ten sufficient
  * statistics are LONG-exact and partial-aggregation order cannot move
  * a bit. The final power/coefficients are then a FIXED sequence of
  * IEEE +,-,*,/ (and one correctly-rounded sqrt) on identical operands
  * in any engine — no transcendental function ever runs on an
  * aggregate, so a DuckDB replay matches bit-for-bit before the final
  * round(…, 6). (Per-row trig is safe: both engines' cos/sin are within
  * 1 ulp, ~1e-16, while the 1e-6 grid decides at 5e-7.)
  *
  * Scale shape: one explode by |periods| (a small constant), one
  * hash(key, period) aggregate with map-side partials — no windows, no
  * joins, no driver state; the shuffle carries ten longs per (key,
  * period), never rows. Long sums are exact up to ~9e6 points per
  * (key, period) (x_q·c_q ≤ 1e12 per row); beyond that switch the four
  * product sums to decimal(38,0) as mergeSum does.
  */
object Spectral {

  /** 2π as the shortest-repr double literal 6.283185307179586 — the
    * same double DuckDB parses from that literal and the same double
    * `2 * math.Pi` produces (doubling is exact). */
  private val TwoPi: Double = 2 * math.Pi

  /** The ten long-exact sufficient statistics per (key, period):
    * n, Σx, Σx², Σc, Σs, Σc², Σs², Σcs, Σxc, Σxs over quantized
    * x (1e-3 grid) and c = cos(2π(t mod P)/P), s = sin(…) (1e-6 grid).
    * `t mod P` keeps the angle in [0, 2π) so cos/sin never range-reduce
    * a large argument (where libm implementations diverge most). */
  private def sums(df: DataFrame, periodsUs: Seq[Long]): DataFrame = {
    require(periodsUs.nonEmpty && periodsUs.forall(_ > 0),
      "periods must be positive")
    val withP = df.filter(col(V).isNotNull && col(T) >= 0)
      .withColumn("_p", explode(lit(periodsUs.toArray)))
    val ang = (lit(TwoPi) * (col(T) % col("_p")).cast("double")) /
      col("_p").cast("double")
    // floor(x·grid + ½), not round(): round()'s half-up tie-break is not
    // engine-portable (see Correlation.theilSen)
    val q = withP
      .withColumn("_x", floor(col(V) * 1000 + 0.5).cast("long"))
      .withColumn("_c", floor(cos(ang) * 1000000 + 0.5).cast("long"))
      .withColumn("_s", floor(sin(ang) * 1000000 + 0.5).cast("long"))
    q.groupBy(col(K), col("_p")).agg(
      count(lit(1)).as("_n"),
      sum(col("_x")).as("_sx"),
      sum(col("_x") * col("_x")).as("_sxx"),
      sum(col("_c")).as("_sc"),
      sum(col("_s")).as("_ss"),
      sum(col("_c") * col("_c")).as("_scc"),
      sum(col("_s") * col("_s")).as("_sss"),
      sum(col("_c") * col("_s")).as("_scs"),
      sum(col("_x") * col("_c")).as("_sxc"),
      sum(col("_x") * col("_s")).as("_sxs"))
  }

  /** Centered second moments and the 2×2 normal-equation solve, shared
    * by periodogram and harmonicFit. Returns (nD, Vxx, det, a, b,
    * explained) column expressions over a [[sums]] frame. Every
    * centered moment is written `S·· − S·*S·/n` in that exact order so
    * the DuckDB replay is the identical IEEE sequence. */
  private def solve(): (org.apache.spark.sql.Column, org.apache.spark.sql.Column,
      org.apache.spark.sql.Column, org.apache.spark.sql.Column,
      org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    val nD = col("_n").cast("double")
    def d(c: String) = col(c).cast("double")
    val vxx = d("_sxx") - d("_sx") * d("_sx") / nD
    val vcc = d("_scc") - d("_sc") * d("_sc") / nD
    val vss = d("_sss") - d("_ss") * d("_ss") / nD
    val vcs = d("_scs") - d("_sc") * d("_ss") / nD
    val vxc = d("_sxc") - d("_sx") * d("_sc") / nD
    val vxs = d("_sxs") - d("_sx") * d("_ss") / nD
    val det = vcc * vss - vcs * vcs
    val a = (vss * vxc - vcs * vxs) / det
    val b = (vcc * vxs - vcs * vxc) / det
    val explained = a * vxc + b * vxs
    (nD, vxx, det, a, b, explained)
  }

  /** Floating-mean Lomb–Scargle periodogram: for each key and each
    * trial period P, the fraction of the series' variance explained by
    * the best-fit sinusoid of period P plus an intercept — R² of
    * x ~ 1 + cos(2πt/P) + sin(2πt/P), in [0, 1], evaluated at the raw
    * irregular sample times. Output (key, period_us, n, power); power
    * is null when n < minPoints or the design is degenerate (zero
    * variance, or collinear cos/sin — e.g. all samples at the same
    * phase). */
  def periodogram(
      df: DataFrame,
      periodsUs: Seq[Long],
      minPoints: Int = 16): DataFrame = {
    val s = sums(df, periodsUs)
    val (_, vxx, det, _, _, explained) = solve()
    s.select(col(K), col("_p").as("period_us"), col("_n").as("n"),
      when(col("_n") >= minPoints && det > 0 && vxx > 0,
        round(explained / vxx, 6)).as("power"))
  }

  /** Normalized spectral entropy of the periodogram ladder per key —
    * the CONCENTRATION complement of the dominant-cycle argmax
    * (q177): one sharp peak reads near 0, power spread evenly over
    * the trial periods reads near 1. Powers (already rounded to the
    * 1e-6 grid) are lifted to exact integers p_q, so with
    * S = Σp_q and the shared quantized-ln algebra
    * ([[graft.core.Quant]]),
    *
    *   H = ln S − (Σ p_q·ln p_q)/S   (nats, computed on the 2^20 grid)
    *   flatness = H / ln(n_periods)  ∈ [0, 1]
    *
    * both reduce to exact long sums plus one fixed float chain.
    * Periods with null or zero power contribute nothing; flatness is
    * null when fewer than 2 periods carry power. Output (key,
    * n_periods, spectral_entropy_bits, flatness).
    *
    * Scale: [[periodogram]]'s single aggregate plus a per-key
    * |periods|-row reduction — nothing data-sized is added. */
  def spectralEntropy(
      df: DataFrame,
      periodsUs: Seq[Long],
      minPoints: Int = 16): DataFrame = {
    import graft.core.Quant.qln20
    val q = periodogram(df, periodsUs, minPoints)
      .filter(col("power").isNotNull)
      .select(col(K),
        floor(col("power") * 1000000 + 0.5).cast("long").as("_pq"))
      .filter(col("_pq") > 0)
    val g = q.groupBy(col(K)).agg(count(lit(1)).as("n_periods"),
      sum(col("_pq")).as("_s"),
      sum(col("_pq") * qln20(col("_pq"))).as("_sq"))
    val hNum = (col("_s") * qln20(col("_s")) - col("_sq")).cast("double")
    val hBits = hNum / lit(1048576.0) / col("_s").cast("double") /
      lit(0.6931471805599453)
    val flat = hNum / col("_s").cast("double") /
      qln20(col("n_periods")).cast("double")
    g.select(col(K), col("n_periods"),
      round(hBits, 6).as("spectral_entropy_bits"),
      when(col("n_periods") >= 2, round(flat, 6)).as("flatness"))
  }

  /** Harmonic fit at ONE period: the least-squares coefficients of
    * x ≈ μ + a·cos(2πt/P) + b·sin(2πt/P) in ORIGINAL value units, the
    * amplitude √(a²+b²) (sqrt is IEEE correctly-rounded, so it is
    * engine-exact on identical operands), and the fit R². Phase is
    * deliberately (a, b) rather than atan2(b, a): atan2 is not
    * correctly-rounded and would break the bit-exact oracle contract.
    * Output (key, n, a, b, amp, r2), degenerate keys yield nulls. */
  def harmonicFit(
      df: DataFrame,
      periodUs: Long,
      minPoints: Int = 16): DataFrame = {
    val s = sums(df, Seq(periodUs))
    val (_, vxx, det, aQ, bQ, explained) = solve()
    // a, b are in (1e-3 x-grid)/(1e-6 trig-grid) units: ×1000 restores
    // original value units
    val a = aQ * 1000
    val b = bQ * 1000
    val ok = col("_n") >= minPoints && det > 0 && vxx > 0
    s.select(col(K), col("_n").as("n"),
      when(ok, round(a, 6)).as("a"),
      when(ok, round(b, 6)).as("b"),
      when(ok, round(sqrt(aQ * aQ + bQ * bQ) * 1000, 6)).as("amp"),
      when(ok, round(explained / vxx, 6)).as("r2"))
  }
}
