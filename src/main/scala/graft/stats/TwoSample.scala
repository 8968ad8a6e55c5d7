package graft.stats

import graft.core.SeriesOps.{K, T, V}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-sample distribution-drift tests between two time windows of the
  * same series — "did this signal's value distribution change after the
  * boundary". The classic nonparametric pair: the exact Kolmogorov–
  * Smirnov statistic (max CDF gap) and the Mann–Whitney U rank test
  * (with midrank tie handling). PSI (see GraftQueries.qPsiDrift) bins
  * first and is the monitoring-dashboard form; these are the exact
  * test-statistic forms over the raw quantized values. No reference
  * counterpart; both are textbook statistics (Kolmogorov 1933, Smirnov
  * 1939; Mann & Whitney 1947).
  *
  * Engine-exactness (the repo's integer-grid discipline): values are
  * quantized to the 1e-3 grid, so per-value counts, cumulative counts,
  * and rank sums are exact LONGS; the KS gap is maximized as the
  * cross-multiplied integer |cA·nB − cB·nA| (one double division only
  * at the very end), and the doubled midrank 2·P + t + 1 is an exact
  * integer, so U (doubled) is an exact long. Aggregation order cannot
  * move a bit anywhere.
  *
  * Scale shape: one hash(key, value-bin) aggregate (map-side partials
  * shrink the shuffle to the distinct-value histogram), one per-key
  * ordered window over the HISTOGRAM (bins, not rows), one final per-key
  * aggregate. The cross-multiplied longs bound |cA·nB| by n²: past
  * ~3·10⁹ points per key switch the products to DECIMAL(38,0)
  * (documented, three orders of magnitude above any test SF per key —
  * and a 100 TB deployment runs these per retention window, not over
  * all history).
  */
object TwoSample {

  /** Per-(key, value-bin) counts in window A (t < splitAt) and B
    * (t ≥ splitAt), with cumulative counts in value order and per-key
    * totals. One aggregate + one histogram-sized window. */
  private def histAB(df: DataFrame, splitAt: Column): DataFrame = {
    val q = df.filter(col(V).isNotNull)
      .withColumn("_x", floor(col(V) * 1000 + 0.5).cast("long"))
      .withColumn("_a", (col(T) < splitAt).cast("long"))
    val cnt = q.groupBy(col(K), col("_x")).agg(
      sum(col("_a")).as("_ca"),
      sum(lit(1L) - col("_a")).as("_cb"))
    val wCum = Window.partitionBy(col(K)).orderBy(col("_x").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(K))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cnt
      .withColumn("_cca", sum(col("_ca")).over(wCum))
      .withColumn("_ccb", sum(col("_cb")).over(wCum))
      .withColumn("_na", sum(col("_ca")).over(wAll))
      .withColumn("_nb", sum(col("_cb")).over(wAll))
  }

  /** Exact two-sample Kolmogorov–Smirnov statistic per key between the
    * windows before/after `splitAt`: D = max over value bins of
    * |F_A(x) − F_B(x)|, maximized as the exact integer
    * |cA·nB − cB·nA| and divided by nA·nB once at the end. Output
    * (key, n_a, n_b, d_num, d); d is null when either window is empty. */
  def ks(df: DataFrame, splitAt: Column): DataFrame =
    histAB(df, splitAt)
      .groupBy(col(K))
      .agg(
        max(col("_na")).as("n_a"),
        max(col("_nb")).as("n_b"),
        max(abs(col("_cca") * col("_nb") - col("_ccb") * col("_na")))
          .as("d_num"))
      .withColumn("d",
        when(col("n_a") > 0 && col("n_b") > 0,
          round(col("d_num").cast("double") /
            (col("n_a") * col("n_b")).cast("double"), 6)))

  /** Mann–Whitney U between the same two windows, midrank ties: with
    * P(x) = count of values strictly below bin x and t(x) the bin's
    * size, the DOUBLED average rank 2·P + t + 1 is an exact integer, so
    * u2 = 2·U_A = Σ_x cA(x)·(2P+t+1) − nA·(nA+1) is an exact long.
    * `auc` = U_A/(nA·nB) is the probability-of-superiority (ROC-AUC)
    * effect size: P(random A value > random B value) + ½·P(tie).
    * Output (key, n_a, n_b, u2, auc); auc null when a window is empty. */
  def mannWhitney(df: DataFrame, splitAt: Column): DataFrame = {
    val h = histAB(df, splitAt)
      .withColumn("_t", col("_ca") + col("_cb"))
      // 2·(avg rank of this bin's members) = 2·(P + (t+1)/2) = 2P+t+1,
      // P = cumulative total strictly below = running total minus own t
      .withColumn("_dr",
        lit(2L) * (col("_cca") + col("_ccb") - col("_t")) + col("_t") + 1L)
    h.groupBy(col(K))
      .agg(
        max(col("_na")).as("n_a"),
        max(col("_nb")).as("n_b"),
        sum(col("_ca") * col("_dr")).as("_ra2"))
      .withColumn("u2", col("_ra2") - col("n_a") * (col("n_a") + 1L))
      .withColumn("auc",
        when(col("n_a") > 0 && col("n_b") > 0,
          round(col("u2").cast("double") /
            (lit(2.0) * (col("n_a") * col("n_b")).cast("double")), 6)))
      .select(col(K), col("n_a"), col("n_b"), col("u2"), col("auc"))
  }

  /** Cramér–von Mises two-sample statistic between the same two windows
    * — the INTEGRAL counterpart of KS's supremum, sensitive to
    * distributed (not just single-point) CDF differences:
    * T = nA·nB/N² · Σ_pooled (F_A − F_B)² = S/(nA·nB·N²) with
    * S = Σ_x t(x)·(cA·nB − cB·nA)² accumulated in DECIMAL(38,0) /
    * HUGEINT (d² alone reaches n⁴), so the only float ops are the final
    * conversions and divisions. Output (key, n_a, n_b, t_stat). */
  def cvm(df: DataFrame, splitAt: Column): DataFrame = {
    val h = histAB(df, splitAt)
      .withColumn("_d", col("_cca") * col("_nb") - col("_ccb") * col("_na"))
      .withColumn("_sterm",
        (col("_ca") + col("_cb")).cast("decimal(38,0)") *
          (col("_d").cast("decimal(38,0)") * col("_d")))
    h.groupBy(col(K))
      .agg(
        max(col("_na")).as("n_a"),
        max(col("_nb")).as("n_b"),
        sum(col("_sterm")).as("_s"))
      .withColumn("t_stat",
        when(col("n_a") > 0 && col("n_b") > 0, {
          val n = (col("n_a") + col("n_b")).cast("double")
          round(col("_s").cast("double") /
            ((col("n_a") * col("n_b")).cast("double") * (n * n)), 6)
        }))
      .select(col(K), col("n_a"), col("n_b"), col("t_stat"))
  }

  /** Wasserstein-1 (earth-mover) distance between the same two windows,
    * in ORIGINAL value units — on the line it is ∫|F_A − F_B| dx, i.e.
    * Σ over value bins of |cA·nB − cB·nA| · (gap to next bin), one
    * division by nA·nB·1000 at the end (1000 undoes the 1e-3 grid).
    * The distance-flavored drift number ("HOW FAR did the distribution
    * move", where KS/CvM say how separable). Output (key, n_a, n_b, w1). */
  def wasserstein1(df: DataFrame, splitAt: Column): DataFrame = {
    val wNext = Window.partitionBy(col(K)).orderBy(col("_x").asc)
    val h = histAB(df, splitAt)
      .withColumn("_gap", lead(col("_x"), 1).over(wNext) - col("_x"))
      .withColumn("_d",
        abs(col("_cca") * col("_nb") - col("_ccb") * col("_na")))
      .withColumn("_wterm",
        when(col("_gap").isNotNull,
          col("_d").cast("decimal(38,0)") * col("_gap"))
          .otherwise(lit(0L).cast("decimal(38,0)")))
    h.groupBy(col(K))
      .agg(
        max(col("_na")).as("n_a"),
        max(col("_nb")).as("n_b"),
        sum(col("_wterm")).as("_s"))
      .withColumn("w1",
        when(col("n_a") > 0 && col("n_b") > 0,
          round(col("_s").cast("double") /
            ((col("n_a") * col("n_b")).cast("double") * 1000.0), 6)))
      .select(col(K), col("n_a"), col("n_b"), col("w1"))
  }

  /** Pettitt changepoint test — the Mann–Whitney statistic maximized
    * over every time split: with doubled midranks dr_i (exact integers,
    * same 2P+t+1 trick as [[mannWhitney]]),
    * U_t = Σ_{i≤t} dr_i − t·(n+1) is exact, K = max_{1≤t<n} |U_t|, and
    * the changepoint is AFTER the earliest t attaining K. The classic
    * approximate significance is p ≈ 2·exp(−6K²/(n³+n²)); exp is not
    * correctly rounded, so the EXPONENT −6K²/(n³+n²) is emitted instead
    * (a fixed IEEE sequence on integer-derived doubles) and the caller
    * exponentiates. Output (key, n, k_stat, cp_t, p_exponent); keys with
    * fewer than 2 points have no split to test and are absent.
    *
    * Scale: one per-key value-ordered rank window + one time-ordered
    * cumulative window + one aggregate — run per retention window at
    * 100 TB like every whole-history scan here. */
  def pettitt(df: DataFrame): DataFrame = {
    val wVal = Window.partitionBy(col(K)).orderBy(col("_x").asc)
    val wTime = Window.partitionBy(col(K)).orderBy(col(T).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(K))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val q = df.filter(col(V).isNotNull)
      .withColumn("_x", floor(col(V) * 1000 + 0.5).cast("long"))
      // doubled midrank: rank() gives 1 + count(< x) for every peer, and
      // the peer-group size comes from a (key, x) count window
      .withColumn("_dr",
        lit(2L) * (rank().over(wVal) - 1L) +
          count(lit(1)).over(Window.partitionBy(col(K), col("_x"))) + 1L)
      .withColumn("_n", count(lit(1)).over(wAll))
      .withColumn("_i", row_number().over(Window.partitionBy(col(K))
        .orderBy(col(T).asc)))
      .withColumn("_u",
        sum(col("_dr")).over(wTime) - col("_i") * (col("_n") + 1L))
    val agg = q.filter(col("_i") < col("_n"))
      .groupBy(col(K))
      .agg(
        max(col("_n")).as("n"),
        // lexicographic max on (|U|, -t): largest K, then EARLIEST t
        max(struct(abs(col("_u")).as("k"), (-col(T)).as("nt"))).as("_m"))
      .select(col(K), col("n"),
        col("_m.k").as("k_stat"), (-col("_m.nt")).as("cp_t"))
    val nD = col("n").cast("double")
    val kD = col("k_stat").cast("double")
    agg.select(col(K), col("n"), col("k_stat"), col("cp_t"),
      when(col("n") >= 2,
        round(lit(-6.0) * (kD * kD) / (nD * nD * nD + nD * nD), 6))
        .as("p_exponent"))
  }
}
