package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count registers (Flajolet et al. 2007) with a
  * fully engine-deterministic algebra, so sketches AND estimates replay
  * exactly in the DuckDB oracle — the same md5-grid trick as [[Kmv]],
  * extended to HLL's fixed-size register form (the industry-standard
  * mergeable distinct sketch: 512 small ints per group regardless of
  * cardinality, where KMV holds k hashes).
  *
  * Hash layout on the 60-bit md5 grid: top P=9 bits select one of
  * M=512 registers, the remaining W=51 bits feed the rank
  * rho = (#leading zeros of the W-bit remainder) + 1 ∈ [1, 52],
  * computed EXACTLY as `52 - bitLength(rest)` via the minimal binary
  * string (`bin()` in both Spark and DuckDB — no floating log2).
  * A register is max(rho) — a max-algebra, so the tier merge is
  * LOSSLESS: daily registers merged from 24 hourly register sets are
  * row-identical to registers built from the raw day (the
  * continuous-aggregate property the oracle verifies).
  *
  * Estimate: alpha_m·m²/Σ2^(−M[j]) with the small-range linear-counting
  * correction. The harmonic sum is computed as an exact INTEGER —
  * every term 2^(−rho) is scaled by 2^52 so a register contributes
  * 2^(52−rho) ≤ 2^51 and an unhit register 2^52; the total is
  * ≤ 512·2^52 = 2^61 < 2^63, order-independent in long arithmetic.
  * Only the final division and ln touch floats, each one fixed IEEE
  * expression on identical operands in both engines.
  *
  * Scale: the shuffle carries (group, idx, rho) rows — at most
  * 512·|groups| after the map-side partial max — never values or
  * hashes; estimate is one grid-bounded aggregate. Register state per
  * task is O(registers-in-partition), never O(distinct values).
  */
object Hll {
  val P = 9
  val M = 512           // 2^P registers
  val W = 51            // 60 - P remainder bits; rho in [1, W+1]
  val RestMask = (1L << W) - 1

  /** alpha_512 · m² · 2^52 — the one float constant of the estimator,
    * embedded verbatim in the oracle SQL (Double.toString round-trips). */
  val EstConst: Double = 0.7213 / (1.0 + 1.079 / M) * math.pow(2.0, 70)

  /** rho of a 60-bit hash column: leading-zero count of the low-W-bit
    * remainder, plus one. Exact integer algebra (no log2). */
  def rho(h: Column): Column = {
    val rest = h.bitwiseAND(lit(RestMask))
    when(rest === 0L, lit(W + 1)).otherwise(lit(W + 1) - length(bin(rest)))
  }

  /** HLL registers per group: (groupCols*, idx, rho) rows, one per HIT
    * register (unhit registers are implicit — the estimator accounts
    * for them; carrying 512·|groups| explicit zeros would only pad the
    * shuffle). */
  def registers(df: DataFrame, groupCols: Seq[String], valueCol: String,
      salt: String = "hll"): DataFrame = {
    val h = Kmv.hash60(col(valueCol), salt)
    // nulls don't count as a distinct value (count-distinct semantics);
    // unfiltered they'd hash to a phantom (idx=null) register that
    // inflates n_regs and biases the zero-register correction
    df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ shiftright(h, W).as("idx") :+
        rho(h).as("rho"): _*)
      .groupBy(groupCols.map(col) :+ col("idx"): _*)
      .agg(max(col("rho")).as("rho"))
  }

  /** Lossless tier merge: re-group member registers to a coarser key —
    * e.g. (key, hour) → (key, day). max of per-hour maxima IS the max
    * over the day, so the merged registers are row-identical to
    * registers built from the raw day. */
  def merge(regs: DataFrame, groupCols: Seq[String]): DataFrame =
    regs.groupBy(groupCols.map(col) :+ col("idx"): _*)
      .agg(max(col("rho")).as("rho"))

  /** Distinct-count estimate per group from register rows. Output
    * (groupCols*, n_regs, est_distinct): n_regs = hit registers,
    * est_distinct = the corrected HLL estimate rounded to the 1e-6
    * grid. */
  def estimate(regs: DataFrame, groupCols: Seq[String]): DataFrame = {
    val s = regs.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast("int").as("n_regs"),
        // functions.shiftleft only takes a literal shift; the catalyst
        // expression itself accepts a column
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${W + 1} - rho)")).as("_hit"))
    // exact integer harmonic sum, scaled by 2^(W+1): unhit registers
    // (rho 0) contribute 2^(W+1) each
    val n = s.withColumn("_n",
      col("_hit") + (lit(M.toLong) - col("n_regs")) * lit(1L << (W + 1)))
    val eRaw = lit(EstConst) / col("_n").cast("double")
    val v = lit(M) - col("n_regs") // zero registers
    val est = when(eRaw <= lit(2.5 * M) && v > 0,
      lit(M.toDouble) * log(lit(M.toDouble) / v.cast("double")))
      .otherwise(eRaw)
    n.select(groupCols.map(col) :+ col("n_regs") :+
      round(est, 6).as("est_distinct"): _*)
  }
}
