package graft.sample

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mixing. Spark's own
  * `sample`/`sampleBy` draw from a per-partition RNG — the selected set
  * changes with partitioning, which breaks resumable pipelines and
  * cross-engine verification. Here membership is a pure function of the
  * row id: u(id) = first-32-md5-bits(salt ∥ id) / 2^32 is uniform on
  * [0, 1), so `u < fraction` keeps an exact, reproducible, engine-
  * independent fraction regardless of partitioning — and composes with
  * incremental data (a doc's fate never changes as the corpus grows).
  * Pure scan-projection predicate: no shuffle, no state, pushes through
  * any plan.
  */
object Sampling {

  /** Uniform hash of an id column onto [0, 1). */
  def unitHash(id: Column, salt: String = "smp"): Column =
    conv(substring(md5(concat(lit(salt), id.cast("string")).cast("binary")), 1, 8), 16, 10)
      .cast("double") / 4294967296.0

  /** Keep a deterministic `fraction` of rows by id hash. */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double,
      salt: String = "smp"): DataFrame =
    df.filter(unitHash(col(idCol), salt) < fraction)

  /** Per-stratum fractions (training-data mixing ratios): keep row iff
    * u(id) < fractions(stratum), `defaultFraction` for unlisted strata.
    * The id hash is shared across strata, so re-weighting a stratum only
    * adds/removes rows at the threshold boundary — stable mixtures. */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double,
      salt: String = "smp"): DataFrame = {
    val frac = fractions.foldLeft(lit(defaultFraction)) { case (acc, (k, f)) =>
      when(col(strataCol) === k, lit(f)).otherwise(acc)
    }
    df.filter(unitHash(col(idCol), salt) < frac)
  }

  /** Per-group quota: keep at most `n` rows per `groupCol`, best-first by
    * `ord` (web-corpus domain caps — a crawl's hottest domain must not
    * dominate the training mix). Skew-safe two-phase top-N: phase 1 takes
    * a LOCAL top-n per (group, salt-bucket) — `row_number` over
    * (group, pmod(xxhash64(saltBy), salt)) — so a domain with 10^9 pages
    * fans across `salt` tasks instead of one; phase 2 re-ranks the
    * survivors, a frame bounded at salt·n rows per group no matter how
    * hot the group. `ord` must totally order rows within a group
    * (tiebreak on a unique id), or the kept set is nondeterministic.
    * Output keeps all input columns plus the final `rank` (1-based).
    */
  def capPerGroup(
      df: DataFrame,
      groupCol: Column,
      ord: Seq[Column],
      n: Int,
      saltBy: Column,
      salt: Int = 64): DataFrame = {
    require(n > 0 && salt > 0, s"n=$n salt=$salt must be positive")
    import org.apache.spark.sql.expressions.Window
    val w1 = Window.partitionBy(groupCol, pmod(xxhash64(saltBy), lit(salt))).orderBy(ord: _*)
    val local = df.withColumn("_rn", row_number().over(w1)).filter(col("_rn") <= n).drop("_rn")
    val w2 = Window.partitionBy(groupCol).orderBy(ord: _*)
    local.withColumn("rank", row_number().over(w2)).filter(col("rank") <= n)
  }

  /** Temperature-based source mixing (T5/mT5/Pile practice, public): draw
    * source s with probability ∝ n_s^alpha — alpha = 1 is natural
    * proportions, alpha → 0 uniform across sources; a `budget` of total
    * kept rows turns the mixture into per-source acceptance fractions
    * f_s = min(1, budget·w_s / n_s), applied with the same deterministic
    * id-hash membership as [[stratifiedSample]].
    *
    * Scale shape: the per-source count/weight table is a tiny aggregate
    * (one row per source) broadcast-joined back — never driver-side — and
    * the membership test stays a scan-side predicate. f_s is rounded to
    * the 1e-6 grid so the kept set is engine-reproducible (a last-ulp
    * pow() difference cannot flip a membership comparison). Output: input
    * columns + `accept_frac`. */
  def temperatureMix(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      alpha: Double,
      budget: Long,
      salt: String = "smp"): DataFrame = {
    require(alpha >= 0 && budget > 0, s"alpha=$alpha budget=$budget")
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("_n"))
    val tot = counts.agg(sum(pow(col("_n"), alpha)).as("_z")) // 1 row
    val rates = counts.crossJoin(broadcast(tot))
      .select(col(sourceCol).as("_mix_src"),
        round(least(lit(1.0), lit(budget) * pow(col("_n"), alpha) / col("_z") / col("_n")), 6)
          .as("accept_frac"))
    // null-safe join: a NULL source is its own stratum (it was counted in
    // z, so a plain equi-join would both drop its rows AND under-fill the
    // budget for everyone else)
    df.join(broadcast(rates), col(sourceCol) <=> col("_mix_src")).drop("_mix_src")
      .filter(unitHash(col(idCol), salt) < col("accept_frac"))
  }
}
