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
}
