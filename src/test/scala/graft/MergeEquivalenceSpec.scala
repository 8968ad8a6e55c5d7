package graft

import graft.merge.MergeOps
import org.apache.spark.sql.functions._

/** Randomized equivalence against the reference: 30 seeded trials of
  * merge(strict_sum | ignorant_sum) over 2-4 series with random times,
  * values (incl. None) and defaults, run through the ACTUAL reference
  * implementation by tools/gen_goldens.py (mirrors
  * tests/test_iterators.py:102-116's merge ≡ iter_merge property). */
class MergeEquivalenceSpec extends SparkSpec {

  test("mergeSum matches the reference on 30 random strict/ignorant trials") {
    val s = spark
    import s.implicits._
    Goldens.mergeTrials.zipWithIndex.foreach { case (trial, i) =>
      val df = trial.input
        .map { case (sid, t, v, _) =>
          ("g", sid.toString, t.toDouble, v.map(Double.box).orNull.asInstanceOf[java.lang.Double])
        }
        .toDF("key", "sid", "t", "v")
        .withColumn("v", col("v").cast("double"))
      val defaults = trial.input
        .map { case (sid, _, _, d) => (sid.toString, d.map(Double.box).orNull.asInstanceOf[java.lang.Double]) }
        .distinct
        .toDF("sid", "default")
        .withColumn("default", col("default").cast("double"))
      val got = collectTV(MergeOps.mergeSum(df, trial.strict, Some(defaults)))
      approxEq(got, trial.expected.map { case (t, v) => (t, v) })
    }
  }
}
