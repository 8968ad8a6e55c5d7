package graft

import graft.sketch.Kmv
import org.apache.spark.sql.functions._

/** KMV distinct sketch: merge losslessness (the continuous-aggregate
  * property), exact-below-k reporting, and the (k−1)/h_k estimator. */
class SketchSpec extends SparkSpec {

  private def mkRows(n: Int, distinct: Int) = {
    val s = spark
    import s.implicits._
    (1 to n).map(i => ("et", (i % 3).toLong, s"user${i % distinct}"))
      .toDF("k", "hour", "u")
  }

  test("kmv: hourly→daily merge equals the sketch built directly from raw") {
    val rows = mkRows(500, 97)
    val hourly = Kmv.sketch(rows, Seq("k", "hour"), "u", k = 16)
    assert(hourly.count() == 3)
    val daily = Kmv.merge(hourly.withColumn("day", lit(0L)), Seq("k", "day"), 16)
    val direct = Kmv.sketch(rows.withColumn("day", lit(0L)), Seq("k", "day"), "u", 16)
    assert(daily.select("kmv").head().getSeq[Long](0) ==
      direct.select("kmv").head().getSeq[Long](0))
  }

  test("kmv: unsaturated sketch reports the exact distinct count") {
    val rows = mkRows(300, 40) // 40 distinct < k = 64
    val sk = Kmv.sketch(rows.withColumn("day", lit(0L)), Seq("k", "day"), "u", 64)
    val est = sk.select(Kmv.estimate(col("kmv"), 64)).head().getDouble(0)
    assert(est == 40.0)
    assert(sk.select(size(col("kmv"))).head().getInt(0) == 40)
  }

  test("kmv: saturated estimate is exactly (k-1)·2^60/h_k, sane accuracy") {
    val rows = mkRows(500, 97)
    val sk = Kmv.sketch(rows.withColumn("day", lit(0L)), Seq("k", "day"), "u", 16)
    val kmv = sk.select(col("kmv")).head().getSeq[Long](0)
    assert(kmv.size == 16 && kmv == kmv.sorted)
    val est = sk.select(Kmv.estimate(col("kmv"), 16)).head().getDouble(0)
    val expected = BigDecimal(15.0 * 1152921504606846976.0 / kmv.last)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(est == expected)
    // k = 16 has ~27% standard error; a fixed hash is deterministic, so a
    // loose band guards against formula regressions, not luck
    assert(est > 97 * 0.4 && est < 97 * 2.5, s"est $est vs true 97")
  }
}
