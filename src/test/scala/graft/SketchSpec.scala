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

  test("kmv intersect: both unsaturated reports the exact overlap") {
    val s = spark
    import s.implicits._
    // A = u0..u39, B = u25..u59 -> overlap 15, k = 64 holds everything
    val a = (0 until 40).map(i => ("g", 0L, s"u$i")).toDF("k", "day", "u")
    val b = (25 until 60).map(i => ("g", 0L, s"u$i")).toDF("k", "day", "u")
    val out = Kmv.intersectEstimate(
      Kmv.sketch(a, Seq("k", "day"), "u", 64),
      Kmv.sketch(b, Seq("k", "day"), "u", 64), Seq("k", "day"), 64)
      .head()
    assert(out.getLong(2) == 15L && out.getDouble(3) == 15.0)
  }

  test("kmv intersect: saturated estimate replays n_both * 2^60 / theta") {
    val s = spark
    import s.implicits._
    val a = (0 until 300).map(i => ("g", 0L, s"u$i")).toDF("k", "day", "u")
    val b = (150 until 450).map(i => ("g", 0L, s"u$i")).toDF("k", "day", "u")
    val sa = Kmv.sketch(a, Seq("k", "day"), "u", 16)
    val sb = Kmv.sketch(b, Seq("k", "day"), "u", 16)
    val out = Kmv.intersectEstimate(sa, sb, Seq("k", "day"), 16).head()
    val ka = sa.head().getSeq[Long](2)
    val kb = sb.head().getSeq[Long](2)
    val theta = math.min(ka(15), kb(15))
    val nb = ka.toSet.intersect(kb.toSet).count(_ < theta)
    assert(out.getLong(2) == nb.toLong)
    val expected = BigDecimal(nb * 1152921504606846976.0 / theta)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.getDouble(3) == expected)
    // true overlap 150 of 300/300; k=16 is noisy but the estimate must
    // land in a sane band (deterministic hash -> regression guard)
    assert(out.getDouble(3) > 150 * 0.25 && out.getDouble(3) < 150 * 4.0)
  }

  test("kmv intersect: disjoint sides estimate 0") {
    val s = spark
    import s.implicits._
    val a = (0 until 200).map(i => ("g", 0L, s"a$i")).toDF("k", "day", "u")
    val b = (0 until 200).map(i => ("g", 0L, s"b$i")).toDF("k", "day", "u")
    val out = Kmv.intersectEstimate(
      Kmv.sketch(a, Seq("k", "day"), "u", 16),
      Kmv.sketch(b, Seq("k", "day"), "u", 16), Seq("k", "day"), 16).head()
    assert(out.getLong(2) == 0L && out.getDouble(3) == 0.0)
  }

  import graft.sketch.GridHist

  test("gridhist: hourly→daily bin-wise sum equals the sketch built from raw") {
    val s = spark
    import s.implicits._
    val rows = (1 to 400).map(i => ("et", (i % 4).toLong, (i % 83) * 1.7))
      .toDF("k", "hour", "v")
    val hourly = GridHist.sketch(rows, Seq("k", "hour"), "v", 0.0, 150.0, 15)
    val daily = GridHist.merge(hourly.withColumn("day", lit(0L)), Seq("k", "day"))
    val direct = GridHist.sketch(rows.withColumn("day", lit(0L)),
      Seq("k", "day"), "v", 0.0, 150.0, 15)
    val a = daily.collect().map(r => (r.getLong(2), r.getLong(3))).toSet
    val b = direct.collect().map(r => (r.getLong(2), r.getLong(3))).toSet
    assert(a == b && a.nonEmpty)
  }

  test("gridhist: interpolated quantiles, q=0/q=1 edges, hand case") {
    val s = spark
    import s.implicits._
    // 4x value 5 (bin 0), 4x 15 (bin 1), 2x 25 (bin 2); n = 10
    val rows = (Seq.fill(4)(5.0) ++ Seq.fill(4)(15.0) ++ Seq.fill(2)(25.0))
      .map(v => ("g", 0L, v)).toDF("k", "day", "v")
    val sk = GridHist.sketch(rows, Seq("k", "day"), "v", 0.0, 100.0, 10)
    val out = GridHist.quantiles(sk, Seq("k", "day"), Seq(0.0, 0.5, 1.0),
      0.0, 100.0, 10)
      .collect().map(r => (r.getDouble(2), r.getDouble(3))).toMap
    assert(out(0.0) == 0.0)   // first occupied bin's lower edge
    assert(out(0.5) == 12.5)  // target 5: bin 1, frac (5-4)/4
    assert(out(1.0) == 30.0)  // last occupied bin's upper edge
  }

  test("gridhist: out-of-range values clamp to the edge bins") {
    val s = spark
    import s.implicits._
    val rows = Seq(("g", 0L, -50.0), ("g", 0L, 5.0), ("g", 0L, 999.0))
      .toDF("k", "day", "v")
    val sk = GridHist.sketch(rows, Seq("k", "day"), "v", 0.0, 100.0, 10)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toMap
    assert(sk == Map(0L -> 2L, 9L -> 1L))
  }

  import graft.sketch.CountMin

  test("cms: hourly→daily cell-wise sum equals the sketch built from raw") {
    val rows = mkRows(500, 97)
    val hourly = CountMin.sketch(rows, Seq("k", "hour"), "u", d = 4, w = 64)
    val daily = CountMin.merge(hourly.withColumn("day", lit(0L)), Seq("k", "day"))
    val direct = CountMin.sketch(rows.withColumn("day", lit(0L)),
      Seq("k", "day"), "u", d = 4, w = 64)
    val a = daily.collect().map(r =>
      (r.getAs[Long]("day"), r.getAs[Int]("r"), r.getAs[Long]("c"), r.getAs[Long]("cnt"))).toSet
    val b = direct.collect().map(r =>
      (r.getAs[Long]("day"), r.getAs[Int]("r"), r.getAs[Long]("c"), r.getAs[Long]("cnt"))).toSet
    assert(a == b)
  }

  test("cms: estimates never undercount (the one-sided error guarantee)") {
    val s = spark
    import s.implicits._
    // w = 32 << 97 distinct: collisions everywhere, est must still be >= n
    val rows = mkRows(500, 97).withColumn("day", lit(0L))
    val sk = CountMin.sketch(rows, Seq("k", "day"), "u", d = 4, w = 32)
    val exact = rows.groupBy("k", "day", "u").count()
      .collect().map(r => (r.getString(2), r.getLong(3))).toMap
    val probes = exact.keys.map(u => ("et", 0L, u)).toSeq.toDF("k", "day", "u")
    val ests = CountMin.lookup(sk, Seq("k", "day"), probes, "u", d = 4, w = 32)
      .collect().map(r => (r.getString(2), r.getLong(3))).toMap
    exact.foreach { case (u, n) =>
      assert(ests(u) >= n, s"CMS undercounted $u: ${ests(u)} < $n")
    }
  }

  test("cms: wide grid is exact; absent probe hits an empty cell and reads 0") {
    val s = spark
    import s.implicits._
    val rows = mkRows(300, 20).withColumn("day", lit(0L))
    val sk = CountMin.sketch(rows, Seq("k", "day"), "u", d = 4, w = 8192)
    val exact = rows.groupBy("k", "day", "u").count()
    val probes = exact.select("k", "day", "u")
    val joined = CountMin.lookup(sk, Seq("k", "day"), probes, "u", d = 4, w = 8192)
      .join(exact, Seq("k", "day", "u"))
      .collect().map(r => (r.getLong(3), r.getLong(4)))
    // 20 distinct into 8192 columns x 4 rows: the min cell is collision-free
    joined.foreach { case (est, n) => assert(est == n) }
    // at this occupancy an unseen value's 4 cells can't ALL collide
    val ghost = CountMin.lookup(sk, Seq("k", "day"),
      Seq(("et", 0L, "never-seen")).toDF("k", "day", "u"), "u", d = 4, w = 8192)
      .collect()
    assert(ghost.length == 1 && ghost.head.getLong(3) == 0L)
  }

  test("cms: sketch is partitioning-invariant") {
    val rows = mkRows(400, 50)
    val a = CountMin.sketch(rows, Seq("k", "hour"), "u", d = 2, w = 16)
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4))).toSet
    val b = CountMin.sketch(rows.repartition(13), Seq("k", "hour"), "u", d = 2, w = 16)
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4))).toSet
    assert(a == b)
  }

  test("kmv difference: identical sides read 0; disjoint unsaturated sides are exact") {
    val s = spark
    import s.implicits._
    val a = (0 until 40).map(i => ("k", 0L, s"a$i")).toDF("k", "day", "u")
    val b = (0 until 25).map(i => ("k", 0L, s"b$i")).toDF("k", "day", "u")
    def sk(df: org.apache.spark.sql.DataFrame) =
      Kmv.sketch(df, Seq("k", "day"), "u", k = 64)
    val same = Kmv.differenceEstimate(sk(a), sk(a), Seq("k", "day"), 64).head()
    assert(same.getLong(2) == 0L && same.getDouble(3) == 0.0)
    // both unsaturated and disjoint: |A \ B| = |A| exactly
    val dis = Kmv.differenceEstimate(sk(a), sk(b), Seq("k", "day"), 64).head()
    assert(dis.getLong(2) == 40L && dis.getDouble(3) == 40.0)
    // algebra check on saturated sketches: est(A\B) + est(A∩B) uses the
    // same theta sample, so the two counts partition A's sub-theta hashes
    val bigA = (0 until 400).map(i => ("k", 0L, s"x$i")).toDF("k", "day", "u")
    val bigB = (150 until 500).map(i => ("k", 0L, s"x$i")).toDF("k", "day", "u")
    val d = Kmv.differenceEstimate(sk(bigA), sk(bigB), Seq("k", "day"), 32).head()
    val i = Kmv.intersectEstimate(sk(bigA), sk(bigB), Seq("k", "day"), 32).head()
    val est = d.getDouble(3) + i.getDouble(3)
    assert(math.abs(est - 400) / 400 < 0.5, s"|A| estimate $est")
    assert(math.abs(d.getDouble(3) - 150) / 150 < 0.8, s"diff est ${d.getDouble(3)}")
    // a group present ONLY in A must still emit (|A \ ∅| = |A|): the
    // round-4 ADVICE case the former inner join silently dropped
    val a2 = a.unionByName(
      (0 until 7).map(i => ("only", 0L, s"o$i")).toDF("k", "day", "u"))
    val only = Kmv.differenceEstimate(sk(a2), sk(b), Seq("k", "day"), 64)
      .filter(col("k") === "only").head()
    assert(only.getLong(2) == 7L && only.getDouble(3) == 7.0)
  }

  // ---- HLL ----

  /** Sequential register reference on the same md5 grid as Hll. */
  private def refRegisters(values: Seq[String]): Map[Long, Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    values.foldLeft(Map.empty[Long, Int]) { (regs, v) =>
      val hex = md.digest(("hll" + v).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      val h = java.lang.Long.parseLong(hex, 16)
      val idx = h >> graft.sketch.Hll.W
      val rest = h & graft.sketch.Hll.RestMask
      val rho = if (rest == 0L) graft.sketch.Hll.W + 1
        else graft.sketch.Hll.W + 1 - (64 - java.lang.Long.numberOfLeadingZeros(rest))
      regs.updated(idx, math.max(regs.getOrElse(idx, 0), rho))
    }
  }

  test("hll: register algebra equals the sequential md5 reference") {
    val s = spark
    import s.implicits._
    val users = (0 until 300).map(i => s"user${i % 73}")
    val df = users.map(u => ("et", 0L, u)).toDF("k", "day", "u")
    val got = graft.sketch.Hll.registers(df, Seq("k", "day"), "u")
      .collect().map(r => r.getLong(2) -> r.getInt(3)).toMap
    assert(got == refRegisters(users))
  }

  test("hll: hourly→daily max-merge equals registers built from raw") {
    val rows = mkRows(2000, 311)
    val hourly = graft.sketch.Hll.registers(rows, Seq("k", "hour"), "u")
    val daily = graft.sketch.Hll.merge(
      hourly.withColumn("day", lit(0L)), Seq("k", "day"))
    val direct = graft.sketch.Hll.registers(
      rows.withColumn("day", lit(0L)), Seq("k", "day"), "u")
    val m = daily.select("idx", "rho").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toSet
    val d = direct.select("idx", "rho").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toSet
    assert(m == d && m.nonEmpty)
  }

  test("hll: estimate lands inside the 512-register error band") {
    val s = spark
    import s.implicits._
    for (distinct <- Seq(100, 5000)) {
      val df = (0 until distinct).map(i => ("et", 0L, s"v$i-$distinct"))
        .toDF("k", "day", "u")
      val regs = graft.sketch.Hll.registers(df, Seq("k", "day"), "u")
      val est = graft.sketch.Hll.estimate(regs, Seq("k", "day"))
        .select("est_distinct").head().getDouble(0)
      // 1.04/sqrt(512) ~ 4.6% standard error; linear counting is tighter
      // below ~1280 — 15% is > 3 sigma for both regimes
      assert(math.abs(est - distinct) / distinct < 0.15,
        s"distinct=$distinct est=$est")
    }
  }

  test("hll: small-range branch reports the linear-counting closed form") {
    val s = spark
    import s.implicits._
    val df = (0 until 20).map(i => ("et", 0L, s"u$i")).toDF("k", "day", "u")
    val regs = graft.sketch.Hll.registers(df, Seq("k", "day"), "u")
    val row = graft.sketch.Hll.estimate(regs, Seq("k", "day")).head()
    val nHit = row.getInt(2)
    val expected = 512.0 * math.log(512.0 / (512 - nHit))
    assert(math.abs(row.getDouble(3) - expected) < 1e-6)
    assert(nHit <= 20 && nHit >= 18) // <= 2 collisions among 512 registers
  }
}
