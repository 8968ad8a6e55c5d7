package graft

import graft.events.EventOps
import graft.stats.StatsOps
import org.apache.spark.sql.functions._

/** Hand-checked semantics for the concentration / plausibility wave:
  * maximum drawdown, Gini concentration, Benford leading-digit screen.
  */
class StatsOpsSpec extends SparkSpec {

  test("maxDrawdown: deepest drop with peak/trough times") {
    // 10,12,8,11,5,9 -> running max 10,12,12,12,12,12; dd 0,0,4,1,7,3
    val pts = seriesL(Seq(0L -> Some(10.0), 1L -> Some(12.0),
      2L -> Some(8.0), 3L -> Some(11.0), 4L -> Some(5.0),
      5L -> Some(9.0)))
    val r = EventOps.maxDrawdown(pts).collect().head
    assert(r.getLong(1) == 6)
    assert(r.getDouble(2) == 7.0)
    assert(r.getLong(3) == 1L) // peak at the 12
    assert(r.getLong(4) == 4L) // trough at the 5
  }

  test("maxDrawdown: repeated peak value resolves to its EARLIEST time") {
    // 12,5,12,3: max dd = 9 at t=3; x=12 first attained at t=0
    val pts = seriesL(Seq(0L -> Some(12.0), 1L -> Some(5.0),
      2L -> Some(12.0), 3L -> Some(3.0)))
    val r = EventOps.maxDrawdown(pts).collect().head
    assert(r.getDouble(2) == 9.0 && r.getLong(3) == 0L && r.getLong(4) == 3L)
  }

  test("maxDrawdown: a monotone series reports zero at its first point") {
    val pts = seriesL(Seq(0L -> Some(1.0), 1L -> Some(2.0), 2L -> Some(3.0)))
    val r = EventOps.maxDrawdown(pts).collect().head
    assert(r.getDouble(2) == 0.0 && r.getLong(3) == 0L && r.getLong(4) == 0L)
  }

  test("gini: even split is 0, single holder is (n-1)/n, zero total null") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("even", "u1", 5L), ("even", "u2", 5L), ("even", "u3", 5L),
      ("even", "u4", 5L),
      ("one", "u1", 0L), ("one", "u2", 0L), ("one", "u3", 0L),
      ("one", "u4", 12L),
      ("zero", "u1", 0L), ("zero", "u2", 0L))
      .toDF("key", "unit", "x")
    val out = StatsOps.gini(df, col("x")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("even").getDouble(3) == 0.0)
    assert(out("one").getDouble(3) == 0.75) // (n-1)/n with n=4
    assert(out("zero").isNullAt(3))
    assert(out("even").getLong(1) == 4 && out("even").getLong(2) == 20L)
  }

  test("gini: tie order among equal weights cannot move the result") {
    val s = spark
    import s.implicits._
    // 1,1,4: G = (2*(1*1+2*1+3*4) - 4*6) / (3*6) = (30-24)/18 = 1/3
    val df = Seq(("k", "a", 1L), ("k", "b", 1L), ("k", "c", 4L))
      .toDF("key", "unit", "x")
    val g = StatsOps.gini(df, col("x")).collect().head.getDouble(3)
    assert(math.abs(g - 0.333333) < 1e-9)
  }

  test("benford: digit counts, zero-fill, positives only, chi2 from grid") {
    val s = spark
    import s.implicits._
    val df = Seq(("k", 1L), ("k", 13L), ("k", 2L), ("k", 190L),
      ("k", 0L), ("k", -5L)).toDF("key", "x")
    val out = StatsOps.benford(df, col("x"))
      .orderBy("digit").collect()
    assert(out.length == 9)
    val byDigit = out.map(r => r.getInt(1) -> r).toMap
    assert(byDigit(1).getLong(2) == 3) // 1, 13, 190
    assert(byDigit(2).getLong(2) == 1)
    assert((3 to 9).forall(d => byDigit(d).getLong(2) == 0))
    assert(byDigit(1).getDouble(3) == 0.75)
    assert(byDigit(1).getDouble(4) == 0.301029995663981)
    // every row carries the same key-level chi2, strictly positive here
    val chis = out.map(_.getDouble(5)).distinct
    assert(chis.length == 1 && chis.head > 0)
  }

  test("twPearson: perfectly linear co-movement gives r = 1") {
    import graft.events.Correlation
    // b = 2a at the same times; any weighting keeps r = 1
    val a = seriesL(Seq(0L -> Some(1.0), 1000000L -> Some(3.0),
      5000000L -> Some(2.0), 9000000L -> Some(5.0)))
    val b = seriesL(Seq(0L -> Some(2.0), 1000000L -> Some(6.0),
      5000000L -> Some(4.0), 9000000L -> Some(10.0)))
    val r = Correlation.twPearson(a, b).collect().head
    assert(r.getDouble(3) == 1.0)
    assert(r.getLong(1) == 3) // last union point spans no segment
    assert(r.getLong(2) == 9) // 9 whole seconds of overlap
  }

  test("twPearson: anti-correlated steps give r = -1; constants give null") {
    import graft.events.Correlation
    val a = seriesL(Seq(0L -> Some(1.0), 2000000L -> Some(3.0),
      4000000L -> Some(1.0), 6000000L -> Some(3.0)))
    val down = seriesL(Seq(0L -> Some(3.0), 2000000L -> Some(1.0),
      4000000L -> Some(3.0), 6000000L -> Some(1.0)))
    assert(Correlation.twPearson(a, down).collect().head.getDouble(3) == -1.0)
    val const = seriesL(Seq(0L -> Some(7.0), 6000000L -> Some(7.0)))
    assert(Correlation.twPearson(a, const).collect().head.isNullAt(3))
  }

  test("twPearson: duration weighting dominates point counts") {
    import graft.events.Correlation
    // two 1000s concordant segments vs two 1s discordant ones: the
    // UNWEIGHTED four-pair Pearson is exactly 0; duration weighting
    // must push r near 1
    val s = 1000000L
    val aPts = Seq(0L -> Some(0.0), 1000 * s -> Some(10.0),
      2000 * s -> Some(10.0), 2001 * s -> Some(0.0), 2002 * s -> Some(0.0))
    val bPts = Seq(0L -> Some(0.0), 1000 * s -> Some(10.0),
      2000 * s -> Some(0.0), 2001 * s -> Some(10.0), 2002 * s -> Some(0.0))
    val r = Correlation.twPearson(seriesL(aPts), seriesL(bPts))
      .collect().head.getDouble(3)
    assert(r > 0.99, s"duration weighting should dominate, got $r")
  }

  test("modeTier: modal value with smallest-value tie-break and share") {
    import graft.rollup.Rollup
    val pts = seriesL(Seq(0L -> Some(2.0), 1L -> Some(2.0),
      2L -> Some(1.0), 3L -> Some(1.0), 4L -> Some(5.0)))
    val r = Rollup.modeTier(pts, bucketUs = 100L).collect().head
    assert(r.getDouble(2) == 1.0) // tie 2x2.0 vs 2x1.0 -> smaller value
    assert(r.getLong(3) == 2 && r.getLong(4) == 5 && r.getLong(5) == 3)
    assert(r.getDouble(6) == 0.4)
  }

  test("slidingMax: equals the naive RANGE-frame window on random data") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(19)
    val pts = (0 until 400).map(_ =>
      (rnd.nextLong(2000), Some(rnd.nextInt(1000) / 10.0)))
      .distinct
    val df = seriesL(pts) // dedupes are handled inside the operator
    for (w <- Seq(1L, 17L, 100L, 5000L)) {
      val got = EventOps.slidingMax(df, w)
        .select("t", "win_max").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toMap
      val naive = df.groupBy(col("key"), col("t"))
        .agg(max(col("v")).as("v"))
        .withColumn("_x", floor(col("v") * 1000 + 0.5).cast("long"))
        .withColumn("wm",
          max(col("_x")).over(Window.partitionBy(col("key"))
            .orderBy(col("t")).rangeBetween(-(w - 1), 0)) / 1000.0)
        .select("t", "wm").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toMap
      assert(got == naive, s"window $w diverged")
    }
  }

  test("slidingMax: strict left boundary — a point exactly W back drops") {
    val df = seriesL(Seq(0L -> Some(9.0), 10L -> Some(1.0)))
    val out = EventOps.slidingMax(df, windowUs = 10L)
      .orderBy("t").collect().map(_.getDouble(3)).toSeq
    assert(out == Seq(9.0, 1.0)) // t=10 window is (0, 10]: the 9 at t=0 is out
  }

  test("sessionAssign: membership matches sessionize boundaries") {
    import graft.events.EventOps
    val df = seriesL(Seq(0L -> Some(1.0), 5L -> Some(2.0),
      100L -> Some(3.0), 104L -> Some(4.0), 300L -> Some(5.0)))
    val out = EventOps.sessionAssign(df, gap = 10L)
      .select("t", "session_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out(0L) == out(5L) && out(100L) == out(104L))
    assert(out(0L) != out(100L) && out(100L) != out(300L))
    // the aggregate face sees the same three sessions
    assert(EventOps.sessionize(df, gap = 10L).count() == 3)
  }

  test("flapSuppress: equals the naive RANGE-frame crossing count") {
    import graft.events.EventOps
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(23)
    val pts = (0 until 500).map(_ =>
      (rnd.nextLong(3000), Some(rnd.nextInt(100).toDouble))).distinct
    val df = seriesL(pts)
    for (w <- Seq(1L, 29L, 250L, 10000L)) {
      val got = EventOps.flapSuppress(df, lit(50.0), w, maxFlips = 3)
        .select("t", "n_cross", "suppressed").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
      val wk = Window.partitionBy(col("key")).orderBy(col("t"))
      val naive = df.groupBy(col("key"), col("t"))
        .agg(max(col("v")).as("v"))
        .withColumn("_st", (col("v") >= 50.0).cast("int"))
        .withColumn("_pst", lag(col("_st"), 1).over(wk))
        .filter(col("_pst").isNotNull && col("_st") =!= col("_pst"))
        .withColumn("n",
          count(lit(1)).over(Window.partitionBy(col("key"))
            .orderBy(col("t")).rangeBetween(-(w - 1), 0)))
        .select(col("t"), col("n"), (col("n") > 3).cast("long").as("s"))
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
      assert(got == naive, s"window $w diverged")
    }
  }

  test("flapSuppress: crossing exactly W back is outside the window") {
    import graft.events.EventOps
    // states 0,1,0,1: crossings at t=10,20,30. With W=10 each window
    // (t-10, t] excludes the predecessor sitting exactly W back, so every
    // n_cross is 1; with W=11 the predecessor is inside and n_cross grows
    val df = seriesL(Seq(0L -> Some(0.0), 10L -> Some(9.0),
      20L -> Some(0.0), 30L -> Some(9.0)))
    val strict = EventOps.flapSuppress(df, lit(5.0), windowUs = 10L, maxFlips = 1)
      .orderBy("t").collect().map(r => (r.getLong(1), r.getLong(3))).toSeq
    assert(strict == Seq((10L, 1L), (20L, 1L), (30L, 1L)))
    val wide = EventOps.flapSuppress(df, lit(5.0), windowUs = 11L, maxFlips = 1)
      .orderBy("t").collect().map(r => (r.getLong(1), r.getLong(3))).toSeq
    assert(wide == Seq((10L, 1L), (20L, 2L), (30L, 2L)))
  }

  test("rarity: exact self-information on a known histogram") {
    import graft.stats.StatsOps
    // key s: bins {0:3 rows, 1:1 row} of 4 -> surprises log2(4/3), 2.0
    val df = seriesL(Seq(0L -> Some(1.0), 1L -> Some(2.0),
      2L -> Some(3.0), 3L -> Some(10.0)))
    val out = StatsOps.rarity(df, floor(col("v") / 10)).collect()
      .map(r => r.getLong(1) -> r.getDouble(6)).toMap
    val lo = BigDecimal(-math.log(3.0 / 4.0) / math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0L) == lo && out(1L) == lo && out(2L) == lo)
    assert(out(3L) == 2.0)
  }

  test("simpsonDiversity: uniform two-state split and single state") {
    import graft.agg.AggOps
    val s = spark
    import s.implicits._
    // distribution frame directly: two states with equal second weights
    val dist = Seq(("k", 1.0, 5000000.0), ("k", 2.0, 5000000.0),
      ("one", 9.0, 3000000.0))
      .toDF("key", "v", "weight")
    val out = AggOps.simpsonDiversity(dist).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("k").getDouble(3) == 0.5)
    assert(out("k").getDouble(4) == 2.0)
    assert(out("one").getDouble(3) == 0.0)
    assert(out("one").getDouble(4) == 1.0)
  }

  test("quantileMap: hand-checked CDF matching; reference maps to itself") {
    val s = spark
    import s.implicits._
    // src (1,1,2,3) onto ref (10,20,30,40): midrank fractions 3/8, 5/8,
    // 7/8 -> smallest ref value at cum fraction >= those: 20, 30, 40
    val src = Seq(0L -> Some(1.0), 1L -> Some(1.0), 2L -> Some(2.0),
      3L -> Some(3.0)).map { case (t, v) => ("src", t, v.get) }
    val ref = Seq(0L -> Some(10.0), 1L -> Some(20.0), 2L -> Some(30.0),
      3L -> Some(40.0)).map { case (t, v) => ("ref", t, v.get) }
    val df = (src ++ ref).toDF("key", "t", "v")
    val out = StatsOps.quantileMap(df, "ref").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(out(("src", 0L)) == 20.0 && out(("src", 1L)) == 20.0)
    assert(out(("src", 2L)) == 30.0 && out(("src", 3L)) == 40.0)
    // the reference key is a fixed point of its own mapping
    ref.foreach { case (_, t, v) => assert(out(("ref", t)) == v) }
  }

  test("quantileMap: equals the brute-force inverse-CDF on random data") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(59)
    val keys = Seq("a", "b", "ref")
    val rows = keys.flatMap { k =>
      val n = 20 + rnd.nextInt(60)
      (0 until n).map(i => (k, i.toLong, rnd.nextInt(25).toDouble))
    }
    val out = StatsOps.quantileMap(rows.toDF("key", "t", "v"), "ref")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val refVals = rows.filter(_._1 == "ref").map(_._3).sorted
    val nref = refVals.size
    for (k <- keys) {
      val vs = rows.filter(_._1 == k).map(_._3)
      val n = vs.size
      for ((_, t, v) <- rows.filter(_._1 == k)) {
        val below = vs.count(_ < v); val w = vs.count(_ == v)
        val rHalf = 2L * below + w + 1 // midrank in half-units
        // smallest ref value whose 2·cum·n >= rHalf·nref
        val expect = refVals.distinct.find(rv =>
          2L * refVals.count(_ <= rv) * n >= rHalf * nref).get
        assert(out((k, t)) == expect, s"key $k t $t v $v")
      }
    }
  }

  test("winsorizeScale: hand-checked thresholds, clip and robust scale") {
    val s = spark
    import s.implicits._
    // 1..10: p01->1 (c*100>=n at first), p99->10, median: c*2>=10 at 5,
    // q1: c*4>=10 at 3, q3: c*4>=30 at 8 -> IQR 5
    val df = (1 to 10).map(i => ("k", i.toLong, i.toDouble))
      .toDF("key", "t", "v")
    val out = StatsOps.winsorizeScale(df).collect()
      .map(r => r.getLong(1) -> (r.getDouble(3), r.getDouble(4))).toMap
    assert(out(1L) == ((1.0, (1000.0 - 5000.0) / 5000.0)))
    assert(out(5L)._2 == 0.0) // the median scales to zero
    assert(out(10L) == ((10.0, 1.0))) // (10-5)/5
    // aggressive clip: p25/p75 pins the tails to q1/q3
    val clip = StatsOps.winsorizeScale(df, 1, 4, 3, 4).collect()
      .map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(clip(1L) == 3.0 && clip(2L) == 3.0 && clip(3L) == 3.0)
    assert(clip(10L) == 8.0 && clip(9L) == 8.0 && clip(8L) == 8.0)
  }

  test("winsorizeScale: constant series has zero IQR -> null robust scale") {
    val s = spark
    import s.implicits._
    val df = (1 to 5).map(i => ("k", i.toLong, 7.0)).toDF("key", "t", "v")
    val out = StatsOps.winsorizeScale(df).collect()
    assert(out.forall(r => r.getDouble(3) == 7.0 && r.isNullAt(4)))
  }

  test("tailRisk: exact p95 threshold and tail-conditional mean") {
    val s = spark
    import s.implicits._
    // 1..100: p95 = min x with c*20 >= n*19 -> c >= 95 -> x = 95;
    // tail 95..100 (6 values), es = mean = 97.5
    val df = (1 to 100).map(i => ("k", i.toLong, i.toDouble))
      .toDF("key", "t", "v")
    val r = StatsOps.tailRisk(df).collect().head
    assert(r.getLong(1) == 100 && r.getDouble(2) == 95.0)
    assert(r.getLong(3) == 6 && r.getDouble(4) == 97.5)
    // p = 1/2 on 1..4: threshold 2, tail {2,3,4}, es = 3
    val r2 = StatsOps.tailRisk((1 to 4).map(i => ("k", i.toLong, i.toDouble))
      .toDF("key", "t", "v"), pNum = 1, pDen = 2).collect().head
    assert(r2.getDouble(2) == 2.0 && r2.getLong(3) == 3 &&
      r2.getDouble(4) == 3.0)
  }

  test("twSpearman: monotone but nonlinear co-movement gives rho = 1") {
    import graft.events.Correlation
    // b = a^3 at the same times: Pearson < 1, Spearman exactly 1
    val a = seriesL(Seq(0L -> Some(1.0), 1000000L -> Some(3.0),
      5000000L -> Some(2.0), 9000000L -> Some(5.0)))
    val b = seriesL(Seq(0L -> Some(1.0), 1000000L -> Some(27.0),
      5000000L -> Some(8.0), 9000000L -> Some(125.0)))
    val r = Correlation.twSpearman(a, b).collect().head
    assert(r.getDouble(3) == 1.0)
    assert(Correlation.twPearson(a, b).collect().head.getDouble(3) < 1.0)
    val inv = seriesL(Seq(0L -> Some(9.0), 1000000L -> Some(2.0),
      5000000L -> Some(5.0), 9000000L -> Some(1.0)))
    assert(Correlation.twSpearman(a, inv).collect().head.getDouble(3) == -1.0)
  }

  test("twSpearman: constant side gives null; ties midrank correctly") {
    import graft.events.Correlation
    val a = seriesL(Seq(0L -> Some(1.0), 2000000L -> Some(2.0),
      4000000L -> Some(3.0), 6000000L -> Some(3.0)))
    val const = seriesL(Seq(0L -> Some(7.0), 6000000L -> Some(7.0)))
    assert(Correlation.twSpearman(a, const).collect().head.isNullAt(3))
    // hand midrank check: a segments (1,2,3) x 2s each vs b (1,1,9):
    // b's two tied seconds-blocks share the midrank of their span
    val b = seriesL(Seq(0L -> Some(1.0), 2000000L -> Some(1.0),
      4000000L -> Some(9.0), 6000000L -> Some(9.0)))
    // per-second ranks: a = 1.5,3.5,5.5 ; b = 2.5,2.5,5.5 (2s blocks)
    // weighted Pearson of those ranks = sqrt(3)/2
    val rho = Correlation.twSpearman(a, b).collect().head.getDouble(3)
    assert(math.abs(rho - math.sqrt(3.0) / 2) < 1e-6, s"got $rho")
  }

  test("twSpearman: equals rank-expanded Pearson on random data") {
    import graft.events.Correlation
    val rnd = new scala.util.Random(41)
    def mk() = seriesL((0 until 60).map(i =>
      i * 1000000L -> Some(rnd.nextInt(12).toDouble)))
    for (_ <- 0 until 3) {
      val (a, b) = (mk(), mk())
      val got = Correlation.twSpearman(a, b).collect().head
      // brute force: expand to per-second observations, midrank, Pearson
      def vals(df: org.apache.spark.sql.DataFrame) = df
        .orderBy("t").collect().map(_.getDouble(2)).toSeq
      val (va, vb) = (vals(a), vals(b))
      val secs = (0 until 59).flatMap(i => Seq.fill(1)(i)) // 1s segments
      val xa = secs.map(va(_)); val xb = secs.map(vb(_))
      def midranks(xs: Seq[Double]) = {
        val sorted = xs.sorted
        xs.map(x => (sorted.indexOf(x) + 1 + sorted.lastIndexOf(x) + 1) / 2.0)
      }
      val (ra, rb) = (midranks(xa), midranks(xb))
      val n = ra.size.toDouble
      val (sx, sy) = (ra.sum, rb.sum)
      val sxx = ra.map(x => x * x).sum; val syy = rb.map(x => x * x).sum
      val sxy = ra.zip(rb).map { case (x, y) => x * y }.sum
      val va2 = n * sxx - sx * sx; val vb2 = n * syy - sy * sy
      val expect =
        if (va2 <= 0 || vb2 <= 0) None
        else Some((n * sxy - sx * sy) / math.sqrt(va2 * vb2))
      val gotRho = if (got.isNullAt(3)) None else Some(got.getDouble(3))
      (expect, gotRho) match {
        case (Some(e), Some(g)) => assert(math.abs(e - g) < 1e-5, s"$e vs $g")
        case (e, g) => assert(e.isEmpty == g.isEmpty, s"$e vs $g")
      }
    }
  }

  test("eventTriggeredAverage: hand-checked stimulus-locked profile") {
    val s = spark
    import s.implicits._
    // series 0->10, 10->20, 20->30; triggers at 10 and 25, offsets ±5, 0
    val pts = seriesL(Seq(0L -> Some(10.0), 10L -> Some(20.0),
      20L -> Some(30.0)))
    val trig = Seq(("s", 10L), ("s", 25L)).toDF("key", "t")
    val out = EventOps.eventTriggeredAverage(pts, trig, Seq(-5L, 0L, 5L))
      .collect().map(r => r.getLong(1) -> r).toMap
    // off -5: samples at 5 (->10) and 20 (exact hit ->30) => 20.0
    assert(out(-5L).getDouble(4) == 20.0)
    // off 0: samples at 10 (exact ->20) and 25 (->30) => 25.0
    assert(out(0L).getDouble(4) == 25.0)
    // off +5: samples at 15 (->20) and 30 (->30) => 25.0
    assert(out(5L).getDouble(4) == 25.0)
    assert(out(0L).getLong(2) == 2 && out(0L).getLong(3) == 2)
  }

  test("eventTriggeredAverage: pre-first probes go null, not default") {
    val s = spark
    import s.implicits._
    val pts = seriesL(Seq(10L -> Some(7.0)))
    val trig = Seq(("s", 12L)).toDF("key", "t")
    val out = EventOps.eventTriggeredAverage(pts, trig, Seq(-5L, 0L))
      .collect().map(r => r.getLong(1) -> r).toMap
    assert(out(-5L).getLong(2) == 1 && out(-5L).getLong(3) == 0)
    assert(out(-5L).isNullAt(4)) // probe at 7 precedes the first point
    assert(out(0L).getDouble(4) == 7.0)
  }

  test("eventTriggeredAverage: equals brute-force per-trigger sampling") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(23)
    val pts = (0 until 300).map(_ =>
      (rnd.nextLong(2000), Some(rnd.nextInt(1000) / 10.0))).distinct
    val trigTs = (0 until 40).map(_ => rnd.nextLong(2200)).distinct
    val df = seriesL(pts)
    val trig = trigTs.map(("s", _)).toDF("key", "t")
    val offsets = Seq(-97L, -13L, 0L, 13L, 97L)
    val got = EventOps.eventTriggeredAverage(df, trig, offsets)
      .collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    val sorted = pts.groupBy(_._1).map { case (t, g) =>
      t -> g.map(_._2.get).max }.toSeq.sortBy(_._1) // loader max-dedup
    for (off <- offsets) {
      val samples = trigTs.map { te =>
        sorted.takeWhile(_._1 <= te + off).lastOption.map(_._2)
      }
      val hit = samples.flatten
      val mean =
        if (hit.isEmpty) None
        else Some(BigDecimal(
          hit.map(v => math.floor(v * 1000 + 0.5).toLong).sum / 1000.0
            / hit.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(got(off)._1 == trigTs.size && got(off)._2 == hit.size,
        s"counts at off $off")
      assert(got(off)._3 == mean, s"mean at off $off")
    }
  }

  test("burnRate: equals the naive RANGE-frame window counts") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(31)
    val pts = (0 until 500).map(_ =>
      (rnd.nextLong(1500), Some(rnd.nextInt(100).toDouble)))
    val df = seriesL(pts)
    val (ws, wl) = (7L, 23L)
    val got = EventOps.burnRate(df, col("v") >= 50, budget = 0.5,
      shortUs = ws, longUs = wl, burnThreshold = 1.2)
      .collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3),
        r.getLong(5), r.getLong(6), r.getLong(8))).toMap
    val byT = df.groupBy(col("key"), col("t"))
      .agg(count(lit(1)).as("n"),
        sum((col("v") >= 50).cast("long")).as("b"))
    def fr(w: Long) = Window.partitionBy(col("key")).orderBy(col("t"))
      .rangeBetween(-(w - 1), 0)
    val naive = byT
      .withColumn("ts", sum(col("n")).over(fr(ws)))
      .withColumn("bs", sum(col("b")).over(fr(ws)))
      .withColumn("tl", sum(col("n")).over(fr(wl)))
      .withColumn("bl", sum(col("b")).over(fr(wl)))
      .withColumn("al",
        (round(col("bs").cast("double") / col("ts") / 0.5, 6) >= 1.2 &&
          round(col("bl").cast("double") / col("tl") / 0.5, 6) >= 1.2)
          .cast("long"))
      .collect()
      .map(r => r.getLong(1) -> (r.getLong(4), r.getLong(5),
        r.getLong(6), r.getLong(7), r.getLong(8))).toMap
    assert(got == naive)
  }

  test("burnRate: strict left boundary — an event exactly W back drops") {
    val df = seriesL(Seq(0L -> Some(90.0), 10L -> Some(90.0)))
    val out = EventOps.burnRate(df, col("v") >= 50, budget = 1.0,
      shortUs = 10L, longUs = 20L, burnThreshold = 9.9)
      .collect().map(r => r.getLong(1) -> r).toMap
    // short window at t=10 is (0, 10]: the t=0 event is excluded
    assert(out(10L).getLong(2) == 1 && out(10L).getLong(3) == 1)
    // long window (−10, 10] still sees both
    assert(out(10L).getLong(5) == 2 && out(10L).getLong(6) == 2)
  }

  test("rollingMedian: despikes the interior, lower median at edges") {
    // 1,1,100,1,1 -> med 1 everywhere; the 100 flags as a spike
    val df = seriesL(Seq(0L -> Some(1.0), 1L -> Some(1.0),
      2L -> Some(100.0), 3L -> Some(1.0), 4L -> Some(1.0)))
    val out = EventOps.rollingMedian(df, halfWidth = 2, spikeThreshold = 50.0)
      .collect().map(r => r.getLong(1) -> (r.getDouble(3), r.getLong(4))).toMap
    assert(out.values.forall(_._1 == 1.0))
    assert(out(2L)._2 == 1L && out.filterKeys(_ != 2L).values.forall(_._2 == 0L))
  }

  test("rollingMedian: edge windows shrink; even windows pick the LOWER median") {
    val df = seriesL(Seq(0L -> Some(3.0), 1L -> Some(8.0),
      2L -> Some(5.0), 3L -> Some(9.0)))
    val out = EventOps.rollingMedian(df, halfWidth = 2, spikeThreshold = 50.0)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    // t=0 frame {3,8,5} (n=3, odd): median 5
    assert(out(0L) == 5.0)
    // t=1 frame {3,8,5,9} (n=4, even): LOWER median of {3,5,8,9} = 5, not 6.5
    assert(out(1L) == 5.0)
    // t=3 frame {8,5,9} (n=3): median 8
    assert(out(3L) == 8.0)
  }

  test("allanVariance: perfectly periodic events read zero at every tau") {
    val s = spark
    import s.implicits._
    // one event per 10us bin -> every bin count is 1 at tau=10, 2 at tau=20
    val df = (0 until 40).map(i => ("k", i * 10L + 3)).toDF("key", "t")
    val out = graft.events.EventOps.allanVariance(df, Seq(10L, 20L))
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out(10L) == ((39L, 0.0)) && out(20L) == ((19L, 0.0)))
  }

  test("allanVariance: empty bins count zero (no fake adjacent pairs)") {
    val s = spark
    import s.implicits._
    // bins 0,1,2,...: counts 3,0,0,2 at tau=10 -> dense diffs -3,0,2
    val df = (Seq.fill(3)(1L) ++ Seq.fill(2)(31L)).map(t => ("k", t))
      .toDF("key", "t")
    val r = graft.events.EventOps.allanVariance(df, Seq(10L)).head()
    // sum d^2 = 9 + 0 + 4 = 13 over 3 pairs -> 13/6
    assert(r.getLong(2) == 3L)
    assert(math.abs(r.getDouble(3) - 13.0 / 6.0) < 1e-6)
    assert(math.abs(r.getDouble(4) - math.sqrt(13.0 / 6.0)) < 1e-6)
  }

  test("allanVariance equals the sequential reference on jittery counts") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val times = (0 until 500).map(_ => rnd.nextInt(1000).toLong).sorted
    val df = times.map(t => ("k", t)).toDF("key", "t")
    for (tau <- Seq(7L, 25L)) {
      val got = graft.events.EventOps.allanVariance(df, Seq(tau)).head()
      val counts = times.groupBy(_ / tau).view.mapValues(_.size.toLong).toMap
      val (b0, b1) = (counts.keys.min, counts.keys.max)
      val dense = (b0 to b1).map(b => counts.getOrElse(b, 0L))
      val d2 = dense.sliding(2).map(p => (p(1) - p(0)) * (p(1) - p(0))).sum
      val pairs = dense.size - 1
      assert(got.getLong(2) == pairs.toLong, s"tau=$tau pairs")
      assert(math.abs(got.getDouble(3) - d2.toDouble / (2.0 * pairs)) < 1e-6,
        s"tau=$tau avar")
    }
  }

  test("jsonAttrProfile: extraction, missing accounting, smallest-mode tie-break") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("a", """{"k": 1}"""), ("a", """{"k": 1}"""), ("a", """{"k": 2}"""),
      ("a", "{}"), ("a", "not json"),
      ("b", """{"k": 5}"""), ("b", """{"k": 7}""")) // tie -> smaller wins
      .toDF("key", "props")
    val out = EventOps.jsonAttrProfile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getLong(1) == 3 && a.getLong(2) == 2 && a.getLong(3) == 2)
    assert(a.getLong(4) == 1 && a.getLong(5) == 2) // mode 1 (2 hits)
    assert(math.abs(a.getDouble(6) - 4.0 / 3) < 1e-6)
    assert(a.getLong(7) == 1 && a.getLong(8) == 2)
    val b = out("b")
    assert(b.getLong(4) == 5 && b.getLong(5) == 1) // tie 5 vs 7 -> 5
    assert(b.getLong(2) == 0)
    // a key whose EVERY row fails extraction still surfaces
    val allMiss = Seq(("c", "nope"), ("c", "{}")).toDF("key", "props")
    val c = EventOps.jsonAttrProfile(allMiss).head()
    assert(c.getString(0) == "c" && c.getLong(1) == 0 && c.getLong(2) == 2)
    assert(c.isNullAt(4) && c.isNullAt(6))
  }

  test("hillTailIndex: dyadic gaps give H = 2·ln2; equal gaps go null") {
    val s = spark
    import s.implicits._
    // gaps 16, 8, 4, 2 (k_used = 3, threshold 2):
    // H = (ln8 + ln4 + ln2)/3 = 2·ln2
    val times = Seq(0L, 16L, 24L, 28L, 30L).map(t => ("k", t))
    val r = EventOps.hillTailIndex(times.toDF("key", "t"), k = 50).head()
    assert(r.getLong(1) == 4L && r.getLong(2) == 3L)
    assert(math.abs(r.getDouble(3) - 2 * math.log(2.0)) < 1e-5)
    assert(math.abs(r.getDouble(4) - 1.0 / (2 * math.log(2.0))) < 1e-5)
    // all gaps equal: every log excess is 0 -> H = 0, alpha null
    val flat = (0 to 5).map(i => ("k", i * 10L))
    val fr = EventOps.hillTailIndex(flat.toDF("key", "t"), k = 50).head()
    assert(fr.getDouble(3) == 0.0 && fr.isNullAt(4))
  }

  test("hillTailIndex equals the sequential estimator on Pareto-ish gaps") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    // alpha ~ 1.5 Pareto gaps on the integer grid
    val gaps = (0 until 300).map(_ =>
      math.max(1L, (math.pow(rnd.nextDouble(), -1.0 / 1.5) * 100).toLong))
    val times = gaps.scanLeft(0L)(_ + _)
    val df = times.map(t => ("k", t)).toDF("key", "t")
    val got = EventOps.hillTailIndex(df, k = 50).head()
    val pos = times.sliding(2).map(p => p(1) - p(0)).filter(_ > 0).toSeq
    val top = pos.sorted(Ordering[Long].reverse).take(51)
    val h = top.take(50).map(g => math.log(g.toDouble / top(50))).sum / 50
    assert(got.getLong(1) == pos.size.toLong && got.getLong(2) == 50L)
    assert(math.abs(got.getDouble(3) - h) < 1e-4)
    assert(math.abs(got.getDouble(4) - 1.0 / h) < 1e-3)
  }

  test("klMixDrift: identical daily mixes read ~0; a flipped day reads big") {
    val s = spark
    import s.implicits._
    val day = 100L
    def mk(bin: Long, mix: Seq[(String, Int)]) = mix.flatMap { case (k, n) =>
      (0 until n).map(i => (k, bin * day + i)) }
    val same = (mk(0, Seq("a" -> 30, "b" -> 10)) ++
      mk(1, Seq("a" -> 30, "b" -> 10))).toDF("key", "t")
    val r0 = EventOps.klMixDrift(same, binUs = day)
      .orderBy("bin").collect()
    assert(r0.forall(r => math.abs(r.getDouble(3)) < 1e-5))
    val flip = (mk(0, Seq("a" -> 30, "b" -> 10)) ++
      mk(1, Seq("a" -> 10, "b" -> 30))).toDF("key", "t")
    val r1 = EventOps.klMixDrift(flip, binUs = day).orderBy("bin").collect()
    // symmetric flip around a 50/50 global: KL = 0.75·log2(1.5) +
    // 0.25·log2(0.5) each day
    val expect = 0.75 * math.log(1.5) / math.log(2.0) - 0.25
    r1.foreach { r =>
      assert(r.getLong(1) == 40L && r.getLong(2) == 2L)
      assert(math.abs(r.getDouble(3) - expect) < 1e-4)
    }
  }

  test("klMixDrift equals the sequential reference on a jittery mix") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(23)
    val cats = Seq("a", "b", "c", "d")
    val rows = for {
      bin <- 0 until 6
      k <- cats
      n = 1 + rnd.nextInt(40)
      i <- 0 until n
    } yield (k, bin * 1000L + i)
    val df = rows.toDF("key", "t")
    val got = EventOps.klMixDrift(df, binUs = 1000L).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val byBin = rows.groupBy(_._2 / 1000L)
    val gk = rows.groupBy(_._1).view.mapValues(_.size).toMap
    val gt = rows.size.toDouble
    byBin.foreach { case (bin, rs) =>
      val nd = rs.size.toDouble
      val kl = rs.groupBy(_._1).map { case (k, v) =>
        val n = v.size.toDouble
        n / nd * math.log((n / nd) / (gk(k) / gt))
      }.sum / math.log(2.0)
      assert(math.abs(got(bin) - kl) < 1e-4, s"bin $bin")
    }
  }
}
