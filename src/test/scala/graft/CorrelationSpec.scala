package graft

import graft.events.{Correlation, EventOps}
import graft.rollup.Rollup
import org.apache.spark.sql.functions._

/** Hand-checked semantics for the correlation/trend/downsample family:
  * lagged ACF/CCF on the bin grid, Theil–Sen median slope, fixed-anchor
  * LTTB, SAX words, top-k gaps.
  */
class CorrelationSpec extends SparkSpec {

  test("autocorr: perfectly linear bins -> r = 1; pairs require both bins") {
    // bins 0..3 hold means 1,2,3,4 -> lag-1 pairs are collinear
    val df = seriesL(Seq(
      (5L, Some(1.0)), (15L, Some(2.0)), (25L, Some(3.0)), (35L, Some(4.0))))
    val out = Correlation.autocorr(df, Seq(1), binUs = 10L, minPairs = 2)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(out == Seq((1, 3L, 1.0)))
  }

  test("autocorr: minPairs gate and zero variance -> null r, row kept") {
    val df = seriesL(Seq((5L, Some(1.0)), (15L, Some(2.0)), (25L, Some(3.0))))
    val gated = Correlation.autocorr(df, Seq(1), binUs = 10L, minPairs = 5)
      .head()
    assert(gated.getLong(2) == 2L && gated.isNullAt(3))
    val const = seriesL(Seq(
      (5L, Some(7.0)), (15L, Some(7.0)), (25L, Some(7.0))))
    val c = Correlation.autocorr(const, Seq(1), binUs = 10L, minPairs = 2)
      .head()
    assert(c.getLong(2) == 2L && c.isNullAt(3))
  }

  test("autocorr: gaps pair only existing bins; lag list explodes per lag") {
    // bins 0,1,3 exist; lag 1 pairs (0,1); lag 2 pairs (1,3); lag 3 pairs (0,3)
    val df = seriesL(Seq((5L, Some(1.0)), (15L, Some(2.0)), (35L, Some(4.0))))
    val n = Correlation.autocorr(df, Seq(1, 2, 3), binUs = 10L, minPairs = 1)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toMap
    assert(n == Map(1 -> 1L, 2 -> 1L, 3 -> 1L))
  }

  test("autocorr matches a sequential Pearson reference on seeded data") {
    val rnd = new scala.util.Random(4242)
    val pts = (0 until 400).map(_ =>
      (rnd.nextInt(60).toLong * 10 + rnd.nextInt(10), Some(rnd.nextDouble() * 100)))
    val df = seriesL(pts)
    val got = Correlation.autocorr(df, Seq(2), binUs = 10L, minPairs = 2)
      .head()
    // sequential reference on the same quantization
    val grid = pts.groupBy(_._1 / 10).map { case (b, ps) =>
      val vs = ps.map(_._2.get)
      b -> math.floor(vs.sum / vs.size * 1000 + 0.5).toLong
    }
    val pairs = grid.toSeq.flatMap { case (b, x) =>
      grid.get(b + 2).map(y => (x, y)) }
    val n = pairs.size.toDouble
    val (sx, sy) = (pairs.map(_._1).sum.toDouble, pairs.map(_._2).sum.toDouble)
    val sxx = pairs.map(p => p._1 * p._1).sum.toDouble
    val syy = pairs.map(p => p._2 * p._2).sum.toDouble
    val sxy = pairs.map(p => p._1 * p._2).sum.toDouble
    val expected = (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert(got.getLong(2) == pairs.size.toLong)
    assert(math.abs(got.getDouble(3) - expected) < 1e-6)
  }

  test("crossCorr: anti-correlated counts -> r = -1; negative lag shifts") {
    val s = spark
    import s.implicits._
    // A counts by bin: 1,2,3; B counts: 3,2,1
    val rows =
      Seq.fill(1)(("a", 5L)) ++ Seq.fill(2)(("a", 15L)) ++ Seq.fill(3)(("a", 25L)) ++
      Seq.fill(3)(("b", 5L)) ++ Seq.fill(2)(("b", 15L)) ++ Seq.fill(1)(("b", 25L))
    val df = rows.toDF("key", "t")
    val r0 = Correlation.crossCorr(df, "a", "b", Seq(0), binUs = 10L, minBins = 2)
      .head()
    assert(r0.getLong(1) == 3L && r0.getDouble(2) == -1.0)
    // B shifted one bin later equals A -> lag +1 gives r = 1
    val rows2 =
      Seq.fill(1)(("a", 5L)) ++ Seq.fill(2)(("a", 15L)) ++ Seq.fill(3)(("a", 25L)) ++
      Seq.fill(1)(("b", 15L)) ++ Seq.fill(2)(("b", 25L)) ++ Seq.fill(3)(("b", 35L))
    val r1 = Correlation.crossCorr(rows2.toDF("key", "t"), "a", "b",
      Seq(1), binUs = 10L, minBins = 2).head()
    assert(r1.getLong(1) == 3L && r1.getDouble(2) == 1.0)
  }

  test("theilSen: odd and even pair counts, exact grid median") {
    // slopes over (0,0),(10,10),(20,40): 1, 2, 3 -> median 2
    val odd = seriesL(Seq((0L, Some(0.0)), (10L, Some(10.0)), (20L, Some(40.0))))
    val o = Correlation.theilSen(odd, bucketUs = 1000L, perUs = 1L).head()
    assert(o.getLong(2) == 3L && o.getDouble(3) == 2.0)
    // add (30,40): six slopes 1, 2, 4/3, 3, 1.5, 0 -> median (1.333333+1.5)/2
    val even = seriesL(Seq(
      (0L, Some(0.0)), (10L, Some(10.0)), (20L, Some(40.0)), (30L, Some(40.0))))
    val e = Correlation.theilSen(even, bucketUs = 1000L, perUs = 1L).head()
    assert(e.getLong(2) == 6L && e.getDouble(3) == 1.4166665)
  }

  test("theilSen: equal-t pairs skipped; buckets independent") {
    val df = seriesL(Seq(
      (0L, Some(0.0)), (0L, Some(5.0)), (10L, Some(10.0)), // bucket 0
      (100L, Some(0.0)), (110L, Some(30.0))))              // bucket 1
    val out = Correlation.theilSen(df, bucketUs = 100L, perUs = 1L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sortBy(_._1)
    // bucket 0: pairs (0,.)->(10,10): slopes 1.0 and 0.5 -> median 0.75
    assert(out == Seq((0L, 2L, 0.75), (1L, 1L, 3.0)))
  }

  test("lttb: endpoints fixed, interior bucket keeps max-area point") {
    val df = seriesL(Seq(
      (1L, Some(0.0)), (2L, Some(5.0)),                      // first bucket
      (11L, Some(0.0)), (15L, Some(100.0)), (19L, Some(0.0)), // interior
      (21L, Some(1.0)), (25L, Some(2.0))))                    // last bucket
    val out = Rollup.lttb(df, startUs = 0L, stepUs = 10L)
      .collect().map(r => (r.getLong(2), r.getDouble(3))).toSeq.sortBy(_._1)
    assert(out == Seq((1L, 0.0), (15L, 100.0), (25L, 2.0)))
  }

  test("lttb: single-bucket key keeps its first point; one row per bucket") {
    val df = seriesL(Seq((3L, Some(9.0)), (7L, Some(1.0))))
    val out = Rollup.lttb(df, 0L, 10L).collect()
      .map(r => (r.getLong(2), r.getDouble(3))).toSeq
    assert(out == Seq((3L, 9.0)))
    val dense = seriesL((0L until 40L).map(t => (t, Some(t.toDouble * 7 % 13))))
    assert(Rollup.lttb(dense, 0L, 10L).count() == 4)
  }

  test("saxWords: PAA symbols, '_' for empty segments, edge clamping") {
    val df = seriesL(Seq(
      (5L, Some(0.4)),   // seg 0 -> 'a'
      (15L, Some(1.2)),  // seg 1 -> 'b'
      (35L, Some(3.9)),  // seg 3 -> 'd'
      (75L, Some(2.0)))) // seg 7 -> 'c'
    val out = Rollup.saxWords(df, wordUs = 80L, segUs = 10L, alphabet = 4,
      lo = 0.0, hi = 4.0).head()
    assert(out.getString(2) == "ab_d___c" && out.getLong(3) == 4L)
    // out-of-range values clamp to the edge symbols
    val clamp = seriesL(Seq((5L, Some(99.0)), (15L, Some(-5.0))))
    val w = Rollup.saxWords(clamp, 80L, 10L, 4, 0.0, 4.0).head().getString(2)
    assert(w == "da______")
  }

  test("saxWords: segment PAA averages points; words split per window") {
    val df = seriesL(Seq(
      (1L, Some(0.0)), (9L, Some(2.0)), // seg 0 mean 1.0 -> 'b' (width 1)
      (85L, Some(3.5))))                // next word, seg 0 -> 'd'
    val out = Rollup.saxWords(df, 80L, 10L, 4, 0.0, 4.0)
      .collect().map(r => (r.getLong(1), r.getString(2))).toSeq.sortBy(_._1)
    assert(out == Seq((0L, "b_______"), (80L, "d_______")))
  }

  test("topGaps: rank by gap desc then t; k bounds output; exact longs") {
    val df = seriesL(Seq(0L, 10L, 11L, 50L, 100L).map(t => (t, Some(1.0))))
    val out = EventOps.topGaps(df.select(col("key"), col("t")), k = 3)
      .collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq.sortBy(_._1)
    assert(out == Seq(
      (1, 50L, 100L, 50L),
      (2, 11L, 50L, 39L),
      (3, 0L, 10L, 10L)))
    // a single-point key has no gaps at all
    assert(EventOps.topGaps(seriesL(Seq((5L, Some(1.0))))
      .select(col("key"), col("t"))).count() == 0)
  }

  test("mannKendall: monotone rise flags increasing; constants go null") {
    import graft.events.Correlation
    // one point per hourly bin, strictly rising -> S = n(n-1)/2
    val h = 3600000000L
    val up = seriesL((0 until 12).map(i => i * h -> Some(i.toDouble)))
    val r = Correlation.mannKendall(up).collect().head
    assert(r.getLong(2) == 66 && r.getString(5) == "increasing")
    val const = seriesL((0 until 12).map(i => i * h -> Some(5.0)))
    val rc = Correlation.mannKendall(const).collect().head
    assert(rc.getLong(2) == 0 && rc.isNullAt(4) && rc.isNullAt(5))
    val down = seriesL((0 until 12).map(i => i * h -> Some(-i.toDouble)))
    assert(Correlation.mannKendall(down).collect().head
      .getString(5) == "decreasing")
  }

  test("mannKendall: equals the brute-force statistic with ties") {
    import graft.events.Correlation
    val h = 3600000000L
    val rnd = new scala.util.Random(67)
    for (trial <- 0 until 3) {
      val xs = (0 until 40).map(_ => rnd.nextInt(6).toLong) // heavy ties
      val pts = seriesL(xs.zipWithIndex.map { case (x, i) =>
        i * h -> Some(x.toDouble) })
      val r = Correlation.mannKendall(pts).collect().head
      val s = (for (i <- xs.indices; j <- i + 1 until xs.size)
        yield math.signum(xs(j) - xs(i))).sum
      val n = xs.size.toLong
      val tc = xs.groupBy(identity).values.map(_.size.toLong)
        .map(t => t * (t - 1) * (2 * t + 5)).sum
      val vnum = n * (n - 1) * (2 * n + 5) - tc
      assert(r.getLong(2) == s, s"trial $trial S")
      val zExp =
        if (vnum <= 0) None
        else {
          val v = vnum.toDouble / 18.0
          val raw = if (s > 0) (s - 1).toDouble / math.sqrt(v)
            else if (s < 0) (s + 1).toDouble / math.sqrt(v) else 0.0
          Some(BigDecimal(java.math.BigDecimal.valueOf(raw))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
      val zGot = if (r.isNullAt(4)) None else Some(r.getDouble(4))
      assert(zGot == zExp, s"trial $trial z")
    }
  }

  test("Mann–Kendall family: over-long binned series raise loudly (maxBins cap)") {
    import graft.events.Correlation
    val h = 3600000000L
    val pts = seriesL((0 until 20).map(i => i * h -> Some(i.toDouble)))
    def msgOf(t: Throwable): String = {
      var c: Throwable = t
      while (c.getCause != null && !c.getMessage.contains("maxBins") &&
        !c.getMessage.contains("maxBinsPerSeason")) c = c.getCause
      c.getMessage
    }
    val eMk = intercept[Exception] {
      Correlation.mannKendall(pts, maxBins = 8).collect()
    }
    assert(msgOf(eMk).contains("maxBins=8"), msgOf(eMk))
    val eSg = intercept[Exception] {
      Correlation.siegelSlope(pts, maxBins = 8).collect()
    }
    assert(msgOf(eSg).contains("maxBins=8"), msgOf(eSg))
    val eSe = intercept[Exception] {
      Correlation.seasonalMannKendall(pts, seasons = 2,
        maxBinsPerSeason = 4).collect()
    }
    assert(msgOf(eSe).contains("maxBinsPerSeason=4"), msgOf(eSe))
    // at-the-cap inputs still compute, bit-identically to the uncapped form
    val capped = Correlation.mannKendall(pts, maxBins = 20).collect()
    val open = Correlation.mannKendall(pts).collect()
    assert(capped.toSeq == open.toSeq)
  }

  test("permutationEntropy: monotone is zero, alternating is one pattern pair") {
    import graft.events.Correlation
    val h = 3600000000L
    // strictly rising: every triple is pattern (0,1,2) -> H = 0
    val up = seriesL((0 until 14).map(i => i * h -> Some(i.toDouble)))
    val r = Correlation.permutationEntropy(up).collect().head
    assert(r.getLong(1) == 12 && r.getLong(2) == 1)
    assert(r.getInt(3) == 5 && r.getDouble(4) == 0.0)
    // alternating 0,9,0,9,...: two patterns in equal shares ->
    // H = 1 bit, normalized 1/log2(6)
    val alt = seriesL((0 until 14).map(i =>
      i * h -> Some(if (i % 2 == 0) 0.0 else 9.0)))
    val ra = Correlation.permutationEntropy(alt).collect().head
    assert(ra.getLong(2) == 2)
    val expect = BigDecimal(java.math.BigDecimal.valueOf(
      1.0 / 2.584962500721156))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(ra.getDouble(4) == expect, s"got ${ra.getDouble(4)}")
    // below the triple floor -> null entropy
    val short = seriesL((0 until 5).map(i => i * h -> Some(i.toDouble)))
    assert(Correlation.permutationEntropy(short).collect().head.isNullAt(4))
  }

  test("permutationEntropy: equals brute-force Bandt-Pompe with ties") {
    import graft.events.Correlation
    val hUs = 3600000000L
    val rnd = new scala.util.Random(71)
    val xs = (0 until 60).map(_ => rnd.nextInt(4).toLong)
    val pts = seriesL(xs.zipWithIndex.map { case (x, i) =>
      i * hUs -> Some(x.toDouble) })
    val r = Correlation.permutationEntropy(pts).collect().head
    val codes = xs.sliding(3).map { w =>
      val (a, b, c) = (w(0), w(1), w(2))
      def i(cond: Boolean) = if (cond) 1 else 0
      9 * (i(b < a) + i(c < a)) + 3 * (i(a <= b) + i(c < b)) +
        (i(a <= c) + i(b <= c))
    }.toSeq
    val n = codes.size.toDouble
    val byCode = codes.groupBy(identity).view.mapValues(_.size).toMap
    val hExp = Seq(5, 7, 11, 15, 19, 21).map { c0 =>
      byCode.get(c0).map { k =>
        -(k / n * (math.log(k / n) / math.log(2)))
      }.getOrElse(0.0)
    }.reduce(_ + _) / 2.584962500721156
    assert(r.getLong(1) == codes.size)
    assert(r.getLong(2) == byCode.size)
    val hExp6 = BigDecimal(java.math.BigDecimal.valueOf(hExp))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(4) == hExp6, s"${r.getDouble(4)} vs $hExp6")
  }

  test("haarEnergy: constant series has zero energy; a step puts energy at the crossing scale") {
    import graft.events.Correlation
    val h = 3600000000L
    val const = seriesL((0 until 16).map(i => i * h -> Some(3.0)))
    val rc = Correlation.haarEnergy(const).collect()
    assert(rc.forall(r => r.getLong(3) == 0L && r.isNullAt(4)))
    // step 0,0,...,0,8,8,...,8 at the midpoint of 16 bins: only the
    // level-4 block (one 16-bin block, halves 0s vs 8s) sees a detail;
    // levels 1-3 blocks are internally constant
    val step = seriesL((0 until 16).map(i =>
      i * h -> Some(if (i < 8) 0.0 else 8.0)))
    val rs = Correlation.haarEnergy(step).collect()
      .map(r => r.getInt(1) -> (r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(rs(1)._1 == 0 && rs(2)._1 == 0 && rs(3)._1 == 0)
    // d = sum(0..7)*1000*(+1) + sum(8x8)*1000*(-1) = -64000 -> d^2
    assert(rs(4)._1 == 64000L * 64000L && rs(4)._2 == Some(1.0))
  }

  test("haarEnergy: equals brute-force dyadic analysis with gaps") {
    import graft.events.Correlation
    val h = 3600000000L
    val rnd = new scala.util.Random(73)
    // sparse bins: ~60% occupancy, values on the 0.1 grid
    val occupied = (0 until 64).filter(_ => rnd.nextInt(10) < 6)
    val vals = occupied.map(i => i -> (rnd.nextInt(100) / 10.0)).toMap
    val pts = seriesL(occupied.map(i => i * h -> Some(vals(i))))
    val got = Correlation.haarEnergy(pts).collect()
      .map(r => r.getInt(1) -> (r.getLong(2), r.getLong(3))).toMap
    val i0 = occupied.min
    val span = occupied.max - i0 + 1
    for (k <- 1 to 4) {
      val b = 1 << k
      val nb = span / b
      val energy = (0 until nb).map { blk =>
        val d = (0 until b).map { j =>
          val i = blk * b + j
          val s = vals.get(i + i0)
            .map(v => math.floor(v * 1000 + 0.5).toLong).getOrElse(0L)
          if (j < b / 2) s else -s
        }.sum
        d * d
      }.sum
      assert(got(k) == ((nb.toLong, energy)), s"level $k")
    }
  }

  test("corrMatrix: co-moving pair reads 1, inverse pair -1, constant null") {
    import graft.events.Correlation
    val s2 = spark
    import s2.implicits._
    val h = 3600000000L
    val rows = (0 until 12).flatMap { i =>
      Seq(("a", i * h, i.toDouble), ("b", i * h, 2.0 * i + 1),
        ("c", i * h, 100.0 - i), ("d", i * h, 5.0))
    }.toDF("key", "t", "v")
    val out = Correlation.corrMatrix(rows).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out(("a", "b")) == Some(1.0))
    assert(out(("a", "c")) == Some(-1.0))
    assert(out(("a", "d")).isEmpty && out(("b", "d")).isEmpty)
    assert(out.size == 6) // 4 choose 2, lexicographic order
  }

  test("dominantPeriod: a planted 6-bin cycle wins the argmax and is significant") {
    import graft.events.Correlation
    val s2 = spark
    import s2.implicits._
    val h = 3600000000L
    val rows = (0 until 120).map(i =>
      ("u", i * h, (i % 6).toDouble * 10)).toDF("key", "t", "v")
    val r = Correlation.dominantPeriod(rows, maxLag = 24).collect().head
    assert(r.getInt(1) % 6 == 0, s"best lag ${r.getInt(1)}")
    assert(r.getDouble(3) == 1.0 && r.getLong(4) == 1L)
  }

  test("burstiness: regular is -1-ish, alternating gaps follow the closed form") {
    import graft.events.Correlation
    val s2 = spark
    import s2.implicits._
    val S = 1000000L
    // perfectly regular 10s gaps: sigma = 0 -> B = -1, memory null (var 0)
    val reg = (0 until 20).map(i => ("r", i * 10 * S))
    // alternating 2s/8s gaps: mu = 5, sigma = 3 -> B = (3-5)/(3+5) = -0.25
    var t = 0L
    val alt = ("a", 0L) +: (0 until 20).map { i =>
      t += (if (i % 2 == 0) 2 else 8) * S; ("a", t)
    }
    val out = Correlation.burstiness((reg ++ alt).toDF("key", "t"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("r").getDouble(3) == -1.0 && out("r").isNullAt(4))
    assert(out("a").getDouble(3) == -0.25)
    // memory of a strict alternation is -1
    assert(out("a").getDouble(4) == -1.0)
  }

  test("burstiness: equals the brute-force moments on random gaps") {
    import graft.events.Correlation
    val s2 = spark
    import s2.implicits._
    val rnd = new scala.util.Random(79)
    var t = 0L
    val ts = (0 until 60).map { _ =>
      t += (1 + rnd.nextInt(30)) * 1000000L; t
    }
    val out = Correlation.burstiness(ts.map(("k", _)).toDF("key", "t"))
      .collect().head
    val gaps = ts.sliding(2).map(p => (p(1) - p(0)) / 1000000L).toSeq
    val n = gaps.size.toDouble
    val sx = gaps.sum.toDouble
    val sxx = gaps.map(g => g.toDouble * g).sum
    val a = n * sxx - sx * sx
    val b = (math.sqrt(a) - sx) / (math.sqrt(a) + sx)
    def r6(x: Double) = BigDecimal(java.math.BigDecimal.valueOf(x))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.getLong(1) == gaps.size)
    assert(out.getDouble(3) == r6(b), s"${out.getDouble(3)} vs ${r6(b)}")
  }

  test("segmentedTrend: a perfect two-slope series splits at the knee with zero residual") {
    import graft.events.Correlation
    val s = 1000000L // 1 second in µs -> x = t/1e6 exactly
    // v = t for t in 0..10, then v = 10 + 5(t-10): knee at t=10
    val pts = seriesL((0L to 10L).map(i => i * s -> Some(i.toDouble)) ++
      (11L to 20L).map(i => i * s -> Some(10.0 + 5 * (i - 10))))
    val r = Correlation.segmentedTrend(pts, minSeg = 3).collect().head
    // the knee point v(10)=10 lies on BOTH lines, so splitting after
    // t=9 or after t=10 is equally perfect; ties break to the EARLIEST
    assert(r.getLong(2) == 9 * s, s"break at ${r.getLong(2)}")
    assert(r.getLong(4) == 0L) // rss_split
    assert(r.getLong(3) > 0 && r.getLong(5) == r.getLong(3))
  }

  test("segmentedTrend: a perfectly linear series gains nothing") {
    import graft.events.Correlation
    val s = 1000000L
    val pts = seriesL((0L to 15L).map(i => i * s -> Some(2.0 * i + 3)))
    val r = Correlation.segmentedTrend(pts, minSeg = 3).collect().head
    assert(r.getLong(3) == 0L && r.getLong(4) == 0L && r.getLong(5) == 0L)
  }

  test("segmentedTrend: equals the brute-force O(n^2) split search") {
    import graft.events.Correlation
    val rnd = new scala.util.Random(61)
    for (trial <- 0 until 3) {
      val n = 30 + rnd.nextInt(40)
      val pts = (0 until n).map(i =>
        (i * 1000000L + rnd.nextInt(1000) * 1000L,
          Some(rnd.nextInt(2000) / 10.0)))
      val df = seriesL(pts)
      val got = Correlation.segmentedTrend(df, minSeg = 4).collect().head
      // brute force on the same integer grid
      val sorted = pts.sortBy(_._1)
      val t0 = sorted.head._1
      val xs = sorted.map(p => (p._1 - t0) / 1000000L)
      val ys = sorted.map(p => math.floor(p._2.get * 1000 + 0.5).toLong)
      def rss(idx: Range): Double = {
        val m = idx.size.toDouble
        val sx = idx.map(xs(_)).map(BigInt(_)).sum
        val sy = idx.map(ys(_)).map(BigInt(_)).sum
        val sxx = idx.map(i => BigInt(xs(i)) * xs(i)).sum
        val syy = idx.map(i => BigInt(ys(i)) * ys(i)).sum
        val sxy = idx.map(i => BigInt(xs(i)) * ys(i)).sum
        val a = (BigInt(idx.size) * sxx - sx * sx).toDouble
        val b = (BigInt(idx.size) * sxy - sx * sy).toDouble
        val c = (BigInt(idx.size) * syy - sy * sy).toDouble
        if (a > 0) (c - b * b / a) / m else c / m
      }
      val full = rss(0 until n)
      val (bestRss, bestI) = (4 to n - 4).map(i =>
        (rss(0 until i) + rss(i until n), i)).minBy(x => (x._1, x._2))
      assert(got.getLong(2) == sorted(bestI - 1)._1,
        s"trial $trial break_t")
      assert(got.getLong(4) == math.floor(bestRss).toLong,
        s"trial $trial rss_split")
      assert(got.getLong(3) == math.floor(full).toLong)
    }
  }

  test("grangerLite: perfect one-bin lead -> r_lead = 1, r2_full = 1") {
    val s = spark
    import s.implicits._
    // B's count at bin b+1 equals A's count at bin b exactly: A's lag
    // predicts B perfectly, so the full model is exact and the gain is
    // everything persistence misses (delta = 1 - r_auto^2, since here
    // r_auto = r_collin = A's own lag-1 autocorrelation)
    val aCounts = Seq(1, 3, 2, 5, 1, 4, 2, 6, 3, 7, 2, 5, 4, 1, 6, 2)
    val rows =
      aCounts.zipWithIndex.flatMap { case (c, b) =>
        Seq.fill(c)(("a", b * 10L + 5)) } ++
      aCounts.zipWithIndex.flatMap { case (c, b) =>
        Seq.fill(c)(("b", (b + 1) * 10L + 5)) }
    val r = Correlation.grangerLite(rows.toDF("key", "t"), "a", "b",
      binUs = 10L, minBins = 4).head()
    assert(r.getLong(0) == 15L) // b = 2..16: y, y_lag, a_lag all present
    assert(r.getDouble(2) == 1.0, "r_lead")
    assert(r.getDouble(5) == 1.0, "r2_full")
    val ra = r.getDouble(1)
    assert(math.abs(r.getDouble(6) - (1.0 - ra * ra)) < 1e-5, "delta_r2")
    assert(math.abs(r.getDouble(3) - ra) < 1e-9, "r_collin = r_auto here")
  }

  test("grangerLite: collinear regressors and minBins gate -> null stats") {
    val s = spark
    import s.implicits._
    val aCounts = Seq(1, 3, 2, 5, 1, 4, 2, 6)
    // identical event streams for both keys: x1 = x2 bin-for-bin, the
    // two-regressor OLS is singular -> everything after n_bins is null
    val rows = Seq("a", "b").flatMap(k =>
      aCounts.zipWithIndex.flatMap { case (c, b) =>
        Seq.fill(c)((k, b * 10L + 5)) })
    val r = Correlation.grangerLite(rows.toDF("key", "t"), "a", "b",
      binUs = 10L, minBins = 2).head()
    assert(r.getLong(0) == 7L && (1 to 6).forall(r.isNullAt))
    // minBins gate: same construction as the perfect-lead test but the
    // bar is above the 15 available rows
    val lead = aCounts.zipWithIndex.flatMap { case (c, b) =>
      Seq.fill(c)(("a", b * 10L + 5)) } ++
      aCounts.zipWithIndex.flatMap { case (c, b) =>
        Seq.fill(c)(("b", (b + 1) * 10L + 5)) }
    val g = Correlation.grangerLite(lead.toDF("key", "t"), "a", "b",
      binUs = 10L, minBins = 100).head()
    assert(g.getLong(0) == 7L && (1 to 6).forall(g.isNullAt))
  }

  test("mutualInfo: identical series give NMI = 1; independent-ish give near 0") {
    val s = spark
    import s.implicits._
    // B's count mirrors A's bin-for-bin: joint histogram is diagonal,
    // MI = H(A) = H(B), NMI = 1 exactly (same quantized sums)
    val aCounts = Seq(1, 5, 2, 7, 1, 5, 2, 7, 3, 6, 3, 6, 1, 7, 2, 5)
    val rows = aCounts.zipWithIndex.flatMap { case (c, b) =>
      Seq.fill(c)(("a", b * 10L + 1)) ++ Seq.fill(c)(("b", b * 10L + 2)) }
    val r = Correlation.mutualInfo(rows.toDF("key", "t"), "a", "b",
      binUs = 10L, valueBins = 8).head()
    assert(r.getLong(0) == 16L)
    assert(r.getDouble(2) == r.getDouble(3) && r.getDouble(3) == r.getDouble(4))
    assert(r.getDouble(5) == 1.0)
    // constant B: H(B) = 0 -> MI = 0, NMI null
    val flat = aCounts.zipWithIndex.flatMap { case (c, b) =>
      Seq.fill(c)(("a", b * 10L + 1)) ++ Seq.fill(4)(("b", b * 10L + 2)) }
    val f = Correlation.mutualInfo(flat.toDF("key", "t"), "a", "b",
      binUs = 10L, valueBins = 8).head()
    assert(f.getDouble(2) == 0.0 && f.getDouble(4) == 0.0 && f.isNullAt(5))
  }

  test("mutualInfo equals the sequential plug-in estimator on jittery counts") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(31)
    val ac = (0 until 60).map(_ => 1 + rnd.nextInt(20))
    val bc = (0 until 60).map(i => 1 + rnd.nextInt(10) + ac(i) / 2)
    val rows = ac.zipWithIndex.flatMap { case (c, b) =>
      Seq.fill(c)(("a", b * 10L + 1)) } ++
      bc.zipWithIndex.flatMap { case (c, b) => Seq.fill(c)(("b", b * 10L + 2)) }
    val got = Correlation.mutualInfo(rows.toDF("key", "t"), "a", "b",
      binUs = 10L, valueBins = 8).head()
    val (a0, a1) = (ac.min, ac.max); val (b0, b1) = (bc.min, bc.max)
    def cls(c: Int, lo: Int, hi: Int) = (c - lo) * 8 / (hi - lo + 1)
    val cellsSeq = ac.zip(bc).map { case (a, b) =>
      (cls(a, a0, a1), cls(b, b0, b1)) }
    val n = cellsSeq.size.toDouble
    val joint = cellsSeq.groupBy(identity).view.mapValues(_.size).toMap
    val mx = cellsSeq.groupBy(_._1).view.mapValues(_.size).toMap
    val my = cellsSeq.groupBy(_._2).view.mapValues(_.size).toMap
    val mi = joint.map { case ((x, y), c) =>
      c / n * math.log(c * n / (mx(x) * my(y)).toDouble) }.sum / math.log(2)
    def h(m: Map[Int, Int]) =
      -m.values.map(c => c / n * math.log(c / n)).sum / math.log(2)
    assert(got.getLong(0) == 60L && got.getLong(1) == joint.size.toLong)
    assert(math.abs(got.getDouble(2) - mi) < 1e-4)
    assert(math.abs(got.getDouble(3) - h(mx)) < 1e-4)
    assert(math.abs(got.getDouble(4) - h(my)) < 1e-4)
    assert(math.abs(got.getDouble(5) - mi / math.min(h(mx), h(my))) < 1e-3)
  }

  test("rollingCorr: co-moving bucket reads 1, inverted bucket reads -1") {
    val s = spark
    import s.implicits._
    // bucket 0 (bins 0-9): b = 2a; bucket 1 (bins 10-19): b = 20 - a
    val ac = Seq(1, 3, 2, 5, 1, 4, 2, 6, 3, 7)
    val rows =
      ac.zipWithIndex.flatMap { case (c, b) => Seq.fill(c)(("a", b * 10L)) } ++
      ac.zipWithIndex.flatMap { case (c, b) => Seq.fill(2 * c)(("b", b * 10L)) } ++
      ac.zipWithIndex.flatMap { case (c, b) =>
        Seq.fill(c)(("a", (b + 10) * 10L)) } ++
      ac.zipWithIndex.flatMap { case (c, b) =>
        Seq.fill(20 - c)(("b", (b + 10) * 10L)) }
    val out = Correlation.rollingCorr(rows.toDF("key", "t"), "a", "b",
      binUs = 10L, bucketBins = 10L, minBins = 8)
      .orderBy("bucket").collect()
    assert(out.length == 2)
    assert(out(0).getLong(1) == 10L && out(0).getDouble(2) == 1.0)
    assert(out(1).getDouble(2) == -1.0)
    assert(out(0).getDouble(3) == out(1).getDouble(3)) // shared overall r
    // dr rounds the RAW difference; compare against the rounded overall
    // with a grid of slack
    assert(math.abs(out(0).getDouble(4) - (1.0 - out(0).getDouble(3))) < 2e-6)
  }

  test("rollingCorr equals the sequential per-bucket Pearson on random counts") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(13)
    val ac = (0 until 40).map(_ => 1 + rnd.nextInt(15))
    val bc = (0 until 40).map(i => 1 + rnd.nextInt(8) + ac(i) / 3)
    val rows =
      ac.zipWithIndex.flatMap { case (c, b) => Seq.fill(c)(("a", b * 10L)) } ++
      bc.zipWithIndex.flatMap { case (c, b) => Seq.fill(c)(("b", b * 10L)) }
    val got = Correlation.rollingCorr(rows.toDF("key", "t"), "a", "b",
      binUs = 10L, bucketBins = 16L, minBins = 8).collect()
      .map(r => r.getLong(0) -> r).toMap
    def pearson(p: Seq[(Int, Int)]): Option[Double] = {
      val n = p.size.toDouble
      val sx = p.map(_._1.toLong).sum.toDouble
      val sy = p.map(_._2.toLong).sum.toDouble
      val sxx = p.map(q => q._1.toLong * q._1).sum.toDouble
      val syy = p.map(q => q._2.toLong * q._2).sum.toDouble
      val sxy = p.map(q => q._1.toLong * q._2).sum.toDouble
      val (vx, vy) = (n * sxx - sx * sx, n * syy - sy * sy)
      if (p.size >= 8 && vx > 0 && vy > 0)
        Some((n * sxy - sx * sy) / math.sqrt(vx * vy)) else None
    }
    val all = ac.zip(bc)
    val rg = pearson(all).get
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    all.zipWithIndex.groupBy(_._2 / 16).foreach { case (bkt, rows2) =>
      val r = pearson(rows2.map(_._1))
      val row = got(bkt.toLong)
      assert(row.getLong(1) == rows2.size.toLong)
      r match {
        case Some(v) =>
          assert(math.abs(row.getDouble(2) - v) < 1e-6, s"bucket $bkt")
          assert(math.abs(row.getDouble(4) - (v - rg)) < 1e-6)
        case None => assert(row.isNullAt(2) && row.isNullAt(4))
      }
      assert(math.abs(row.getDouble(3) - rg) < 1e-6)
    }
  }

  test("grangerLite matches a sequential two-regressor reference") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(20260820)
    // independent-ish jittery counts for both keys over 48 bins
    val ac = (0 until 48).map(_ => 1 + rnd.nextInt(9))
    val bc = (0 until 48).map(i => 1 + rnd.nextInt(5) + (if (i % 7 < 3) 4 else 0))
    val rows =
      ac.zipWithIndex.flatMap { case (c, b) => Seq.fill(c)(("a", b * 10L + 3)) } ++
      bc.zipWithIndex.flatMap { case (c, b) => Seq.fill(c)(("b", b * 10L + 3)) }
    val got = Correlation.grangerLite(rows.toDF("key", "t"), "a", "b",
      binUs = 10L, minBins = 8).head()
    // sequential reference over b = 1..47
    val trip = (1 until 48).map(b => (bc(b).toDouble, bc(b - 1).toDouble,
      ac(b - 1).toDouble))
    val n = trip.size.toDouble
    def corr(p: Seq[(Double, Double)]): Double = {
      val sx = p.map(_._1).sum; val sy = p.map(_._2).sum
      val sxx = p.map(q => q._1 * q._1).sum
      val syy = p.map(q => q._2 * q._2).sum
      val sxy = p.map(q => q._1 * q._2).sum
      (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    }
    val ra = corr(trip.map(t => (t._1, t._2)))
    val rl = corr(trip.map(t => (t._1, t._3)))
    val rc = corr(trip.map(t => (t._2, t._3)))
    val full = (ra * ra + rl * rl - 2 * ra * rl * rc) / (1 - rc * rc)
    assert(got.getLong(0) == 47L)
    assert(math.abs(got.getDouble(1) - ra) < 1e-6)
    assert(math.abs(got.getDouble(2) - rl) < 1e-6)
    assert(math.abs(got.getDouble(3) - rc) < 1e-6)
    assert(math.abs(got.getDouble(4) - ra * ra) < 1e-6)
    assert(math.abs(got.getDouble(5) - full) < 1e-6)
    assert(math.abs(got.getDouble(6) - (full - ra * ra)) < 1e-6)
  }
}
