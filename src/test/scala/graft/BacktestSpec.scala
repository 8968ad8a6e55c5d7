package graft

import graft.events.{Correlation, EventOps}
import graft.rollup.Rollup
import org.apache.spark.sql.functions._

/** Hand-checked semantics for the forecast-backtest / compression wave:
  * seasonal-naive MASE, best-lag CCF, calendar heatmap, deadband
  * compression, count-trimmed mean.
  */
class BacktestSpec extends SparkSpec {

  test("seasonalNaive: a perfect period-S cycle has zero seasonal error") {
    // 10 cycles of period 4 on the unit bin grid: x(b) = pattern(b % 4)
    val pattern = Seq(1.0, 5.0, 2.0, 8.0)
    val pts = seriesL((0 until 40).map(b =>
      (b.toLong, Some(pattern(b % 4)))))
    val out = Correlation.seasonalNaive(pts, season = 4, binUs = 1L,
      minPairs = 8).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 36) // n_seasonal: bins 4..39
    assert(r.getLong(2) == 39) // n_naive: bins 1..39
    assert(r.getDouble(3) == 0.0) // mae_seasonal
    assert(r.getDouble(4) > 0)    // the cycle itself has naive error
    assert(r.getDouble(5) == 0.0) // mase
  }

  test("seasonalNaive: hand-computed errors on a short series") {
    // bins 0,1,2,3 values 1,2,4,7; season 2 pairs: (2,0)=3,(3,1)=5 ->
    // mae_s = 4.0 over 2; naive pairs: 1,2,3 -> mae_n = 2.0 over 3
    val pts = seriesL(Seq((0L, Some(1.0)), (1L, Some(2.0)),
      (2L, Some(4.0)), (3L, Some(7.0))))
    val r = Correlation.seasonalNaive(pts, season = 2, binUs = 1L,
      minPairs = 2).collect().head
    assert(r.getLong(1) == 2 && r.getLong(2) == 3)
    assert(r.getDouble(3) == 4.0)
    assert(r.getDouble(4) == 2.0)
    assert(r.getDouble(5) == 2.0) // mase = 4/2
  }

  test("seasonalNaive: under minPairs emits null scores, keeps counts") {
    val pts = seriesL(Seq((0L, Some(1.0)), (1L, Some(2.0)), (2L, Some(3.0))))
    val r = Correlation.seasonalNaive(pts, season = 1, binUs = 1L,
      minPairs = 8).collect().head
    assert(r.getLong(1) == 2 && r.getLong(2) == 2)
    assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5))
  }

  test("bestLag: detects a constructed lead and breaks ties to small lag") {
    val s = spark
    import s.implicits._
    // b follows a exactly 3 bins later: counts per bin via repeated rows
    val rnd = new scala.util.Random(11)
    val counts = (0 until 40).map(_ => 1 + rnd.nextInt(5))
    val rows =
      counts.zipWithIndex.flatMap { case (c, b) =>
        Seq.fill(c)(("a", b.toLong)) ++ Seq.fill(c)(("b", b + 3L))
      }
    val df = rows.toDF("key", "t")
    val out = Correlation.bestLag(df, "a", "b", maxLag = 6, binUs = 1L,
      minBins = 8).collect()
    assert(out.length == 1)
    assert(out.head.getInt(0) == 3)
    assert(out.head.getDouble(2) == 1.0)
  }

  test("bestLag: empty when no lag clears minBins") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 0L), ("b", 1L)).toDF("key", "t")
    assert(Correlation.bestLag(df, "a", "b", maxLag = 2, binUs = 1L,
      minBins = 8).count() == 0)
  }

  test("calendarHeatmap: counts land in the right (weekday, hour) cells") {
    val s = spark
    import s.implicits._
    val day = 86400000000L
    val hour = 3600000000L
    // epoch day 0 is Thursday (weekday 3); day 4 is Monday (weekday 0)
    val df = Seq(
      ("k", 0L), ("k", 1L),            // Thursday 00h x2
      ("k", 4 * day + 5 * hour),       // Monday 05h
      ("k", 11 * day + 5 * hour))      // next Monday 05h
      .toDF("key", "t")
    val out = Rollup.calendarHeatmap(df).collect()
      .map(r => ((r.getInt(1), r.getInt(2)), (r.getLong(3), r.getDouble(4))))
      .toMap
    assert(out((3, 0)) == (2L, 0.5))
    assert(out((0, 5)) == (2L, 0.5))
    assert(out.size == 2)
  }

  test("deadband: greedy chain keeps only >= delta moves from last kept") {
    val pts = seriesL(Seq(
      (0L, Some(10.0)),  // kept (first)
      (1L, Some(10.4)),  // |0.4| < 0.5 dropped
      (2L, Some(10.5)),  // |0.5| >= 0.5 kept
      (3L, Some(10.2)),  // vs 10.5: 0.3 dropped
      (4L, Some(9.9)),   // vs 10.5: 0.6 kept
      (5L, Some(9.9))))  // 0.0 dropped
    val out = collectTVL(EventOps.deadband(pts, delta = 0.5))
    assert(out == Seq(0L -> Some(10.0), 2L -> Some(10.5), 4L -> Some(9.9)))
  }

  test("deadband matches a sequential reference on seeded data") {
    val rnd = new scala.util.Random(4242)
    for (trial <- 0 until 4) {
      val pts = (0 until 300).map(_ =>
        (rnd.nextInt(500).toLong, Some(rnd.nextDouble() * 40)))
      val delta = 3.0 + trial
      val df = seriesL(pts)
      // sequential reference: dedupe (t -> max v), sort, greedy chain on
      // the same 1e-3 long grid
      val deduped = pts.groupBy(_._1).map { case (t, ps) =>
        (t, ps.map(_._2.get).max)
      }.toSeq.sortBy(_._1)
      val deltaMilli = math.rint(delta * 1000).toLong
      var last = Long.MinValue / 2
      val expect = deduped.flatMap { case (t, v) =>
        val x = math.floor(v * 1000 + 0.5).toLong
        if (math.abs(x - last) >= deltaMilli) { last = x; Some(t -> Some(v)) }
        else None
      }
      assert(collectTVL(EventOps.deadband(df, delta)) == expect,
        s"trial $trial")
    }
  }

  test("trimmedMean: drops trim lowest/highest, null when nothing left") {
    val pts = seriesL(Seq(
      (0L, Some(100.0)), (1L, Some(1.0)), (2L, Some(2.0)),
      (3L, Some(3.0)), (4L, Some(-50.0))))
    // trim=1: drop -50 and 100 -> mean(1,2,3) = 2
    val r = EventOps.trimmedMean(pts, bucketUs = 1000L, trim = 1)
      .collect().head
    assert(r.getLong(2) == 5 && r.getLong(3) == 3)
    assert(r.getDouble(4) == 2.0)
    // trim=3 over 5 points: nothing survives -> null mean
    val r2 = EventOps.trimmedMean(pts, bucketUs = 1000L, trim = 3)
      .collect().head
    assert(r2.getLong(3) == 0 && r2.isNullAt(4))
  }

  test("completeness: bin coverage and edge-inclusive max gap") {
    val s = spark
    import s.implicits._
    // 100µs "days" of 4 25µs bins
    val df = Seq(("k", 0L), ("k", 30L), ("k", 55L), ("k", 199L))
      .toDF("key", "t")
    val out = EventOps.completeness(df, dayUs = 100L, binUs = 25L)
      .collect()
      .map(r => (r.getLong(1),
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5))))
      .toMap
    // day 0: bins {0,1,2} of 4, gaps 0/30/25 + end edge 100-55=45
    assert(out(0L) == (3L, 3L, 0.75, 45L))
    // day 1: one event at 199 -> start edge 99 dominates, end edge 1
    assert(out(1L) == (1L, 1L, 0.25, 99L))
  }

  test("auc: left-Riemann and trapezoid over a hand-checked day") {
    // 100s "day" in µs; points (0s, 2), (10s, 4), (30s, 0)
    val us = 1000000L
    val pts = seriesL(Seq((0L, Some(2.0)), (10 * us, Some(4.0)),
      (30 * us, Some(0.0))))
    val r = EventOps.auc(pts, dayUs = 100 * us).collect().head
    assert(r.getLong(2) == 3)
    // prev: 10*2 + 20*4 = 100; linear: 10*(2+4)/2 + 20*(4+0)/2 = 70
    assert(r.getDouble(3) == 100.0)
    assert(r.getDouble(4) == 70.0)
  }

  test("auc: single-point day emits null integrals; days independent") {
    val us = 1000000L
    val pts = seriesL(Seq((0L, Some(5.0)), (10 * us, Some(5.0)),
      (100 * us, Some(9.0))))
    val out = EventOps.auc(pts, dayUs = 100 * us).collect()
      .map(r => r.getLong(1) -> r).toMap
    assert(out(0L).getDouble(3) == 50.0) // 10s at 5
    assert(out(1L).isNullAt(3) && out(1L).isNullAt(4))
  }

  test("spcRules: r1/r2/r4 fire on constructed patterns") {
    // bucket stats over all 12 points; 10 at 10.0, one spike, one dip
    val base = (0 until 9).map(i => (i.toLong, Some(10.0)))
    val pts = seriesL(base ++ Seq(
      (9L, Some(10.0)), (10L, Some(30.0)), (11L, Some(10.0))))
    val out = EventOps.spcRules(pts, bucketUs = 1000L, minN = 8)
      .collect().map(r => (r.getLong(2),
        (r.getInt(4), r.getInt(5), r.getInt(6), r.getInt(7)))).toMap
    // the spike is far beyond 3 sigma of the (mostly flat) bucket
    assert(out(10L)._1 == 1 && out(10L)._2 == 1)
    // every 10.0 sits below the mean (side -1); the 9th consecutive
    // below-center point fires r4
    assert(out(8L)._1 == -1 && out(8L)._4 == 1)
    assert(out(7L)._4 == 0) // only 8 so far
  }

  test("spcRules: r2 needs 2 of trailing 3 beyond 2 sigma, same side") {
    // flat bucket with two adjacent high spikes: second spike fires r2
    val pts = seriesL((0 until 10).map(i => (i.toLong, Some(10.0))) ++
      Seq((10L, Some(20.0)), (11L, Some(20.0))))
    val out = EventOps.spcRules(pts, bucketUs = 1000L, minN = 8)
      .collect().map(r => (r.getLong(2), r.getInt(6))).toMap
    assert(out(11L) == 1)
    assert(out(10L) == 0) // only 1 of trailing 3 beyond 2 sigma yet
  }

  test("peaks: full-frame local maxima, plateau resolves to first point") {
    val vals = Seq(1.0, 2, 3, 2, 1, 2, 5, 5, 2, 1, 0, 1, 2)
    val pts = seriesL(vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, Some(v))
    })
    val out = EventOps.peaks(pts, w = 2).collect()
      .map(r => (r.getLong(1), r.getDouble(3))).toMap
    // t=2 (3): beats {1,2} before and {2,1} after -> peak, range 3-1=2
    // t=6 (5): beats {1,2} before, ties t=7 after (>= wins) -> peak
    // t=7 (5): NOT > its predecessor 5 -> not a peak
    assert(out.keySet == Set(2L, 6L))
    assert(out(2L) == 2.0)
    assert(out(6L) == 4.0) // min over {1,2,5,5,2} is 1
  }

  test("peaks: series edges never qualify (frames must be full)") {
    val pts = seriesL(Seq((0L, Some(3.0)), (1L, Some(1.0)),
      (2L, Some(5.0)), (3L, Some(1.0)), (4L, Some(3.0))))
    // the local maxima at the edges are skipped (partial frames);
    // t=2 is the only full-frame peak
    val out = EventOps.peaks(pts, w = 2).collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(2L))
  }

  test("records: first point is both records; margins past old record") {
    val pts = seriesL(Seq((0L, Some(5.0)), (1L, Some(7.0)),
      (2L, Some(6.0)), (3L, Some(3.0)), (4L, Some(7.0))))
    val out = EventOps.records(pts).collect()
      .map(r => (r.getLong(1), (r.getInt(3), r.getInt(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))).toMap
    assert(out(0L) == (1, 1, None))
    assert(out(1L) == (1, 0, Some(2.0)))  // high 5 -> 7
    assert(out(3L) == (0, 1, Some(2.0)))  // low 5 -> 3
    assert(!out.contains(2L) && !out.contains(4L)) // 7 ties, not a record
  }

  test("activityOverlap: exact jaccard of active bins, sparse pairs") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("a", 0L), ("a", 5L), ("a", 10L), ("a", 15L),
      ("b", 10L), ("b", 15L), ("b", 20L),
      ("c", 100L))
      .toDF("key", "t")
    val out = graft.events.Correlation.activityOverlap(df, binUs = 5L)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    // a bins {0,1,2,3}, b bins {2,3,4}: inter 2, union 5
    assert(out(("a", "b")) == (4L, 3L, 2L, 0.4))
    // c shares nothing -> absent
    assert(out.size == 1)
  }

  test("scheduleConformance: exact 1.5x/3x gap classes and share") {
    val h = 10L // nominal period in this toy unit
    val pts = seriesL(Seq(0L, 10L, 25L, 55L, 120L).map(t => (t, Some(0.0))))
      .select("key", "t")
    val out = EventOps.scheduleConformance(pts, periodUs = h, bucketUs = 1000L)
      .collect().head
    // gaps 10 (on-time), 15 (on-time, == 1.5p), 30 (late, == 3p),
    // 65 (missed)
    assert((out.getLong(2), out.getLong(3), out.getLong(4),
      out.getLong(5)) == (4L, 2L, 1L, 1L))
    assert(out.getDouble(6) == 0.5)
  }

  test("leaderboard: per-day ranks with churn vs previous appearing day") {
    val s = spark
    import s.implicits._
    // day width 10: day 0 counts a=3 b=1; day 1 counts a=1 b=2
    val df = (Seq.fill(3)(("a", 0L)) ++ Seq(("b", 5L)) ++
      Seq(("a", 10L)) ++ Seq.fill(2)(("b", 15L))).toDF("key", "t")
    val out = EventOps.leaderboard(df, dayUs = 10L).collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getInt(3),
          if (r.isNullAt(4)) None else Some(r.getInt(4))))).toMap
    assert(out(("a", 0L)) == (3L, 1, None))
    assert(out(("b", 0L)) == (1L, 2, None))
    assert(out(("a", 1L)) == (1L, 2, Some(1))) // fell to 2
    assert(out(("b", 1L)) == (2L, 1, Some(2))) // rose to 1
  }

  test("trailingDistinct: exact trailing-window actives, sparse days") {
    val s = spark
    import s.implicits._
    // day width 10, window 2 days: k active days 0 (u1,u2), 2 (u2)
    val df = Seq(("k", 0L, "u1"), ("k", 5L, "u2"), ("k", 25L, "u2"))
      .toDF("key", "t", "user")
    val out = EventOps.trailingDistinct(df, "user", windowDays = 2,
      dayUs = 10L).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    // day 0: {u1,u2}; day 2: {u2} only (day 0 outside the 2-day window);
    // day 1 absent (no data that day)
    assert(out == Map(0L -> 2L, 2L -> 1L))
  }

  test("ohlc: by-time open/close, by-value high/low, dup-t collapses") {
    val pts = seriesL(Seq(
      (5L, Some(3.0)), (5L, Some(7.0)), // dup t -> max 7 is the open
      (6L, Some(1.0)), (8L, Some(9.0)), (9L, Some(4.0)),
      (15L, Some(2.0))))
    val out = Rollup.ohlc(pts, bucketUs = 10L).collect()
      .map(r => r.getLong(1) -> (r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6))).toMap
    assert(out(0L) == (7.0, 9.0, 1.0, 4.0, 4L))
    assert(out(1L) == (2.0, 2.0, 2.0, 2.0, 1L))
  }

  test("seasonalIndex: hourly mean over overall mean, zero-mean gated") {
    val s = spark
    import s.implicits._
    val hour = 3600000000L
    // hour 0: 2.0, 4.0 (mean 3); hour 1: 6.0 (mean 6); overall mean 4
    val df = Seq(("k", 0L, 2.0), ("k", 100L, 4.0), ("k", hour, 6.0))
      .toDF("key", "t", "v")
    val out = Rollup.seasonalIndex(df).collect()
      .map(r => r.getInt(1) -> (r.getLong(2), r.getDouble(3),
        r.getDouble(4))).toMap
    assert(out(0) == (2L, 3.0, 0.75))
    assert(out(1) == (1L, 6.0, 1.5))
    // zero overall mean -> null index
    val z = Seq(("k", 0L, 1.0), ("k", hour, -1.0)).toDF("key", "t", "v")
    val zo = Rollup.seasonalIndex(z).collect()
    assert(zo.forall(_.isNullAt(4)))
  }

  test("trimmedMean: tie values trim deterministically by (v, t)") {
    val pts = seriesL(Seq(
      (0L, Some(5.0)), (1L, Some(5.0)), (2L, Some(5.0)), (3L, Some(7.0))))
    // order: (5,0),(5,1),(5,2),(7,3); trim=1 keeps ranks 2..3 -> 5,5
    val r = EventOps.trimmedMean(pts, bucketUs = 1000L, trim = 1)
      .collect().head
    assert(r.getLong(3) == 2 && r.getDouble(4) == 5.0)
  }
}
