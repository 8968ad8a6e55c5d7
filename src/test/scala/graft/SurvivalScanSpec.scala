package graft

import graft.events.EventOps
import org.apache.spark.sql.functions._

/** Hand-checked + sequential-reference semantics for the survival /
  * clamp-scan wave: Kaplan-Meier over inter-event waits, saturating
  * running sum (two-barrier Lindley scan).
  */
class SurvivalScanSpec extends SparkSpec {

  private def kmInput(rows: Seq[(String, String, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("key", "actor", "t")
  }

  test("kaplanMeier: hand-computed steps with right-censoring") {
    // actor A events 0,10,13 (gaps 10,3); B events 0,5 (gap 5);
    // horizon = 13 -> censored waits 0 (A) and 8 (B)
    val df = kmInput(Seq(("k", "A", 0L), ("k", "A", 10L), ("k", "A", 13L),
      ("k", "B", 0L), ("k", "B", 5L)))
    val out = EventOps.kaplanMeier(df, unitUs = 1L).orderBy("d").collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
      r.getDouble(4))).toSeq ==
      Seq((3L, 4L, 1L, 0.75), (5L, 3L, 1L, 0.5), (10L, 1L, 1L, 0.0)))
  }

  test("kaplanMeier: explicit horizon matches the derived one") {
    val df = kmInput(Seq(("k", "A", 0L), ("k", "A", 10L), ("k", "A", 13L),
      ("k", "B", 0L), ("k", "B", 5L)))
    val a = EventOps.kaplanMeier(df, 1L).orderBy("d").collect().toSeq
    val b = EventOps.kaplanMeier(df, 1L, horizonUs = Some(13L))
      .orderBy("d").collect().toSeq
    assert(a == b)
  }

  test("kaplanMeier: single-event actors yield no steps") {
    val df = kmInput(Seq(("k", "A", 0L), ("k", "B", 7L)))
    assert(EventOps.kaplanMeier(df, 1L).count() == 0)
  }

  private def satInput(rows: Seq[(String, Long, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("key", "t", "a")
  }

  test("saturatingSum: hand case with both barriers and flags") {
    // cap 5: +10 -> 5 (hi clip), -20 -> 0 (lo clip), +3 -> 3, +1 -> 4
    val df = satInput(Seq(("k", 0L, 10L), ("k", 1L, -20L),
      ("k", 2L, 3L), ("k", 3L, 1L)))
    val out = EventOps.saturatingSum(df, cap = 5L, bucketMicros = 2L)
      .orderBy("t").collect()
      .map(r => (r.getLong(3), r.getInt(4))).toSeq
    assert(out == Seq((5L, 1), (0L, -1), (3L, 0), (4L, 0)))
  }

  test("saturatingSum: matches a sequential fold at several bucket widths") {
    val rnd = new scala.util.Random(42)
    val keys = Seq("a", "b", "c")
    val rows = keys.flatMap { k =>
      (0 until 200).map(i => (k, i.toLong * 3 + rnd.nextInt(2),
        (rnd.nextInt(41) - 20).toLong))
    }
    // dedupe (key, t) by summing a — the operator's input contract
    val byT = rows.groupBy(r => (r._1, r._2))
      .map { case ((k, t), rs) => (k, t, rs.map(_._3).sum) }.toSeq
    val cap = 30L
    val expect = byT.groupBy(_._1).flatMap { case (k, rs) =>
      var s = 0L
      rs.sortBy(_._2).map { case (_, t, a) =>
        s = math.min(cap, math.max(0L, s + a))
        (k, t, s)
      }
    }.toSet
    for (w <- Seq(1L, 7L, 50L, 10000L)) {
      val got = EventOps.saturatingSum(satInput(byT), cap, w)
        .select("key", "t", "level").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expect, s"bucket width $w diverged")
    }
  }

  test("saturatingSum: clip flags agree with the sequential definition") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 100).map(i => ("k", i.toLong,
      (rnd.nextInt(21) - 10).toLong))
    val cap = 12L
    var s = 0L
    val expect = rows.map { case (_, t, a) =>
      val raw = s + a
      s = math.min(cap, math.max(0L, raw))
      val f = if (raw > s) 1 else if (raw < s) -1 else 0
      (t, s, f)
    }.toSet
    val got = EventOps.saturatingSum(satInput(rows), cap, 13L)
      .select("t", "level", "clipped").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expect)
  }
}
