package graft

import graft.categorical.CategoricalOps
import org.apache.spark.sql.functions._

/** String-valued (categorical) series ops vs reference goldens computed
  * with the traces library itself (PYTHONPATH=/root/reference python3):
  *   ts[0]="idle"; ts[10]="busy"; ts[15]="idle"; ts[15]="error";
  *   ts[40]="idle"; ts[60]="busy"
  *   ts.distribution()            == {busy: 1/12, error: 5/12, idle: 1/2}
  *   ts.distribution(norm=False)  == {busy: 5, error: 25, idle: 30}
  *   list(ts.iterintervals(2))    == [(0,idle)->(10,busy), (10,busy)->
  *     (15,error), (15,error)->(40,idle), (40,idle)->(60,busy)]
  *   ts.get(12)=="busy"; ts.get(-5) is None; ts.get(15)=="error"
  */
class CategoricalSpec extends SparkSpec {

  private def stateSeries = {
    val s = spark
    import s.implicits._
    // two writes at t=15 ("idle" then "error") pre-resolved last-write-wins,
    // as statePoints' max_by dedupe does for the driver tables
    Seq(("u", 0L, "idle"), ("u", 10L, "busy"), ("u", 15L, "error"),
      ("u", 40L, "idle"), ("u", 60L, "busy"))
      .toDF("key", "t", "sv")
  }

  test("stateDistribution matches traces distribution() on the golden") {
    val d = CategoricalOps.stateDistribution(stateSeries)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getDouble(3))).sortBy(_._1).toSeq
    assert(d == Seq(
      ("busy", 5L, 0.083333), ("error", 25L, 0.416667), ("idle", 30L, 0.5)), d.toString)
  }

  test("transitions = iterintervals(2) pair counts, self-transitions included") {
    val s = spark
    import s.implicits._
    val pts = stateSeries.unionByName(
      Seq(("w", 0L, "a"), ("w", 5L, "a"), ("w", 9L, "b")).toDF("key", "t", "sv"))
    val tr = CategoricalOps.transitions(pts)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(tr == Map(
      ("idle", "busy") -> 2L, ("busy", "error") -> 1L, ("error", "idle") -> 1L,
      ("a", "a") -> 1L, ("a", "b") -> 1L), tr.toString)
  }

  test("sampleStates: previous interpolation, inclusive at points, null before first") {
    val keys = stateSeries.select("key").distinct()
    val got = CategoricalOps.sampleStates(stateSeries, keys, -5L, 60L, 5L)
      .collect().map(r => (r.getLong(1), Option(r.getString(2)))).sortBy(_._1).toSeq
    val expect = Seq(
      -5L -> None, 0L -> Some("idle"), 5L -> Some("idle"), 10L -> Some("busy"),
      15L -> Some("error"), 20L -> Some("error"), 25L -> Some("error"),
      30L -> Some("error"), 35L -> Some("error"), 40L -> Some("idle"),
      45L -> Some("idle"), 50L -> Some("idle"), 55L -> Some("idle"),
      60L -> Some("busy"))
    assert(got == expect, got.toString)
  }

  test("segments drop the last point and carry state values") {
    val segs = CategoricalOps.segments(stateSeries)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3))).sortBy(_._1).toSeq
    assert(segs == Seq((0L, 10L, "idle"), (10L, 15L, "busy"),
      (15L, 40L, "error"), (40L, 60L, "idle")), segs.toString)
  }

  test("markovBaseline: modal next state with smallest-state tie-break") {
    val s = spark
    import s.implicits._
    // key k1: a->b, b->a, a->b ; key k2: a->c, c->a
    // from a: b twice, c once -> top b, 2/3; from b: a once -> 1.0;
    // from c: a once -> 1.0
    val pts = Seq(
      ("k1", 0L, "a"), ("k1", 1L, "b"), ("k1", 2L, "a"), ("k1", 3L, "b"),
      ("k2", 0L, "a"), ("k2", 1L, "c"), ("k2", 2L, "a"))
      .toDF("key", "t", "sv")
    val out = CategoricalOps.markovBaseline(pts).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))).toMap
    assert(out("a") == (("b", 2L, 3L, 0.666667)))
    assert(out("b") == (("a", 1L, 1L, 1.0)))
    assert(out("c") == (("a", 1L, 1L, 1.0)))
    // tie: from a, equal counts to b and c -> smallest state b wins
    val tie = Seq(("k", 0L, "a"), ("k", 1L, "c"), ("k", 2L, "a"),
      ("k", 3L, "b")).toDF("key", "t", "sv")
    val rt = CategoricalOps.markovBaseline(tie).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rt("a") == "b")
  }

  test("entropyRate: deterministic cycle is 0 bits; fair coin is 1 bit") {
    val s = spark
    import s.implicits._
    val cycle = (0 until 20).map(i => ("k", i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("key", "t", "sv")
    val r = CategoricalOps.entropyRate(cycle).head()
    assert(r.getLong(1) == 19L && r.getDouble(3) == 0.0)
    // aabb repeated: from a the next is a,b equally (aa=2, ab=2), from b
    // equally (bb=2, ba=2) -> exactly 1 bit
    val coin = Seq("a", "a", "b", "b", "a", "a", "b", "b", "a").zipWithIndex
      .map { case (v, i) => ("k", i.toLong, v) }.toDF("key", "t", "sv")
    val c = CategoricalOps.entropyRate(coin).head()
    assert(c.getLong(1) == 8L)
    assert(math.abs(c.getDouble(3) - 1.0) < 2e-6) // 2^20-grid quantization
  }

  test("entropyRate equals the sequential brute-force on a jittery chain") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val states = Iterator.iterate("a")(st => (st, rnd.nextInt(10)) match {
      case ("a", r) => if (r < 7) "b" else if (r < 9) "a" else "c"
      case ("b", r) => if (r < 5) "a" else "c"
      case (_, r)   => if (r < 8) "a" else "b"
    }).take(400).toSeq
    val df = states.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
      .toDF("key", "t", "sv")
    val got = CategoricalOps.entropyRate(df).head()
    val bigrams = states.sliding(2).map(p => (p(0), p(1))).toSeq
    val nab = bigrams.groupBy(identity).view.mapValues(_.size).toMap
    val na = bigrams.groupBy(_._1).view.mapValues(_.size).toMap
    val n = bigrams.size.toDouble
    val h = nab.map { case ((a, _), c) =>
      c * (math.log(na(a)) - math.log(c)) }.sum / n / math.log(2.0)
    assert(got.getLong(1) == bigrams.size.toLong)
    assert(got.getLong(2) == nab.size.toLong)
    assert(math.abs(got.getDouble(3) - h) < 1e-4) // quantized-ln grid
  }
}
