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

  test("motifSurprise: second-order pattern lifts 2x over the Markov-1 baseline") {
    val s = spark
    import s.implicits._
    // ten keys chain a->b->c, ten chain d->b->e: P(c|ab)=1 but P(c|b)=1/2
    val pts = (0 until 10).flatMap { i =>
      Seq((s"k$i", 0L, "a"), (s"k$i", 1L, "b"), (s"k$i", 2L, "c"),
        (s"m$i", 0L, "d"), (s"m$i", 1L, "b"), (s"m$i", 2L, "e"))
    }.toDF("key", "t", "sv")
    val out = CategoricalOps.motifSurprise(pts, k = 20, minN = 5).collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getLong(3) == 10L && r.getLong(4) == 10L &&
        r.getLong(5) == 10L && r.getLong(6) == 20L)
      assert(r.getDouble(7) == 2.0)
    }
    // minN: raising the floor above 10 empties the result
    assert(CategoricalOps.motifSurprise(pts, k = 20, minN = 11).count() == 0)
  }

  test("motifSurprise equals the sequential lift computation on random chains") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(77)
    val states = Seq("a", "b", "c", "d")
    val chains = (0 until 8).map { k =>
      s"k$k" -> (0 until 60).map(_ => states(rnd.nextInt(4)))
    }
    val pts = chains.flatMap { case (k, svs) =>
      svs.zipWithIndex.map { case (v, i) => (k, i.toLong, v) } }
      .toDF("key", "t", "sv")
    val got = CategoricalOps.motifSurprise(pts, k = 10, minN = 3).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        r.getDouble(7))).toMap
    val tris = chains.flatMap(_._2.sliding(3).filter(_.size == 3)
      .map(w => (w(0), w(1), w(2))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bis = chains.flatMap(_._2.sliding(2).filter(_.size == 2)
      .map(w => (w(0), w(1))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val unis = bis.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    got.foreach { case ((a, b, c), lift) =>
      val expect = r6(tris((a, b, c)).toDouble * unis(b) /
        (bis((a, b)) * bis((b, c))).toDouble)
      assert(lift == expect, s"($a,$b,$c)")
    }
    // the returned set IS the global top-10 by (lift desc, a, b, c)
    val all = tris.filter(_._2 >= 3).map { case ((a, b, c), n) =>
      ((a, b, c), r6(n.toDouble * unis(b) / (bis((a, b)) * bis((b, c))).toDouble))
    }.toSeq.sortBy { case ((a, b, c), l) => (-l, a, b, c) }.take(10)
    assert(got.keySet == all.map(_._1).toSet)
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
