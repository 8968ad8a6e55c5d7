package graft

import graft.text.LexStats

/** Zipf / Heaps lexical fits: closed-form degenerate cases plus an
  * exact-replica sequential reference (quantized-ln OLS mirrored, so
  * equality is exact up to the 1e-6 output rounding). */
class LexStatsSpec extends SparkSpec {

  private def qln(v: Long): Long =
    math.floor(math.log(v.toDouble) * 1048576 + 0.5).toLong

  /** (slope, r2) of the quantized OLS over (qln x, qln y) pairs. */
  private def fit(pairs: Seq[(Long, Long)]): (Double, Double) = {
    val q = pairs.map { case (x, y) => (BigInt(qln(x)), BigInt(qln(y))) }
    val k = BigInt(q.size)
    val sx = q.map(_._1).sum; val sy = q.map(_._2).sum
    val sxx = q.map(p => p._1 * p._1).sum
    val sxy = q.map(p => p._1 * p._2).sum
    val syy = q.map(p => p._2 * p._2).sum
    val num = (k * sxy - sx * sy).toDouble
    val den = (k * sxx - sx * sx).toDouble
    val deny = (k * syy - sy * sy).toDouble
    (num / den, num * num / (den * deny))
  }

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("zipfFit equals the sequential quantized OLS on a Zipfian corpus") {
    val s = spark
    import s.implicits._
    // term w<i> appears ceil(2000 / i) times, scattered over 20 docs
    val words = (1 to 120).flatMap(i => Seq.fill((2000 + i - 1) / i)(s"w$i"))
    val docs = words.grouped(words.size / 20 + 1).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val got = LexStats.zipfFit(docs, topR = 100).head()
    val counts = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val head = counts.toSeq.sortBy { case (t, n) => (-n, t) }.take(100)
    val (slope, r2) = fit(head.zipWithIndex.map { case ((_, n), i) =>
      ((i + 1).toLong, n) })
    assert(got.getLong(0) == 100L)
    assert(got.getLong(1) == words.size.toLong)
    assert(got.getLong(2) == counts.size.toLong)
    assert(got.getDouble(3) == r6(slope) && slope < -0.8 && slope > -1.2)
    assert(got.getDouble(4) == r6(r2) && r2 > 0.95)
  }

  test("heapsFit: all-unique tokens give beta exactly 1; constant vocab nulls") {
    val s = spark
    import s.implicits._
    val uniq = (0L until 40L).map(i =>
      (i, (0 until 5).map(j => s"u${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val r = LexStats.heapsFit(uniq, nCk = 10).head()
    // types == tokens at every prefix -> y = x -> slope 1, r2 1
    assert(r.getLong(0) == 10L && r.getLong(1) == 200L && r.getLong(2) == 200L)
    assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 1.0)
    // one global token: vocabulary is flat -> zero slope, r2 null (deny 0)
    val const = (0L until 40L).map(i => (i, "same same same"))
      .toDF("doc_id", "text")
    val c = LexStats.heapsFit(const, nCk = 10).head()
    assert(c.getLong(2) == 1L && c.getDouble(3) == 0.0 && c.isNullAt(4))
  }

  test("trendingTerms: bursting term leads, steady term reads lift 1, new term ranks first") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    // 8 "days" (doc per day): 'base' appears 10x every day; 'burst'
    // appears 1x on days 0-6 then 20x on day 7; 'fresh' first appears
    // on day 7 with 6 hits
    val docs = (0 until 8).map { d =>
      val words = Seq.fill(10)("base") ++
        (if (d == 7) Seq.fill(20)("burst") else Seq("burst")) ++
        (if (d == 7) Seq.fill(6)("fresh") else Nil)
      (d.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
    val out = graft.text.LexStats.trendingTerms(docs, col("doc_id"),
      k = 10, window = 7, minN = 5)
      .filter(col("day") === 7).orderBy("term_rank").collect()
    // fresh (no baseline) first, then burst (20*7/7=20), then base (1.0)
    assert(out.map(_.getString(1)).toSeq == Seq("fresh", "burst", "base"))
    assert(out(0).isNullAt(4) && out(0).getLong(3) == 0L)
    assert(out(1).getDouble(4) == 20.0)
    assert(out(2).getDouble(4) == 1.0)
  }

  test("trendingTerms equals the sequential lift computation on a random corpus") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(17)
    val vocab = (0 until 30).map(i => s"w$i")
    val perDay = (0 until 12).map { d =>
      d.toLong -> (0 until 120).map(_ => vocab(rnd.nextInt(30)))
    }
    val docs = perDay.map { case (d, ws) => (d, ws.mkString(" ")) }
      .toDF("doc_id", "text")
    val got = graft.text.LexStats.trendingTerms(docs, col("doc_id"),
      k = 5, window = 3, minN = 4).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getInt(5)).map(r =>
        (r.getString(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toSeq).toMap
    val cnt = perDay.toMap.view.mapValues(
      _.groupBy(identity).view.mapValues(_.size.toLong).toMap).toMap
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for (d <- 0L until 12L) {
      val cands = cnt(d).filter(_._2 >= 4).map { case (t, n) =>
        val base = (1 to 3).map(o => cnt.get(d - o)
          .flatMap(_.get(t)).getOrElse(0L)).sum
        // null lift <=> the term never appeared in the trailing window
        val lift = if (base == 0) None else Some(r6(n.toDouble * 3 / base))
        (t, n, base, lift)
      }.toSeq
      val expect = cands.sortBy { case (t, _, _, l) =>
        (l.isDefined, l.map(-_).getOrElse(0.0), t) }.take(5)
      got.get(d).foreach { rows => assert(rows == expect, s"day $d") }
      if (cands.nonEmpty) assert(got.contains(d), s"day $d missing")
    }
  }

  test("termDispersion: boilerplate term concentrates, natural term spreads") {
    val s = spark
    import s.implicits._
    // 'nav' appears 30x in each of 2 docs (tf 60, df 2); 'the' appears
    // once in each of 60 docs (tf 60, df 60); both clear minTf 50
    val docs = ((0 until 2).map(i =>
        (i.toLong, Seq.fill(30)("nav").mkString(" "))) ++
      (2 until 62).map(i => (i.toLong, "the")))
      .toDF("doc_id", "text")
    val out = graft.text.LexStats.termDispersion(docs, k = 5, minTf = 50)
      .collect()
    assert(out.map(_.getString(0)).toSeq == Seq("nav", "the"))
    val nav = out(0)
    assert(nav.getLong(1) == 60 && nav.getLong(2) == 2 && nav.getLong(3) == 30)
    assert(nav.getDouble(4) == 0.033333 && nav.getDouble(5) == 0.5)
    val the = out(1)
    assert(the.getDouble(4) == 1.0 && the.getDouble(5) == 0.016667)
  }

  test("heapsFit equals the sequential quantized OLS on a mixed corpus") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(5)
    val docs = (0L until 50L).map { i =>
      val ws = (0 until 30).map(_ => s"t${rnd.nextInt(200)}")
      (i, ws.mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val got = LexStats.heapsFit(df, nCk = 10).head()
    // sequential prefix replay at the same checkpoints
    val ck = docs.map { case (id, text) =>
      (math.min(9L, id * 10 / 50), text.split(" ").toSeq) }
    val pairs = (0L to 9L).map { c =>
      val pre = ck.filter(_._1 <= c).flatMap(_._2)
      (pre.size.toLong, pre.distinct.size.toLong)
    }
    val (beta, r2) = fit(pairs)
    assert(got.getLong(0) == 10L)
    assert(got.getLong(1) == 1500L)
    assert(got.getDouble(3) == r6(beta) && beta > 0.2 && beta < 1.0)
    assert(got.getDouble(4) == r6(r2))
  }
}
