package graft

import graft.dedup.Dedup
import graft.pack.Packing
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {

  private def docsDf(rows: Seq[(Long, String)]) = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text")
  }

  // --- segmentDedup ---

  test("segmentDedup keeps the first (doc, pos) occurrence corpus-wide") {
    val df = docsDf(Seq(
      (1L, "a b c x y z"),      // segs: "a b c", "x y z"
      (2L, "x y z a b c q q q"),// all three already seen or new: "x y z" dup, "a b c" dup, "q q q" new
      (3L, "q q q")))           // dup of doc 2's third segment
    val out = Dedup.segmentDedup(df, t => Dedup.wordWindows(t, 3))
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSeq == Seq(
      (1L, 2, 2, "a b c x y z"),
      (2L, 3, 1, "q q q"),
      (3L, 1, 0, "")))
  }

  test("segmentDedup: within-doc repeats survive only once, order preserved") {
    val df = docsDf(Seq((7L, "p p p m m m p p p z z z")))
    val out = Dedup.segmentDedup(df, t => Dedup.wordWindows(t, 3)).collect()
    assert(out.head.getInt(1) == 4 && out.head.getInt(2) == 3)
    assert(out.head.getString(3) == "p p p m m m z z z")
  }

  test("segmentDedup is invariant to input partitioning") {
    val df = docsDf((0L until 200L).map(i => (i, s"w${i % 13} w${i % 7} w${i % 5} w${i % 3} w${i % 11} w${i % 2}")))
    val a = Dedup.segmentDedup(df, t => Dedup.wordWindows(t, 2)).collect().map(_.toSeq).toSet
    val b = Dedup.segmentDedup(df.repartition(7), t => Dedup.wordWindows(t, 2)).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  // --- packSequences ---

  private def spans(rows: Seq[(Long, Long)], L: Long) = {
    val s = spark; import s.implicits._
    Packing.packSequences(rows.toDF("doc_id", "n"), col("n"), L)
  }

  test("packSequences: every block except the last holds exactly L tokens") {
    val rows = (0L until 50L).map(i => (i, 1L + (i * 17) % 40))
    val out = spans(rows, 64L).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    val perBlock = out.groupBy(_._1).view.mapValues(_.map(s => s._3 - s._2).sum).toMap
    val lastBlock = perBlock.keys.max
    perBlock.foreach { case (b, tot) =>
      if (b != lastBlock) assert(tot == 64L, s"block $b holds $tot")
      else assert(tot > 0 && tot <= 64L, s"last block holds $tot")
    }
    val total = rows.map(_._2).sum
    assert(out.map(s => s._3 - s._2).sum == total)
  }

  test("packSequences: each doc's spans tile [0, n) contiguously in block order") {
    val rows = (0L until 30L).map(i => (i, 5L + (i * 31) % 200))
    val out = spans(rows, 64L).collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    rows.foreach { case (id, n) =>
      val ss = out(id).sortBy(_._2)
      assert(ss.head._3 == 0L && ss.last._4 == n, s"doc $id spans ${ss.toSeq}")
      ss.sliding(2).foreach {
        case Array((_, b1, _, e1), (_, b2, s2, _)) =>
          assert(b2 == b1 + 1 && s2 == e1, s"doc $id gap between blocks $b1,$b2")
        case _ => ()
      }
    }
  }

  test("packSequences drops zero-token docs and is partitioning-invariant") {
    val rows = Seq((1L, 0L), (2L, 10L), (3L, 0L), (4L, 300L), (5L, 64L))
    val a = spans(rows, 64L).collect().map(_.toSeq).toSet
    assert(!a.exists(s => s(1) == 1L || s(1) == 3L))
    val s = spark; import s.implicits._
    val dfBase = rows.toDF("doc_id", "n")
    val b = Packing.packSequences(dfBase.repartition(5), col("n"), 64L).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  // --- capPerGroup ---

  test("capPerGroup equals the single-phase top-N on a skewed corpus") {
    val s = spark; import s.implicits._
    // one hot group with 5000 rows, several cold ones
    val rows = (0L until 5000L).map(i => ("hot", i, (i * 37) % 1000)) ++
      (0L until 40L).map(i => (s"cold${i % 4}", 10000L + i, i))
    val df = rows.toDF("source", "id", "score")
    val got = graft.sample.Sampling
      .capPerGroup(df, col("source"), Seq(col("score").desc, col("id").asc), 25, col("id"), salt = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val expect = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      rs.sortBy { case (_, id, sc) => (-sc, id) }.take(25).zipWithIndex
        .map { case ((src, id, sc), i) => (src, id, sc, i + 1) }
    }.toSet
    assert(got == expect)
    assert(got.count(_._1 == "hot") == 25)
  }

  test("capPerGroup is invariant to salt and partitioning") {
    val s = spark; import s.implicits._
    val rows = (0L until 500L).map(i => (s"g${i % 3}", i, (i * 7) % 50))
    val df = rows.toDF("source", "id", "score")
    def run(d: org.apache.spark.sql.DataFrame, salt: Int) = graft.sample.Sampling
      .capPerGroup(d, col("source"), Seq(col("score").desc, col("id").asc), 10, col("id"), salt)
      .collect().map(_.toSeq).toSet
    assert(run(df, 4) == run(df, 64))
    assert(run(df, 4) == run(df.repartition(11), 4))
  }

  test("packSequences matches a single-stream sequential reference") {
    val rows = (0L until 40L).map(i => (i, 1L + (i * 13) % 100))
    val L = 32L
    val got = spans(rows, L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // reference: sort by (md5(id#42), id), walk the stream sequentially
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long) = md.digest(s"$id#42".getBytes("UTF-8")).map("%02x".format(_)).mkString
    var c = 0L
    val expect = scala.collection.mutable.Set[(Long, Long, Long, Long)]()
    rows.sortBy { case (id, _) => (h(id), id) }.foreach { case (id, n) =>
      var done = 0L
      while (done < n) {
        val block = (c + done) / L
        val take = math.min(n - done, (block + 1) * L - (c + done))
        expect += ((block, id, done, done + take))
        done += take
      }
      c += n
    }
    assert(got == expect)
  }
}
