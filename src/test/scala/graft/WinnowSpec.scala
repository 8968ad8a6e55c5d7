package graft

import graft.dedup.Winnow
import org.apache.spark.sql.functions._

/** Winnowing fingerprints (Schleimer et al. 2003): the selection rule
  * against a sequential reference, the detection guarantee, and the
  * near-dup pair report. */
class WinnowSpec extends SparkSpec {

  /** Sequential reference: same 40-bit md5 gram hashes, same
    * (hash, pos) pack, per-window min, distinct. */
  private def refFps(text: String, k: Int, w: Int): Set[(Long, Long)] = {
    val n = text.length - k + 1
    if (n < 1) return Set.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val packed = (1 to n).map { i =>
      val hex = md.digest(text.substring(i - 1, i - 1 + k).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(10)
      java.lang.Long.parseLong(hex, 16) * 1048576L + i
    }
    (1 to math.max(n - w + 1, 1)).map { j =>
      packed.slice(j - 1, math.min(j - 1 + w, n)).min
    }.toSet.map((p: Long) => (p % 1048576L, p / 1048576L))
  }

  test("fingerprints match the sequential winnowing reference") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(20260820)
    val docs = (1L to 20L).map { id =>
      val len = 5 + rnd.nextInt(300)
      (id, (1 to len).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString)
    }
    val out = Winnow.fingerprints(docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).map { case (id, xs) => id -> xs.map(_._2).toSet }
    docs.foreach { case (id, text) =>
      val exp = refFps(text, 8, 16)
      assert(out.getOrElse(id, Set.empty) == exp, s"doc $id")
    }
    // short and null docs emit nothing
    val edge = Seq((1L, "abc"), (2L, null)).toDF("doc_id", "text")
    assert(Winnow.fingerprints(edge).count() == 0)
  }

  test("detection guarantee: a shared substring of w+k-1 chars shares a fingerprint") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    def randStr(n: Int) =
      (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    // w + k - 1 = 23 shared chars embedded at different offsets in
    // otherwise-random docs: winnowing MUST select at least one common
    // fingerprint (the windows fully inside the match pick the same min)
    val shared = randStr(23)
    val docs = Seq(
      (1L, randStr(40) + shared + randStr(37)),
      (2L, randStr(11) + shared + randStr(66))).toDF("doc_id", "text")
    val fps = Winnow.fingerprints(docs)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val a = fps.filter(_._1 == 1L).map(_._2).toSet
    val b = fps.filter(_._1 == 2L).map(_._2).toSet
    assert((a & b).nonEmpty, "guaranteed shared fingerprint missing")
  }

  test("nearDupPairs: duplicate docs pair with jaccard 1; boilerplate df cap holds") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(99)
    val base = (1 to 120).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val other = (1 to 120).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val docs = Seq((1L, base), (2L, base), (3L, other)).toDF("doc_id", "text")
    val out = Winnow.nearDupPairs(docs)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(5)))).toMap
    assert(out.contains((1L, 2L)) && out((1L, 2L))._2 == 1.0)
    assert(!out.contains((1L, 3L)) && !out.contains((2L, 3L)))
    // a fingerprint in > maxDf docs must not generate pairs: 4 copies
    // with maxDf = 3 -> every pair drops below minShared
    val many = (1L to 4L).map(id => (id, base)).toDF("doc_id", "text")
    assert(Winnow.nearDupPairs(many, maxDf = 3).count() == 0)
  }
}
