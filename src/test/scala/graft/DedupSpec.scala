package graft

import graft.ann.Ann
import graft.dedup.Dedup
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  def docsDf = {
    val s = spark
    import s.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (1L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 0
      (2L, "completely different content about spark catalyst optimizer internals and shuffles"),
      (3L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 0
      (4L, "tiny doc"),
      (5L, "another unrelated document mentioning gorilla compression and delta of delta timestamps"))
      .toDF("doc_id", "text")
  }

  test("exact dedup groups identical texts") {
    val out = Dedup.exact(docsDf).collect()
    val dupGroup = out.filter(_.getLong(2) == 2)
    assert(dupGroup.length == 1 && dupGroup.head.getLong(1) == 0L)
    assert(out.map(_.getLong(2)).sum == 6)
  }

  test("minhash LSH surfaces the near-duplicate pair and jaccard ranks it high") {
    val pairs = Dedup.minhashCandidates(docsDf).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 3L)), s"exact dup must share all bands: $pairs")
    assert(pairs.contains((0L, 1L)) || pairs.contains((1L, 3L)),
      s"near-dup should share >=1 band: $pairs")
    val jac = Dedup.ngramJaccard(docsDf, Dedup.minhashCandidates(docsDf))
      .collect().map(r => ((r.getLong(1), r.getLong(0)), r.getDouble(2))).toMap
    jac.get((0L, 3L)).foreach(j => assert(j == 1.0))
  }

  test("simhash: identical texts equal, near-dups close, different texts far") {
    val fp = docsDf.select(col("doc_id"), Dedup.simhash(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(0L) == fp(3L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(fp(a) ^ fp(b))
    assert(ham(0L, 1L) < ham(0L, 2L), s"near ${ham(0L, 1L)} vs far ${ham(0L, 2L)}")
  }

  test("IVF ANN reaches high recall vs brute force on clustered data") {
    val s = spark
    import s.implicits._
    // 8 clusters of 30 vectors each, dim 16: cluster centers are unit axes
    val vecs = (0 until 240).map { i =>
      val c = i % 8
      val arr = Array.tabulate(16)(d =>
        (if (d == c * 2) 1.0 else 0.0) + 0.05 * math.sin(i * 13 + d))
      (i.toLong, arr)
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 8)
    val exact = Ann.bruteForceTopK(vecs, queries, 10)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val centroids = vecs.filter(col("vec_id") < 8 * 8 && col("vec_id") % 8 === 0)
    val assigned = Ann.ivfAssign(vecs, centroids)
    val approx = Ann.ivfTopK(assigned, centroids, queries, 10, 3)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF recall $recall")
  }

  test("embedding near-dup buckets find planted duplicates") {
    val s = spark
    import s.implicits._
    val base = Array.tabulate(16)(d => math.cos(d * 0.7))
    val vecs = Seq(
      (0L, base), (1L, base.map(_ * 1.001)), // near-dup pair
      (2L, Array.tabulate(16)(d => math.sin(d * 1.3 + 1))))
      .toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDup(vecs, threshold = 0.99)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), s"$pairs")
  }

  test("SRP-LSH near-dup recall >= 0.9 vs brute force; no cartesian in the plan") {
    val s = spark
    import s.implicits._
    // 40 base directions, each with a jittered near-dup partner; plus noise
    // vectors far from everything — ground truth is the brute-force pair set
    val dim = 16
    val vecs = (0 until 40).flatMap { i =>
      val base = Array.tabulate(dim)(d => math.cos(d * 0.37 + i * 1.7))
      Seq(
        (2L * i, base),
        (2L * i + 1, base.zipWithIndex.map { case (x, d) => x + 0.02 * math.sin(i * 7 + d) }))
    }.toDF("vec_id", "embedding")
    val exact = vecs.select(col("vec_id").as("a"), col("embedding").as("va"))
      .crossJoin(vecs.select(col("vec_id").as("b"), col("embedding").as("vb")))
      .filter(col("a") < col("b"))
      .filter(graft.ann.Ann.cosine(col("va"), col("vb")) >= 0.95)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val srpDf = Dedup.embeddingNearDupSRP(vecs, dim = dim, threshold = 0.95)
    val srp = srpDf.select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "degenerate fixture: no true near-dup pairs")
    val recall = (exact & srp).size.toDouble / exact.size
    assert(recall >= 0.9, s"SRP recall $recall (found ${srp.size} of ${exact.size})")
    // precision is exact by construction: every emitted pair passed true cosine
    assert(srp.subsetOf(exact), s"pairs below threshold emitted: ${srp -- exact}")
    val plan = srpDf.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in SRP join:\n$plan")
  }

  test("multimodal decode plumbing: real BMP/WAV headers, determinism, frames") {
    val s = spark
    import s.implicits._
    val media = Multimodal.mediaFromDocs(docsDf).as[Multimodal.MediaRow]
    val dec = Multimodal.decodeAll(media).collect()
    assert(dec.length == 6)
    assert(dec.forall(_.features.length == 8))
    // dims/frames come from the actual container headers for all three
    // modalities (BMP / WAV / AVI)
    dec.foreach { d =>
      d.modality match {
        case "image" =>
          assert(d.width == 4 + (d.doc_id % 13).toInt && d.height == 3 + (d.doc_id % 7).toInt, d.toString)
        case "audio" =>
          assert(d.width >= 8000 && d.height == 8 && d.n_frames >= 16, d.toString)
        case _ =>
          assert(d.width == 4 + (d.doc_id % 11).toInt && d.height == 3 + (d.doc_id % 5).toInt &&
            d.n_frames == 1 + (d.doc_id % 6).toInt, d.toString)
      }
    }
    val frames = Multimodal.sampleFrames(media)
    assert(frames.columns.toSeq == Seq("doc_id", "frame_idx", "frame_bytes"))
    assert(frames.count() >= 1)
    val resized = Multimodal.resizeImages(media, 32, 24).collect()
    assert(resized.nonEmpty)
    assert(resized.forall(r => r.getAs[Array[Byte]]("pixels").length == 32 * 24))
    // deterministic: same input, same pixels
    val again = Multimodal.resizeImages(media, 32, 24).collect()
    assert(resized.map(_.getAs[Array[Byte]]("pixels").toSeq).toSeq ==
      again.map(_.getAs[Array[Byte]]("pixels").toSeq).toSeq)
  }

  test("exactSubstrDedup cuts later occurrences of shared spans, keeps the first") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "a b c d e f g h"),
      (2L, "x y a b c d e f q"), // shares the 6-token run "a b c d e f" with doc 1
      (3L, "short one"), // under L: no windows
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val r = Dedup.exactSubstrDedup(df, L = 5).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3), x.getString(4))))
      .toMap
    assert(r(1L) == ((8L, 0L, 0L, "a b c d e f g h")), r(1L)) // first occurrence untouched
    // doc 2: windows at pos 2 ("a b c d e") and pos 3 ("b c d e f") are
    // non-first -> extents [2,7) and [3,8) union to tokens 2..7 cut
    assert(r(2L) == ((9L, 2L, 6L, "x y q")), r(2L))
    assert(r(3L) == ((2L, 0L, 0L, "short one")), r(3L))
    assert(r(4L) == ((0L, 0L, 0L, "")), r(4L))
  }

  test("exactSubstrDedup removes a within-doc repeat, keeping the first occurrence") {
    val s = spark
    import s.implicits._
    val df = Seq((7L, "p q r s t p q r s t")).toDF("doc_id", "text")
    val r = Dedup.exactSubstrDedup(df, L = 5).head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))
      == ((10L, 1L, 5L, "p q r s t")), r.toString)
  }

  // --- SemDeDup (semantic dedup over embedding clusters) ---

  def semCorpus = {
    val s = spark
    import s.implicits._
    Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)),   // cell 0, csim 1.0
      (1L, Seq(0.9, 0.1, 0.0, 0.0)),   // cell 0, lowest csim of the cell
      (2L, Seq(0.95, 0.05, 0.0, 0.0)), // cell 0
      (3L, Seq(0.0, 1.0, 0.0, 0.0)),   // cell 1, csim 1.0
      (4L, Seq(0.1, 0.9, 0.0, 0.0)),   // cell 1, ties with 5
      (5L, Seq(0.1, 0.9, 0.0, 0.0)))   // cell 1, identical to 4
      .toDF("vec_id", "embedding")
  }

  def semCentroids = {
    val s = spark
    import s.implicits._
    Seq((0L, Seq(1.0, 0.0, 0.0, 0.0)), (1L, Seq(0.0, 1.0, 0.0, 0.0)))
      .toDF("vec_id", "embedding")
  }

  test("semanticDedup keeps the lowest-centroid-cosine member of each eps-group, id tiebreak") {
    val out = Dedup.semanticDedup(semCorpus, semCentroids, eps = 0.9)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(3)))).toMap
    // cell assignment: 0/1/2 -> cell 0; 3/4/5 -> cell 1
    assert(out.filter(_._2._1 == 0L).keySet == Set(0L, 1L, 2L), out.toString)
    assert(out.filter(_._2._1 == 1L).keySet == Set(3L, 4L, 5L), out.toString)
    // cell 0: all pairwise cos >= 0.9; vec 1 has the lowest csim -> survives
    assert(out(1L)._2 == 1 && out(0L)._2 == 0 && out(2L)._2 == 0, out.toString)
    // cell 1: 4 and 5 tie on csim (identical) -> lower id 4 survives; 3 has
    // csim 1.0 and is eps-similar to both -> dropped
    assert(out(4L)._2 == 1 && out(5L)._2 == 0 && out(3L)._2 == 0, out.toString)
  }

  test("semanticDedup: an oversized cell is excluded from pairing (all kept) and audited") {
    val out = Dedup.semanticDedup(semCorpus, semCentroids, eps = 0.9, maxCell = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(out.values.forall(_ == 1), out.toString) // both cells hold 3 > maxCell
    // the audit runs on the dedup OUTPUT itself — no second assignment pass
    val audited = Dedup.semdedupOversizedCells(
      Dedup.semanticDedup(semCorpus, semCentroids, eps = 0.9, maxCell = 2),
      maxCell = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(audited == Set((0L, 3L), (1L, 3L)), audited.toString)
  }

  test("semanticDedup: eps above every pairwise cosine keeps everything") {
    val out = Dedup.semanticDedup(semCorpus, semCentroids, eps = 1.1)
      .collect().map(_.getInt(3))
    assert(out.length == 6 && out.forall(_ == 1))
  }
}
