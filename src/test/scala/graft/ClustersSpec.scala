package graft

import graft.dedup.Clusters
import graft.sample.Sampling
import org.apache.spark.sql.functions._

class ClustersSpec extends SparkSpec {

  private def pairsDF(ps: Seq[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    ps.toDF("a", "b")
  }

  private def ccMap(ps: Seq[(Long, Long)], maxIter: Int = 30): Map[Long, Long] =
    Clusters.connectedComponents(pairsDF(ps), maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain, star, and separate components resolve to min-id labels") {
    // chain 1-2-3-4-5, star 10-{11,12,13}, isolated edge 20-21
    val cc = ccMap(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (10L, 12L), (10L, 13L), (20L, 21L)))
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 20L -> 20L, 21L -> 20L), cc.toString)
  }

  test("pointer jumping handles a 64-node chain in few rounds (O(log n), not O(n))") {
    // plain neighbor propagation would need ~64 rounds; pointer jumping
    // must land well under the 12-round budget
    val chain = (0L until 63L).map(i => (i, i + 1))
    val cc = ccMap(chain, maxIter = 12)
    assert(cc.size == 64 && cc.values.forall(_ == 0L), cc.toString)
  }

  test("maxIter guard fails loudly instead of looping") {
    val chain = (0L until 63L).map(i => (i, i + 1))
    val e = intercept[IllegalStateException](ccMap(chain, maxIter = 1))
    assert(e.getMessage.contains("not converged"))
  }

  test("empty pair graph yields an empty cluster frame, not an error") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    val cc = Clusters.connectedComponents(empty)
    assert(cc.columns.toSeq == Seq("node", "cluster"))
    assert(cc.count() == 0)
  }

  test("reversed/duplicate/self-referencing pairs do not disturb labels") {
    val cc = ccMap(Seq((2L, 1L), (1L, 2L), (2L, 3L), (3L, 3L)))
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L), cc.toString)
  }

  test("survivors keep max score with min-id tiebreak and report sizes") {
    val s = spark
    import s.implicits._
    val members = Seq(
      (1L, 1L, 100L), (2L, 1L, 300L), (3L, 1L, 300L), // tie at 300 -> node 2
      (9L, 9L, 5L))
      .toDF("node", "cluster", "n_chars")
    val sv = Clusters.survivors(members, "n_chars")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(sv == Seq((1L, 2L, 3L), (9L, 9L, 1L)), sv.toString)
  }

  test("deterministic sampling is partitioning-invariant and hits the fraction") {
    val s = spark
    import s.implicits._
    val df = (0L until 4000L).toDF("id")
    val kept1 = Sampling.deterministicSample(df, "id", 0.25)
      .collect().map(_.getLong(0)).toSet
    val kept2 = Sampling.deterministicSample(df.repartition(17), "id", 0.25)
      .collect().map(_.getLong(0)).toSet
    assert(kept1 == kept2)
    assert(math.abs(kept1.size / 4000.0 - 0.25) < 0.03, kept1.size.toString)
    // monotone thresholds: the 0.25 sample is a subset of the 0.5 sample
    val wider = Sampling.deterministicSample(df, "id", 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(kept1.subsetOf(wider))
  }

  test("stratified fractions apply per stratum with the default fallback") {
    val s = spark
    import s.implicits._
    val df = (0L until 3000L).map(i => (i, Seq("en", "de", "xx")((i % 3).toInt)))
      .toDF("id", "lang")
    val kept = Sampling.stratifiedSample(df, "id", "lang",
      Map("en" -> 0.5, "de" -> 1.0), defaultFraction = 0.0)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("de") == 1000L, kept.toString)           // fraction 1.0 keeps all
    assert(!kept.contains("xx"), kept.toString)          // default 0.0 drops all
    assert(math.abs(kept("en") / 1000.0 - 0.5) < 0.06, kept.toString)
  }
}
