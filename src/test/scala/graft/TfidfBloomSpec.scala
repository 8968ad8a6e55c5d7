package graft

import graft.dedup.Dedup
import graft.text.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TF-IDF keyword extraction and the Bloom-prefiltered decontamination
  * path (which must be EXACTLY equal to the broadcast-exact path — the
  * filter is a shuffle-volume knob, never a semantics knob).
  */
class TfidfBloomSpec extends SparkSpec {

  private def docsDf(rows: Seq[(Long, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("tf-idf: broadcastVocab=false drops the vocab broadcast, results equal") {
    val d = docsDf(Seq((1L, "a a b x"), (2L, "a c y"), (3L, "b c c d z")))
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      def planOf(b: Boolean): String =
        TextOps.tfIdfTopK(d, k = 3, broadcastVocab = b)
          .queryExecution.executedPlan.toString
      // the 1-row N crossJoin broadcast appears in BOTH plans; the flag
      // controls whether the vocabulary join adds one more
      val re = "BroadcastExchange".r
      assert(re.findAllIn(planOf(true)).size -
        re.findAllIn(planOf(false)).size >= 1,
        "flag=false must drop the vocab-side broadcast")
      def rows(b: Boolean) = TextOps.tfIdfTopK(d, k = 3, broadcastVocab = b)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getDouble(3))).toSet
      val shuffled = rows(false)
      assert(shuffled == rows(true) && shuffled.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("tf-idf: scores match the smoothed formula, ranked desc") {
    val d = docsDf(Seq((1L, "a a b"), (2L, "a c"), (3L, "b c c d")))
    val out = TextOps.tfIdfTopK(d, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getDouble(3)))
      .toSeq
      .sortBy(x => (x._1, x._3))
    def idf(df: Int): Double = math.log(4.0 / (1 + df)) + 1.0
    def sc(tf: Int, df: Int): Double =
      BigDecimal(tf * idf(df)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 1: a(tf2,df2) > b(tf1,df2); doc 3: c(tf2,df2) > d(tf1,df1) > b(tf1,df2)
    assert(out.filter(_._1 == 1L).map(x => (x._2, x._4)) ==
      Seq(("a", sc(2, 2)), ("b", sc(1, 2))))
    assert(out.filter(_._1 == 3L).map(x => (x._2, x._4)) ==
      Seq(("c", sc(2, 2)), ("d", sc(1, 1)), ("b", sc(1, 2))))
  }

  test("tf-idf: equal scores tie-break by term asc; k caps the output") {
    // doc 1 has four terms with identical tf and df -> identical scores
    val d = docsDf(Seq((1L, "w x y z"), (2L, "w x y z")))
    val out = TextOps.tfIdfTopK(d, k = 3)
      .filter(col("doc_id") === 1L)
      .orderBy(col("term_rank"))
      .collect()
      .map(_.getString(1))
      .toSeq
    assert(out == Seq("w", "x", "y"))
  }

  test("bloom-prefiltered decontamination == exact contamination, any fpp") {
    val rnd = new scala.util.Random(4102)
    val vocab = (1 to 40).map(i => s"tok$i")
    val rows = (1L to 120L).map { id =>
      val words = (1 to rnd.nextInt(20) + 3).map(_ => vocab(rnd.nextInt(vocab.size)))
      (id, words.mkString(" "))
    }
    val d = docsDf(rows)
    val corpus = d.filter(col("doc_id") % 7 =!= 0)
    val bench = d.filter(col("doc_id") % 7 === 0)
    def canon(df: DataFrame) = df
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
      .toSeq
      .sortBy(_._1)
    val exact = canon(Dedup.contamination(corpus, bench))
    assert(exact.exists(_._5), "fixture should contain contaminated docs")
    assert(exact.exists(!_._5), "fixture should contain clean docs")
    // a 50% fpp filter floods the verify join with false positives; the
    // inner exact join must still kill every one of them
    for (fpp <- Seq(0.01, 0.5)) {
      val bloomed = canon(Dedup.contaminationBloom(corpus, bench, fpp = fpp))
      assert(bloomed == exact, s"fpp $fpp diverged from the exact path")
    }
    val broadcastVerify =
      canon(Dedup.contaminationBloom(corpus, bench, verifyBroadcast = true))
    assert(broadcastVerify == exact)
  }

  test("bloom path: doc with zero benchmark overlap reports 0 / false") {
    val corpus = docsDf(Seq((1L, "aa bb cc dd ee"), (2L, "pp qq rr ss tt")))
    val bench = docsDf(Seq((9L, "pp qq rr ss")))
    val out = Dedup.contaminationBloom(corpus, bench)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getBoolean(4)))
      .sortBy(_._1)
      .toSeq
    assert(out(0) == ((1L, 0L, false)))
    assert(out(1)._1 == 2L && out(1)._2 >= 1L && out(1)._3)
  }
}
