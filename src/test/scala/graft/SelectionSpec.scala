package graft

import graft.sample.Dsir
import graft.text.{Classifier, Perplexity, UrlOps}
import org.apache.spark.sql.functions._

/** URL canonicalization, hashed-n-gram classifier, and DSIR importance
  * weights (the data-selection surface of the pipeline). */
class SelectionSpec extends SparkSpec {

  private def urls(in: String*): Seq[(String, String, String)] = {
    val s = spark
    import s.implicits._
    val canon = UrlOps.canonicalizeUrl(col("u"))
    val host = UrlOps.hostOf(canon)
    in.toDF("u")
      .select(canon.as("c"), host.as("h"), UrlOps.registeredDomain(host).as("d"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
  }

  test("canonicalizeUrl: table-driven rules") {
    val got = urls(
      "HTTPS://WWW.News.Example.COM:443/Art/9?utm_source=f&utm_campaign=x&id=9#frag",
      "http://a.example.com:80/p/1/",
      "https://news.b.example.co.uk/p/2?id=2&utm_medium=rss",
      "http://www.c.example.com/p/3?utm_x=1&id=3",
      "https://d.example.com/",
      "https://keep.example.com/CaseKept/Path?a=1&b=2",
      "localhost")
    assert(got(0) == (("https://news.example.com/Art/9?id=9", "news.example.com", "example.com")))
    assert(got(1) == (("http://a.example.com/p/1", "a.example.com", "example.com")))
    assert(got(2) == (("https://news.b.example.co.uk/p/2?id=2", "news.b.example.co.uk", "example.co.uk")))
    assert(got(3) == (("http://c.example.com/p/3?id=3", "c.example.com", "example.com")))
    assert(got(4) == (("https://d.example.com", "d.example.com", "example.com")))
    assert(got(5) == (("https://keep.example.com/CaseKept/Path?a=1&b=2", "keep.example.com", "example.com")))
    // schemeless input: passes through (lowered authority prefix is empty),
    // host extraction finds nothing, dot-less host falls back to itself
    assert(got(6)._1 == "localhost" && got(6)._2 == "" && got(6)._3 == "")
  }

  test("canonicalizeUrl: path data is never mistaken for query syntax") {
    val got = urls(
      "https://x.example.com/a&b=1",        // '&' in a path segment (RFC 3986 legal)
      "https://x.example.com/a&utm_b=c/d",  // 'utm_' in the path is path data
      "https://x.example.com/p?next=/",     // '/' ending a query VALUE is data
      "https://x.example.com/p/?utm_x=1")   // trailing path '/' before a dropped query
    assert(got(0)._1 == "https://x.example.com/a&b=1")
    assert(got(1)._1 == "https://x.example.com/a&utm_b=c/d")
    assert(got(2)._1 == "https://x.example.com/p?next=/")
    assert(got(3)._1 == "https://x.example.com/p")
  }

  test("classifier score is deterministic, bounded, and 0.5 on empty text") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "spark spark spark spark"), (3L, "")).toDF("doc_id", "text")
    val a = Classifier.hashedNgramScore(df).select("doc_id", "n_grams", "clf_score")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq.sortBy(_._1)
    val b = Classifier.hashedNgramScore(df.repartition(3)).select("doc_id", "n_grams", "clf_score")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq.sortBy(_._1)
    assert(a == b) // partitioning-independent
    assert(a.forall { case (_, _, sc) => sc >= 0.0 && sc <= 1.0 })
    assert(a.find(_._1 == 1L).get._2 == 9 + 8) // 9 unigrams + 8 bigrams
    assert(a.find(_._1 == 3L).get == ((3L, 0, 0.5)))
  }

  test("temperatureMix: alpha=1 is the natural mix, alpha=0 the uniform one") {
    val s = spark
    import s.implicits._
    // 3 sources with very different sizes: 300 / 60 / 12 docs
    val df = ((1L to 300L).map(i => (i, "big"))
      ++ (301L to 360L).map(i => (i, "mid"))
      ++ (361L to 372L).map(i => (i, "small"))).toDF("doc_id", "source")
    def rates(alpha: Double, budget: Long): Map[String, Double] =
      graft.sample.Sampling.temperatureMix(df, "doc_id", "source", alpha, budget)
        .select("source", "accept_frac").distinct()
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // alpha=1: every source keeps the same fraction budget/total
    val nat = rates(1.0, 186L)
    assert(nat.values.toSet.size == 1 && math.abs(nat("big") - 0.5) < 1e-6, nat.toString)
    // alpha=0: equal per-source budgets -> small sources saturate at 1.0,
    // big ones keep budget/(k*n_s)
    val uni = rates(0.0, 36L)
    assert(uni("small") == 1.0 && math.abs(uni("big") - 12.0 / 300.0) < 1e-6, uni.toString)
    // 0 < alpha < 1 interpolates: big's rate below natural, small's above
    val mid = rates(0.7, 186L)
    assert(mid("big") < nat("big") && mid("small") > nat("small"), mid.toString)
    // membership is partitioning-independent
    val a = graft.sample.Sampling.temperatureMix(df, "doc_id", "source", 0.7, 186L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = graft.sample.Sampling.temperatureMix(df.repartition(7), "doc_id", "source", 0.7, 186L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("temperatureMix: a NULL source is its own stratum, not silently dropped") {
    val s = spark
    import s.implicits._
    val df = ((1L to 100L).map(i => (i, "a"))
      ++ (101L to 200L).map(i => (i, null.asInstanceOf[String]))).toDF("doc_id", "source")
    // alpha=1, budget=100: every stratum keeps exactly half
    val kept = graft.sample.Sampling.temperatureMix(df, "doc_id", "source", 1.0, 100L)
    val bySource = kept.groupBy("source").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(bySource.contains(None), s"null stratum dropped: $bySource")
    val rate = kept.select("accept_frac").distinct().collect().map(_.getDouble(0)).toSet
    assert(rate == Set(0.5), rate.toString)
  }

  test("DSIR fails loudly on a gram-less target corpus") {
    val s = spark
    import s.implicits._
    val raw = (1L to 10L).map(i => (i, "alpha beta")).toDF("doc_id", "text")
    val emptyTarget = raw.filter(col("doc_id") < 0)
    val e = intercept[Exception] {
      Dsir.importanceWeights(raw, emptyTarget).collect()
    }
    assert(e.getMessage != null && e.toString.contains("no grams")
      || Option(e.getCause).exists(_.toString.contains("no grams")), e.toString)
  }

  test("classifier handles NULL text like the oracle: n_grams 0, score 0.5") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "some words here")).toDF("doc_id", "text")
    val r = Classifier.hashedNgramScore(df).select("doc_id", "n_grams", "clf_score")
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getDouble(2))).sortBy(_._1)
    assert(r(0) == ((1L, 0, 0.5)), r(0).toString)
    assert(r(1)._2 == 5) // 3 unigrams + 2 bigrams
  }

  test("LM perplexity: in-model text scores far lower than unseen text") {
    val s = spark
    import s.implicits._
    val train = (1L to 50L).map(i => (i, "the cat sat on the mat")).toDF("doc_id", "text")
    val docs = Seq(
      (100L, "the cat sat on the mat"),       // every bigram in-model
      (101L, "zqx wvu ytr plk mno bcd"),      // every context unseen -> ~uniform
      (102L, "x"),                            // one token: no bigram
      (103L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val r = Perplexity.perplexity(docs, train).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), Option(x.get(2)).map(_.asInstanceOf[Double])))
      .toMap
    val (nIn, pplIn) = r(100L)
    val (nOut, pplOut) = r(101L)
    assert(nIn == 5 && nOut == 5, r.toString)
    // seen bigrams: p = (c+1)/(c_ctx + 65536) stays small in absolute terms
    // at this corpus size, but must beat the unseen-context uniform 1/65536
    // by a wide margin
    assert(pplIn.get < pplOut.get / 10, s"in=$pplIn out=$pplOut")
    assert(math.abs(pplOut.get - 65537.0) < 100.0, s"unseen should be ~uniform: $pplOut")
    assert(r(102L) == ((0L, None)) && r(103L) == ((0L, None)), r.toString)
  }

  test("LM perplexity is partitioning-invariant (integer-grid quantization)") {
    val s = spark
    import s.implicits._
    val df = (1L to 200L)
      .map(i => (i, s"w${i % 7} w${i % 5} w${i % 3} w${i % 7} w${i % 5}"))
      .toDF("doc_id", "text")
    val train = df.filter(col("doc_id") % 4 === 0)
    def run(parts: Int) =
      Perplexity.perplexity(df.repartition(parts), train.repartition(parts))
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).sortBy(_._1).toSeq
    assert(run(1) == run(13))
  }

  test("DSIR and mixing plans broadcast their model-state tables (no cartesian)") {
    val dsir = GraftQueries.qDsirWeights(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!dsir.contains("CartesianProduct"), dsir)
    assert(dsir.contains("BroadcastHashJoin"), dsir) // the ≤8192-row ratio table
    val mix = GraftQueries.qTemperatureMix(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!mix.contains("CartesianProduct"), mix)
    assert(mix.contains("BroadcastHashJoin"), mix) // the per-source rate table
  }

  test("DSIR: identical target and raw distributions give log_weight 0 exactly") {
    val s = spark
    import s.implicits._
    val df = (1L to 40L).map(i => (i, s"alpha beta gamma delta w$i")).toDF("doc_id", "text")
    val w = Dsir.importanceWeights(df, df)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(w.length == 40)
    assert(w.forall(_._3 == 0.0), w.filter(_._3 != 0.0).mkString(","))
  }

  test("DSIR: target-like docs outweigh off-target docs") {
    val s = spark
    import s.implicits._
    val raw = ((1L to 20L).map(i => (i, "alpha beta gamma delta epsilon"))
      ++ (21L to 40L).map(i => (i, "zeta eta theta iota kappa"))).toDF("doc_id", "text")
    val target = (1L to 10L).map(i => (100L + i, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    // small bucket count so the counts dominate the add-one smoothing
    // (at the default 8192 a 40-doc corpus shrinks toward uniform and
    // only the RANKING is meaningful)
    val w = Dsir.importanceWeights(raw, target, buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(1L) > w(21L), s"on-target ${w(1L)} should beat off-target ${w(21L)}")
    assert(w(1L) > 0 && w(21L) < 0, s"${w(1L)} / ${w(21L)}")
  }
  test("urlFilter: host blocklist is hard, word weights sum, rounded-threshold keep") {
    val s = spark
    import s.implicits._
    import graft.text.UrlOps
    val df = Seq(
      (1L, "https://ok.example.com/a"),
      (2L, "https://ok.example.com/a?ref=CASINO-poker"), // 0.5 + 0.4
      (3L, "https://bad.example.com/clean"),             // blocked host
      (4L, "https://ok.example.com/free-movies-download")) // 0.3 + 0.2 = exactly 0.5
      .toDF("id", "url")
      .select(col("id"), col("url"),
        UrlOps.urlFilter(col("url"), UrlOps.hostOf(col("url")),
          Seq("bad.example.com"), Seq("casino" -> 0.5, "poker" -> 0.4,
            "free-movies" -> 0.3, "download" -> 0.2), 0.5).as("f"))
      .select(col("id"), col("f.*"))
    val r = df.collect().map(x =>
      x.getLong(0) -> ((x.getBoolean(1), x.getDouble(2), x.getBoolean(3)))).toMap
    assert(r(1L) == ((false, 0.0, true)), r.toString)
    assert(r(2L) == ((false, 0.9, false)), r.toString)
    assert(r(3L) == ((true, 0.0, false)), r.toString)
    assert(r(4L) == ((false, 0.5, false)), r.toString) // at-threshold is filtered
  }
  test("trainLogistic separates labeled vocab: positive-gram weights rise, negative fall") {
    val s = spark
    import s.implicits._
    import graft.text.Classifier
    val docs = (1L to 40L).map { i =>
      if (i % 2 == 0) (i, "good clean prose here") else (i, "spammy junk casino text")
    }.toDF("doc_id", "text")
    val w = Classifier.trainLogistic(docs, col("text").contains("good"),
      steps = 5, lr = 0.5).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def bucket(g: String): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md5.take(8), 16) % 4096
    }
    assert(w(bucket("good")) > 0.01, w(bucket("good")).toString)
    assert(w(bucket("casino")) < -0.01, w(bucket("casino")).toString)
    // weights live exactly on the 1e-6 grid
    w.values.foreach(v => assert(math.abs(v * 1e6 - math.rint(v * 1e6)) < 1e-9, v.toString))
  }
}
