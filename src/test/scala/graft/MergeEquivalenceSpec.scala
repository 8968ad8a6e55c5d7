package graft

import graft.merge.MergeOps
import org.apache.spark.sql.functions._

/** Randomized equivalence against the reference: 30 seeded trials of
  * merge(strict_sum | ignorant_sum) over 2-4 series with random times,
  * values (incl. None) and defaults, run through the ACTUAL reference
  * implementation by tools/gen_goldens.py (mirrors
  * tests/test_iterators.py:102-116's merge ≡ iter_merge property). */
class MergeEquivalenceSpec extends SparkSpec {

  test("mergeSum matches the reference on 30 random strict/ignorant trials") {
    val s = spark
    import s.implicits._
    Goldens.mergeTrials.zipWithIndex.foreach { case (trial, i) =>
      val df = trial.input
        .map { case (sid, t, v, _) =>
          ("g", sid.toString, t.toDouble, v.map(Double.box).orNull.asInstanceOf[java.lang.Double])
        }
        .toDF("key", "sid", "t", "v")
        .withColumn("v", col("v").cast("double"))
      val defaults = trial.input
        .map { case (sid, _, _, d) => (sid.toString, d.map(Double.box).orNull.asInstanceOf[java.lang.Double]) }
        .distinct
        .toDF("sid", "default")
        .withColumn("default", col("default").cast("double"))
      val got = collectTV(MergeOps.mergeSum(df, trial.strict, Some(defaults)))
      approxEq(got, trial.expected.map { case (t, v) => (t, v) })
    }
  }

  private def trialDf(input: Seq[(Int, Int, Option[Double], Option[Double])]) = {
    val s = spark
    import s.implicits._
    input
      .map { case (sid, t, v, _) =>
        ("g", sid.toString, t.toDouble, v.map(Double.box).orNull.asInstanceOf[java.lang.Double])
      }
      .toDF("key", "sid", "t", "v")
      .withColumn("v", col("v").cast("double"))
  }

  test("mergeOp(max/min/mean) matches the reference on 18 random trials") {
    val ops: Map[String, org.apache.spark.sql.Column => org.apache.spark.sql.Column] = Map(
      "max" -> MergeOps.ignorantMaxOf, "min" -> MergeOps.ignorantMinOf,
      "mean" -> MergeOps.ignorantMeanOf)
    Goldens.mergeOpTrials.foreach { trial =>
      val df = trialDf(trial.input)
      val sids = (0 until trial.k).map(_.toString)
      val defaults = trial.input
        .map { case (sid, _, _, d) => sid.toString -> lit(d.get) }.toMap
      val got = collectTV(MergeOps.mergeOp(df, sids, ops(trial.op), defaults))
      approxEq(got, trial.expected)
    }
  }

  test("mergeOp(ignorant/strict sum) ≡ mergeSum delta form (plain + bucketed)") {
    val s = spark
    import s.implicits._
    Goldens.mergeTrials.take(10).foreach { trial =>
      val df = trialDf(trial.input).persist()
      val sids = trial.input.map(_._1).distinct.sorted.map(_.toString)
      val defMap = trial.input
        .map { case (sid, _, _, d) =>
          sid.toString -> d.map(x => lit(x)).getOrElse(lit(null).cast("double"))
        }.toMap
      val f = if (trial.strict) MergeOps.strictSumOf _ else MergeOps.ignorantSumOf _
      val viaOp = collectTV(MergeOps.mergeOp(df, sids, f, defMap))
      val viaOpBucketed = collectTV(
        MergeOps.mergeOp(df, sids, f, defMap, Some(floor(col("t") / 7).cast("long"))))
      approxEq(viaOp, trial.expected)
      approxEq(viaOpBucketed, trial.expected)
      df.unpersist()
    }
  }

  test("dynamic-K mergeOpDynamic/iterMergeEntries match the pivot form on random trials") {
    Goldens.mergeTrials.take(10).foreach { trial =>
      val s = spark
      import s.implicits._
      val df = trialDf(trial.input).persist()
      val defaults = trial.input
        .map { case (sid, _, _, d) => (sid.toString, d.map(Double.box).orNull.asInstanceOf[java.lang.Double]) }
        .distinct
        .toDF("sid", "default")
        .withColumn("default", col("default").cast("double"))
      val f: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        st => if (trial.strict) MergeOps.strictSumOf(map_values(st)) else MergeOps.ignorantSumOf(map_values(st))
      val plain = collectTV(MergeOps.mergeOpDynamic(df, f, Some(defaults)))
      val bucketed = collectTV(
        MergeOps.mergeOpDynamic(df, f, Some(defaults), Some(floor(col("t") / 7).cast("long"))))
      approxEq(plain, trial.expected)
      approxEq(bucketed, trial.expected)
      // the exploded entry stream agrees with the bounded-K pivot
      val sids = trial.input.map(_._1).distinct.sorted.map(_.toString)
      val defMap = trial.input.map { case (sid, _, _, d) =>
        sid.toString -> d.map(x => lit(x)).getOrElse(lit(null).cast("double"))
      }.toMap
      val viaPivot = MergeOps.iterMerge(df, sids, defMap)
        .select(col("t"), posexplode(col("vs")).as(Seq("slot", "v")))
        .collect().map(r => (r.getDouble(0), r.getInt(1), Option(r.get(2)))).toSet
      val slotOf = sids.zipWithIndex.toMap
      val viaEntries = MergeOps.iterMergeEntries(df, Some(defaults))
        .collect().map(r => (r.getDouble(2), slotOf(r.getString(1)), Option(r.get(3)))).toSet
      assert(viaEntries == viaPivot)
      df.unpersist()
    }
  }

  test("dynamic-K merge at K=10,000 sids ≡ mergeSum, no driver-side sid collect") {
    val s = spark
    import s.implicits._
    // 10,000 series sharing 6 distinct times (the grid is |times| x K —
    // coinciding times keep the test bounded while K exceeds the
    // reference's own K=1,000 benchmark, merge_strategies.rst:292-301)
    val df = spark.range(10000)
      .select(
        lit("g").as("key"),
        concat(lit("s"), format_string("%05d", col("id"))).as("sid"),
        (col("id") % 6).cast("double").as("t"),
        (col("id") % 13).cast("double").as("v"))
    val bucket = Some(floor(col("t") / 2).cast("long"))
    val viaDynamic = collectTV(
      MergeOps.mergeOpDynamic(df, st => MergeOps.ignorantSumOf(map_values(st)), None, bucket))
    val viaDelta = collectTV(MergeOps.mergeSum(df, strict = false, None, bucket))
    approxEq(viaDynamic, viaDelta)
    assert(viaDynamic.nonEmpty)
  }

  test("mergeAggDynamic(max) ≡ pivot mergeOp(max) incl. nulls across buckets") {
    Goldens.mergeOpTrials.filter(_.op == "max").foreach { trial =>
      val s2 = spark
      import s2.implicits._
      val df = trialDf(trial.input).persist()
      val defaults = trial.input
        .map { case (sid, _, _, d) => (sid.toString, d.map(Double.box).orNull.asInstanceOf[java.lang.Double]) }
        .distinct.toDF("sid", "default")
        .withColumn("default", col("default").cast("double"))
      // narrow buckets force bucket-boundary compaction through the tiny
      // opens table (the fused merge-compact path q37 uses)
      val bucketed = collectTV(MergeOps.mergeAggDynamic(df, max(_), Some(defaults),
        Some(floor(col("t") / 5).cast("long"))))
      val plain = collectTV(MergeOps.mergeAggDynamic(df, max(_), Some(defaults), None))
      approxEq(bucketed, trial.expected)
      approxEq(plain, trial.expected)
      df.unpersist()
    }
  }

  test("dynamic-K merge keeps null-keyed series (null-safe grid joins)") {
    // a null merge key is legitimate (countByValue's None-value series);
    // round-3's Seq(key) grid joins silently dropped it (ADVICE r03)
    val s = spark
    import s.implicits._
    val rows = Seq(
      ("a", 1.0, 2.0), ("a", 3.0, 4.0), ("b", 2.0, 1.0), ("b", 5.0, 3.0))
    def df(key: Option[String]) = rows
      .map { case (sid, t, v) => (key.orNull, sid, t, v) }
      .toDF("key", "sid", "t", "v")
    val bucket = Some(floor(col("t") / 2).cast("long"))
    for (bk <- Seq(None, bucket)) {
      val gotNull = collectTV(
        MergeOps.mergeAggDynamic(df(None), max(_), bucketBy = bk,
          constDefault = Some(lit(0.0))))
      val gotNamed = collectTV(
        MergeOps.mergeAggDynamic(df(Some("g")), max(_), bucketBy = bk,
          constDefault = Some(lit(0.0))))
      assert(gotNull.nonEmpty && gotNull == gotNamed, s"bucketBy=$bk")
      val entries = MergeOps.iterMergeEntries(df(None), bucketBy = bk).count()
      assert(entries == 8) // 4 distinct times x 2 sids
    }
  }

  test("dynamic-K grid keeps null-t rows under bucketBy (fixed-K parity)") {
    // a null t yields a null bucket; a bare collect_list of buckets would
    // skip it, the grid's inner join would then drop the time row — while
    // the fixed-K window path (no joins) keeps it. Both paths must agree.
    val s = spark
    import s.implicits._
    val df = Seq(
      (Some(1.0), "a", 2.0), (Some(3.0), "a", 4.0),
      (None, "a", 9.0), (Some(2.0), "b", 1.0))
      .map { case (t, sid, v) => ("k", sid, t.map(Double.box).orNull, v) }
      .toDF("key", "sid", "t", "v")
      .withColumn("t", col("t").cast("double"))
    val bucket = Some(floor(col("t") / 2).cast("long"))
    // 3 distinct non-null times + the null time = 4 grid times x 2 sids
    assert(MergeOps.iterMergeEntries(df, bucketBy = bucket).count() == 8)
    val withB = collectTV(MergeOps.mergeAggDynamic(df, max(_), bucketBy = bucket,
      constDefault = Some(lit(0.0))))
    val plain = collectTV(MergeOps.mergeAggDynamic(df, max(_), bucketBy = None,
      constDefault = Some(lit(0.0))))
    assert(withB.nonEmpty && withB == plain, s"$withB vs $plain")
  }

  test("dynamic-K grid guard fails loudly past maxGridPerBucket; audit surfaces it") {
    val s = spark
    import s.implicits._
    // one bucket: 4 times x 3 sids = 12 predicted grid rows
    val df = (for (sid <- Seq("a", "b", "c"); t <- 1 to 4)
      yield ("g", sid, t.toDouble, t.toDouble)).toDF("key", "sid", "t", "v")
    val err = intercept[Exception] {
      MergeOps.iterMergeEntries(df, maxGridPerBucket = 11).count()
    }
    assert(err.getMessage.contains("maxGridPerBucket"), err.getMessage)
    // the audit names the offending (key, bucket) with its predicted size
    val audit = MergeOps.mergeGridAudit(df, minGridRows = 11).collect()
    assert(audit.length == 1 && audit(0).getAs[Long]("grid_rows") == 12L)
    // at the bound (or opted out) it runs
    assert(MergeOps.iterMergeEntries(df, maxGridPerBucket = 12).count() == 12)
    assert(MergeOps.iterMergeEntries(df, maxGridPerBucket = 0).count() == 12)
  }

  test("iterMerge emits the post-transition state once per distinct time") {
    val s = spark
    import s.implicits._
    // two series with a simultaneous transition at t=2 (iter_merge dedups)
    val df = Seq(
      ("g", "a", 1.0, 1.0), ("g", "a", 2.0, 3.0),
      ("g", "b", 2.0, 5.0), ("g", "b", 4.0, 7.0))
      .toDF("key", "sid", "t", "v")
    val got = MergeOps.iterMerge(df, Seq("a", "b"), Map("b" -> lit(0.0)))
      .orderBy("t")
      .collect()
      .map(r => (r.getDouble(1), r.getSeq[Any](2).map(Option(_).map(_.asInstanceOf[Double]))))
      .toSeq
    assert(got == Seq(
      1.0 -> Seq(Some(1.0), Some(0.0)),
      2.0 -> Seq(Some(3.0), Some(5.0)),
      4.0 -> Seq(Some(3.0), Some(7.0))))
  }
}
