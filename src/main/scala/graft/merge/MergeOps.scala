package graft.merge

import graft.core.SeriesOps.{K, T, V}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-series alignment and merge operators
  * (reference traces/timeseries.py:1006-1170, 1399-1575).
  *
  * The reference's flat-sort K-way merge strategy
  * (traces/timeseries.py:1030-1041, docs/merge_strategies.rst:195-251) IS
  * Spark's sort-based shuffle: a union of tagged rows sorted within key
  * partitions. The O(1)-per-transition delta trick of `count_by_value`
  * (traces/timeseries.py:1101-1170) becomes delta rows + one running-sum
  * window — no K-vector is ever materialized, so K can be millions.
  */
object MergeOps {

  /** Align two series at the union of their measurement times and apply a
    * binary column function (reference `operation`,
    * traces/timeseries.py:1399-1428): for every time in either series,
    * f(a_asof, b_asof), where each side carries forward its latest
    * measurement (or its default before the first one). Output (key, t, v).
    */
  def operate(
      a: DataFrame,
      b: DataFrame,
      f: (Column, Column) => Column,
      defaultA: Column = lit(null).cast("double"),
      defaultB: Column = lit(null).cast("double"),
      bucketBy: Option[Column] = None): DataFrame =
    alignPair(a, b, defaultA, defaultB, bucketBy)
      .select(col(K), col(T), f(col("va"), col("vb")).cast("double").as(V))

  /** The as-of alignment underlying [[operate]], exposed so callers can
    * evaluate SEVERAL binary ops over one alignment pass: (key, t, va, vb)
    * at the union of measurement times, each side carrying forward its
    * latest value (or default). */
  def alignPair(
      a: DataFrame,
      b: DataFrame,
      defaultA: Column = lit(null).cast("double"),
      defaultB: Column = lit(null).cast("double"),
      bucketBy: Option[Column] = None): DataFrame = {
    val sa = a.select(
      col(K), col(T),
      struct(col(V)).as("_ma"),
      lit(null).cast("struct<v:double>").as("_mb"))
    val sb = b.select(
      col(K), col(T),
      lit(null).cast("struct<v:double>").as("_ma"),
      struct(col(V)).as("_mb"))
    val tie = col("_ma").isNull // data rows sort before probe rows at equal t
    val union = sa.unionByName(sb)
    val u = bucketBy match {
      case Some(bk) =>
        // skew-safe path: per-(key, time-bucket) carry-forward with the
        // BucketedOps handoff — a constant key (the reference's global
        // `operation` result) no longer runs on a single task
        graft.core.BucketedOps
          .running(union, bk, Seq(tie), Nil,
            carries = Seq("_la" -> col("_ma"), "_lb" -> col("_mb")))
          // equal t ⇒ equal bucket, so in-bucket lead still finds same-t rows
          .withColumn("_nt", lead(col(T), 1).over(graft.core.BucketedOps.wInBucket(Seq(tie))))
      case None =>
        val ord = Window.partitionBy(K).orderBy(col(T).asc, tie.asc)
        val wCum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        union
          .withColumn("_la", last(col("_ma"), ignoreNulls = true).over(wCum))
          .withColumn("_lb", last(col("_mb"), ignoreNulls = true).over(wCum))
          // the last row at each distinct t has seen every measurement <= t;
          // lead() over the SAME (key) partitioning reuses the window sort —
          // a row_number over (key, t) would add a second full shuffle
          .withColumn("_nt", lead(col(T), 1).over(ord))
    }
    u.filter(!(col("_nt") <=> col(T)))
      .select(
        col(K), col(T),
        when(col("_la").isNull, defaultA).otherwise(col("_la").getField(V)).as("va"),
        when(col("_lb").isNull, defaultB).otherwise(col("_lb").getField(V)).as("vb"))
  }

  /** a(t) - b(t) at the union of times (traces/timeseries.py:1499-1501). */
  def difference(a: DataFrame, b: DataFrame, defaultA: Column = lit(null), defaultB: Column = lit(null),
      bucketBy: Option[Column] = None): DataFrame =
    operate(a, b, (x, y) => x - y, defaultA, defaultB, bucketBy)

  /** a(t) * b(t) (traces/timeseries.py:1503-1505). */
  def multiply(a: DataFrame, b: DataFrame, defaultA: Column = lit(null), defaultB: Column = lit(null),
      bucketBy: Option[Column] = None): DataFrame =
    operate(a, b, (x, y) => x * y, defaultA, defaultB, bucketBy)

  /** Python-truthiness logical ops: `and`/`or` return an OPERAND, not a
    * boolean (tests/test_operations.py:183-207); xor returns a boolean.
    * Python `x or y` = x if truthy(x) else y; `x and y` = y if truthy(x)
    * else x. truthy(v) here = v != 0 and v not null (numeric values).
    */
  private def truthy(x: Column): Column = x.isNotNull && x =!= 0.0

  def logicalOr(a: DataFrame, b: DataFrame, dA: Column = lit(null), dB: Column = lit(null)): DataFrame =
    operate(a, b, (x, y) => when(truthy(x), x).otherwise(y), dA, dB)

  def logicalAnd(a: DataFrame, b: DataFrame, dA: Column = lit(null), dB: Column = lit(null)): DataFrame =
    operate(a, b, (x, y) => when(truthy(x), y).otherwise(x), dA, dB)

  def logicalXor(a: DataFrame, b: DataFrame, dA: Column = lit(null), dB: Column = lit(null)): DataFrame =
    operate(a, b, (x, y) => (truthy(x) =!= truthy(y)).cast("double"), dA, dB)

  /** K-ary merge with operation = sum over an arbitrary number of series
    * in one DataFrame (key = merge group, sid = series id within group).
    *
    * strict=false -> ignorant_sum (None contributes 0); strict=true ->
    * strict_sum (any None at t makes the merged value None)
    * (traces/operations.py:4-11, traces/decorators.py:9-26).
    *
    * Distributed as the reference's transition-delta strategy
    * (traces/timeseries.py:1101-1170 / merge_strategies.rst:515-537):
    * every measurement contributes delta = v - previous_v_of_its_series to
    * one running sum per key — O(N) total, never an O(K) state vector.
    * `defaults` optionally maps (sid -> default) seeding pre-first values.
    * Output: (key, t, v) at the union of measurement times, compacted
    * (merge(compact=True), traces/timeseries.py:1079-1099). The first merged
    * point is ALWAYS kept even when it equals the merged default: merge
    * writes through set(t, v, compact=True) whose `len(self) == 0` branch
    * short-circuits the equality check on the first write
    * (traces/timeseries.py:187-191) — only set_many(compact=True) compares
    * the first entry against the default.
    */
  def mergeSum(
      df: DataFrame, // columns: key, sid, t, v
      strict: Boolean,
      defaults: Option[DataFrame] = None, // columns: sid, default
      bucketBy: Option[Column] = None // skew-safe: function of t (BucketedOps)
  ): DataFrame = {
    val withDef = defaults match {
      case Some(d) => df.join(broadcast(d), Seq("sid"), "left")
      case None    => df.withColumn("default", lit(null).cast("double"))
    }
    // seed: sum over sids of default values (ignorant: nulls -> 0) and count
    // of null defaults; every sid contributes its default before its first point
    def seedsOf(src: DataFrame): DataFrame = src
      .groupBy(col(K), col("sid"))
      .agg(first("default").as("_def"))
      .groupBy(col(K))
      .agg(
        sum(coalesce(col("_def"), lit(0.0))).as("_seed"),
        sum(col("_def").isNull.cast("long")).as("_seedn"))
    def mval(cs: Column, cn: Column): Column =
      when(lit(strict) && (cn + col("_seedn")) > 0, lit(null).cast("double"))
        .otherwise(cs + col("_seed"))
    def deltas(src: DataFrame): DataFrame = {
      val wSid = Window.partitionBy(K, "sid").orderBy(T)
      val prevStruct = lag(struct(col(V)), 1).over(wSid)
      val prevV = when(prevStruct.isNull, col("default")).otherwise(prevStruct.getField(V))
      src
        .withColumn("_pv", prevV)
        .withColumn("_d", coalesce(col(V), lit(0.0)) - coalesce(col("_pv"), lit(0.0)))
        .withColumn("_dn", col(V).isNull.cast("long") - col("_pv").isNull.cast("long"))
    }
    val ties = Seq(col("sid"))
    bucketBy match {
      case Some(bk) =>
        // skew-safe running sums: per-(key, time-bucket) windows + the tiny
        // per-bucket offset handoff — the constant-key global merge no
        // longer collapses onto one task. ONE big exchange total, and it is
        // the skew-free hash(key, bucket) one:
        //  - per-bucket closings/totals/seeds all come off a map-side-
        //    combined groupBy of the input (the per-(key,sid,bucket) delta-
        //    sum TELESCOPES to closing-minus-previous-closing, so no per-row
        //    lag is ever needed for the handoff), then tiny-table windows;
        //  - the per-row delta needs its sid's previous value: WITHIN a
        //    bucket that is an in-bucket lag (clustered by hash(key,bucket)
        //    since {key,_bkt} ⊆ {key,sid,_bkt}); at a bucket's first row it
        //    is the sid's closing value from the previous bucket, which
        //    rides in on a broadcast join from the tiny closings table. The
        //    skewed hash(key, sid) lag exchange of the naive plan never
        //    happens — a hot series spreads over its time buckets.
        val withB = withDef.withColumn("_bkt", bk)
        // scalar max_by (primitive buffer) keeps this branch in
        // HashAggregate with map-side combine — a struct-valued max_by
        // would fall back to SortAggregate and full-data pre-sorts. Every
        // (key, sid, bucket) group is nonempty by construction, so a null
        // closing value can only mean "measured None", never "absent"; the
        // struct wrapper that disambiguates those is re-applied by the lag
        // on the tiny aggregated table below.
        val sidB = withB
          .groupBy(col(K), col("sid"), col("_bkt"))
          .agg(max_by(col(V), col(T)).as("_lvv"), first("default").as("_def"))
        val wSidB = Window.partitionBy(K, "sid").orderBy("_bkt")
        val pc = lag(struct(col("_lvv")), 1).over(wSidB)
        // _pcv: the sid's closing value entering this bucket (its previous
        // nonempty bucket's last value, or its default before any point)
        val sidC = sidB
          .withColumn("_pcv", when(pc.isNull, col("_def")).otherwise(pc.getField("_lvv")))
          .withColumn("_sd",
            coalesce(col("_lvv"), lit(0.0)) - coalesce(col("_pcv"), lit(0.0)))
          .withColumn("_sdn",
            col("_lvv").isNull.cast("long") - col("_pcv").isNull.cast("long"))
          .withColumn("_fst", pc.isNull)
        // EVERYTHING the big side needs — per-sid bucket-entry value,
        // per-key cross-bucket offsets, per-key seeds — lands in ONE tiny
        // frame with a SINGLE consumer, so the per-bucket aggregate chain is
        // evaluated once (three separate handoff frames each re-ran it: the
        // subtrees prune differently, so exchange reuse cannot dedupe them).
        // The offsets use a RANGE frame on the bucket id (strictly earlier
        // buckets, any sid); null ⇔ no earlier nonempty bucket of the key.
        val wOffR = Window.partitionBy(K).orderBy(col("_bkt"))
          .rangeBetween(Window.unboundedPreceding, -1)
        val wK = Window.partitionBy(K)
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val handoff = sidC.select(
          col(K).as("_hk"), col("sid").as("_hs"), col("_bkt").as("_hb"), col("_pcv"),
          sum(col("_sd")).over(wOffR).as("_o__cs"),
          sum(col("_sdn")).over(wOffR).as("_o__cn"),
          sum(when(col("_fst"), coalesce(col("_def"), lit(0.0))).otherwise(lit(0.0)))
            .over(wK).as("_seed"),
          sum(when(col("_fst") && col("_def").isNull, lit(1L)).otherwise(lit(0L)))
            .over(wK).as("_seedn"))
        // the one big exchange: hash(key, bucket) satisfies both window
        // clusterings below ({key,_bkt} ⊆ {key,sid,_bkt}), so the in-bucket
        // per-sid lag and the running sums share it; AQE broadcasts the
        // handoff side when small, else degrades to a co-partitioned join
        val placed = withB
          .join(handoff,
            col(K) <=> col("_hk") && col("sid") <=> col("_hs") && col("_bkt") <=> col("_hb"))
          .drop("_hk", "_hs", "_hb")
          .repartition(col(K), col("_bkt"))
        val wLag = Window.partitionBy(col(K), col("sid"), col("_bkt")).orderBy(col(T))
        val prevStruct = lag(struct(col(V)), 1).over(wLag)
        val wIn = graft.core.BucketedOps.wInBucket(ties)
        val wInCum = wIn.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val run = placed
          .withColumn("_pv", when(prevStruct.isNull, col("_pcv")).otherwise(prevStruct.getField(V)))
          .withColumn("_d", coalesce(col(V), lit(0.0)) - coalesce(col("_pv"), lit(0.0)))
          .withColumn("_dn", col(V).isNull.cast("long") - col("_pv").isNull.cast("long"))
          .withColumn("_cs",
            coalesce(col("_o__cs"), lit(0.0)) + coalesce(sum(col("_d")).over(wInCum), lit(0.0)))
          .withColumn("_cn",
            coalesce(col("_o__cn"), lit(0L)) + coalesce(sum(col("_dn")).over(wInCum), lit(0L)))
          .withColumn("_nt", lead(col(T), 1).over(wIn))
          .filter(!(col("_nt") <=> col(T)))
        // fused merge(compact=True): the previous distinct-t merged value is
        // the in-bucket lag over the kept rows, or — for a bucket's first
        // kept row — the previous nonempty bucket's closing state, which IS
        // the exposed offset (_o__cs/_o__cn: cumulative totals through the
        // end of the previous nonempty bucket; both-null ⇔ no earlier point
        // exists, and merge ALWAYS keeps the first merged point: set()'s
        // len==0 short-circuit, timeseries.py:187-191). No second handoff
        // join, no trailing compactBucketed pass.
        val wKept = graft.core.BucketedOps.wInBucket(ties)
        val pCs = lag(col("_cs"), 1).over(wKept)
        val pCn = lag(col("_cn"), 1).over(wKept)
        val prevVal = when(pCs.isNotNull, mval(pCs, pCn))
          .otherwise(mval(col("_o__cs"), col("_o__cn")))
        val isFirst = pCs.isNull && col("_o__cs").isNull
        run
          .withColumn("_mv", mval(col("_cs"), col("_cn")))
          .withColumn("_keep", isFirst || !(prevVal <=> col("_mv")))
          .filter(col("_keep"))
          .select(col(K), col(T), col("_mv").as(V))
      case None =>
        // ONE data shuffle: pre-partitioning by key alone satisfies BOTH the
        // (key, sid) clustering of the per-sid lag and the (key) clustering
        // of the running sum — hash(key) co-locates every (key, sid) — so
        // the two windows run back-to-back with in-partition re-sorts and
        // no second exchange. (Deliberately not skew-safe: that is what
        // `bucketBy` is for.)
        val pre = withDef.repartition(col(K))
        val seeds = seedsOf(pre)
        val rows = deltas(pre)
        val ord = Window.partitionBy(K).orderBy(col(T).asc, col("sid").asc)
        val wRun = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val run = rows
          .withColumn("_cs", sum(col("_d")).over(wRun))
          .withColumn("_cn", sum(col("_dn")).over(wRun))
          // last row per distinct t carries the fully-updated state; lead()
          // over the same (key) ordering reuses the running-sum shuffle+sort
          .withColumn("_nt", lead(col(T), 1).over(ord))
          .filter(!(col("_nt") <=> col(T)))
          // null-SAFE: a null merge key is legitimate (countByValue's
          // None-value series); Seq(K) equi-join would silently drop it,
          // diverging from the bucketed branch's <=> joins
          .join(broadcast(seeds.withColumnRenamed(K, "_sk")), col(K) <=> col("_sk"))
          .drop("_sk")
        val merged = run.select(col(K), col(T), mval(col("_cs"), col("_cn")).as(V))
        graft.core.SeriesOps.compact(merged)
    }
  }

  /** The reference's `iter_merge` (traces/timeseries.py:1048-1077): at each
    * distinct union time, the K-slot state vector AFTER all transitions at
    * that time — slot i carries series `sids(i)`'s latest value, or its
    * default before its first measurement. Output (key, t, vs) with
    * `vs: array<double>` ordered like `sids`.
    *
    * The K dimension is pivoted to K carry-forward struct columns filled in
    * ONE window pass (no |times| x K row blowup): right for the reference's
    * in-memory K (a handful to a few thousand series). For huge K with an
    * associative op, use the delta specialization ([[mergeSum]]) instead —
    * the same O(K) state-copy-per-yield cost the reference documents for
    * iter_merge (docs/merge_strategies.rst) applies here as the array
    * materialization. `bucketBy` (function of t) makes the carry-forward
    * skew-safe via [[graft.core.BucketedOps]].
    */
  def iterMerge(
      df: DataFrame, // columns: key, sid, t, v
      sids: Seq[String],
      defaults: Map[String, Column] = Map.empty,
      bucketBy: Option[Column] = None): DataFrame = {
    require(sids.nonEmpty && sids.distinct == sids, s"bad sids: $sids")
    val idx = sids.zipWithIndex
    val marks = idx.map { case (s, i) => when(col("sid") === s, struct(col(V))).as(s"_m$i") }
    val base = df.select((col(K) +: col(T) +: marks): _*)
    val filled = bucketBy match {
      case Some(bk) =>
        graft.core.BucketedOps
          .running(base, bk, Nil, Nil,
            carries = idx.map { case (_, i) => s"_l$i" -> col(s"_m$i") })
          .withColumn("_nt", lead(col(T), 1).over(graft.core.BucketedOps.wInBucket(Nil)))
      case None =>
        val ord = Window.partitionBy(K).orderBy(col(T).asc)
        val wCum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        idx.foldLeft(base) { case (acc, (_, i)) =>
          acc.withColumn(s"_l$i", last(col(s"_m$i"), ignoreNulls = true).over(wCum))
        }.withColumn("_nt", lead(col(T), 1).over(ord))
    }
    // the positionally-last row at each distinct t has absorbed every
    // simultaneous transition (iter_merge emits once per unique t)
    val vals = idx.map { case (s, i) =>
      when(col(s"_l$i").isNull, defaults.getOrElse(s, lit(null)).cast("double"))
        .otherwise(col(s"_l$i").getField(V))
    }
    filled
      .filter(!(col("_nt") <=> col(T)))
      .select(col(K), col(T), array(vals: _*).as("vs"))
  }

  /** Dynamic-K `iter_merge`: the exploded state stream (key, sid, t, v) —
    * one row per distinct union measurement time x series, where v is the
    * series' latest value at-or-before t (its default before its first
    * point). Equivalent to [[iterMerge]]'s array pivoted long, but the sid
    * universe is derived DISTRIBUTEDLY (no driver-side collect, no
    * K-column pivot), so K is unbounded — the reference's in-memory
    * ts_list enumeration (traces/timeseries.py:1048-1077) becomes a
    * times x sids grid with an as-of carry-forward.
    *
    * The |times| x K row count is the operator's inherent output size (the
    * reference pays the same O(K) state copy per yielded time,
    * docs/merge_strategies.rst). `bucketBy` (function of t) makes the
    * carry skew-safe: the per-(key, sid) carry runs per (key, sid, bucket)
    * inside ONE hash(key, bucket) exchange, with each sid's bucket-entry
    * value carried in from a tiny per-(sid, bucket) closings table — the
    * same single-join handoff as [[mergeSum]].
    */
  private def withDefaults(df: DataFrame, defaults: Option[DataFrame]): DataFrame =
    defaults match {
      case Some(d) => df.join(broadcast(d), Seq("sid"), "left")
      case None    => df.withColumn("default", lit(null).cast("double"))
    }

  /** Bucketed dynamic-K internals: the exploded entry stream (with its
    * bucket column retained) plus the tiny per-(key, sid, grid-bucket)
    * bucket-entry table `entry` (`_ek,_es,_eb,_pcv` = each sid's state
    * ENTERING the bucket).
    *
    * The grid construction is a diamond-heavy DAG whose branches prune
    * differently, so exchange reuse cannot always dedupe them and some
    * tiny-frame lineage (including the caller's source aggregation) is
    * re-evaluated by 2-3 consumers. Measured: materializing the small
    * frames with lazy localCheckpoint was SLOWER here (serialized
    * materialization jobs + lost codegen fusion outweigh the re-runs at
    * any tested size), so the frames stay lazy; each re-run is a map-side-
    * combined aggregate pass, never a second copy of the data. Sizes:
    * `times` is output-rows / K; the others are per-(sid, bucket)
    * summaries.
    */
  private case class DynamicParts(entries: DataFrame, entry: DataFrame)

  private def dynamicParts(withDef: DataFrame, bk: Column): DynamicParts = {
    val times = withDef.select(col(K), col(T)).distinct()
      .withColumn("_bkt", bk)
    // each sid's closing value per nonempty DATA bucket + its default
    // (scalar max_by keeps this a map-side-combined HashAggregate; groups
    // are nonempty, so null-vs-absent is re-established by the struct wrap
    // on the tiny result)
    val sidClose = withDef.withColumn("_bkt", bk)
      .groupBy(col(K), col("sid"), col("_bkt"))
      .agg(max_by(col(V), col(T)).as("_lvv"), first("default").as("_def"))
    val sids = sidClose
      .groupBy(col(K), col("sid")).agg(first("_def").as("_def"))
    // every (key, sid, GRID bucket) with the sid's carry INTO the bucket —
    // latest closing from any strictly earlier bucket, else the default
    val gridB = times.select(col(K), col("_bkt")).distinct()
      .join(sids, Seq(K))
      .join(
        sidClose.select(col(K), col("sid"), col("_bkt"), struct(col("_lvv")).as("_cl")),
        Seq(K, "sid", "_bkt"), "left")
    val wSB = Window.partitionBy(K, "sid").orderBy("_bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val entry = gridB
      .withColumn("_pcs", last(col("_cl"), ignoreNulls = true).over(wSB))
      .select(col(K).as("_ek"), col("sid").as("_es"), col("_bkt").as("_eb"),
        when(col("_pcs").isNull, col("_def")).otherwise(col("_pcs").getField("_lvv"))
          .as("_pcv"))
    val dat = withDef.select(col(K), col("sid"), col(T), struct(col(V)).as("_m"))
    val grid = times.join(sids, Seq(K))
      .join(dat, Seq(K, "sid", T), "left")
      .join(entry,
        col(K) <=> col("_ek") && col("sid") <=> col("_es") && col("_bkt") <=> col("_eb"))
      .drop("_ek", "_es", "_eb")
      .repartition(col(K), col("_bkt"))
    val wCumB = Window.partitionBy(col(K), col("sid"), col("_bkt")).orderBy(col(T))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val entries = grid
      .withColumn("_lm", last(col("_m"), ignoreNulls = true).over(wCumB))
      .select(col(K), col("sid"), col(T), col("_bkt"),
        when(col("_lm").isNotNull, col("_lm").getField(V)).otherwise(col("_pcv")).as(V))
    DynamicParts(entries, entry)
  }

  def iterMergeEntries(
      df: DataFrame, // columns: key, sid, t, v
      defaults: Option[DataFrame] = None, // columns: sid, default
      bucketBy: Option[Column] = None): DataFrame = {
    val withDef = withDefaults(df, defaults)
    bucketBy match {
      case Some(bk) => dynamicParts(withDef, bk).entries.drop("_bkt")
      case None =>
        val times = withDef.select(col(K), col(T)).distinct()
        val sids = withDef.groupBy(col(K), col("sid")).agg(first("default").as("_def"))
        val dat = withDef.select(col(K), col("sid"), col(T), struct(col(V)).as("_m"))
        val grid = times.join(sids, Seq(K)).join(dat, Seq(K, "sid", T), "left")
        val wCum = Window.partitionBy(K, "sid").orderBy(T)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid
          .withColumn("_lm", last(col("_m"), ignoreNulls = true).over(wCum))
          .select(col(K), col(T), col("sid"),
            when(col("_lm").isNotNull, col("_lm").getField(V)).otherwise(col("_def")).as(V))
          .select(col(K), col("sid"), col(T), col(V))
    }
  }

  /** merge(compact=True) against tiny per-bucket opening values: in-bucket
    * lag plus, at each bucket's first merged row, the bucket's opening
    * merged value (the state entering the bucket IS the state at the last
    * time of the previous nonempty bucket — every data point's time is a
    * grid time, so no transition hides between them). `_ofirst` marks the
    * key's first grid bucket, whose first row merge always keeps (set()'s
    * len==0 short-circuit, timeseries.py:187-191). */
  private def compactAgainstOpens(merged: DataFrame, opens: DataFrame): DataFrame = {
    val wIn = Window.partitionBy(K, "_bkt").orderBy(T)
    merged
      .join(opens, col(K) <=> col("_ok") && col("_bkt") <=> col("_ob"))
      .withColumn("_pm", lag(struct(col(V)), 1).over(wIn))
      .withColumn("_keep",
        when(col("_pm").isNull, col("_ofirst") || !(col("_ov") <=> col(V)))
          .otherwise(!(col("_pm").getField(V) <=> col(V))))
      .filter(col("_keep"))
      .select(col(K), col(T), col(V))
  }

  private def markFirstBucket(opens: DataFrame): DataFrame =
    opens.withColumn("_ofirst",
      row_number().over(Window.partitionBy("_ok").orderBy("_ob")) === 1)

  /** Dynamic-K `merge(operation=f)`: `f` maps the per-time state MAP
    * (sid -> latest value, every sid of the key present) to the merged
    * value; sids never touch the driver. Output compacted like
    * merge(compact=True) (first merged point always kept). Use
    * `map_values(state)` for vector-style operations
    * ([[ignorantMaxOf]] etc.). For aggregate-expressible operations prefer
    * [[mergeAggDynamic]], which never materializes the map. */
  def mergeOpDynamic(
      df: DataFrame,
      f: Column => Column,
      defaults: Option[DataFrame] = None,
      bucketBy: Option[Column] = None): DataFrame = {
    val withDef = withDefaults(df, defaults)
    // sids are unique per (key, t), so the sorted entry list is map-safe
    def stateOf(sidC: Column, vC: Column): Column =
      map_from_entries(array_sort(collect_list(struct(sidC, vC))))
    bucketBy match {
      case Some(bk) =>
        val parts = dynamicParts(withDef, bk)
        val merged = parts.entries
          .groupBy(col(K), col("_bkt"), col(T))
          .agg(stateOf(col("sid"), col(V)).as("_st"))
          .select(col(K), col("_bkt"), col(T), f(col("_st")).cast("double").as(V))
        val opens = markFirstBucket(
          parts.entry.groupBy(col("_ek").as("_ok"), col("_eb").as("_ob"))
            .agg(stateOf(col("_es"), col("_pcv")).as("_om"))
            .select(col("_ok"), col("_ob"), f(col("_om")).cast("double").as("_ov")))
        compactAgainstOpens(merged, opens)
      case None =>
        val merged = iterMergeEntries(df, defaults, None)
          .groupBy(col(K), col(T))
          .agg(stateOf(col("sid"), col(V)).as("_st"))
          .select(col(K), col(T), f(col("_st")).cast("double").as(V))
        graft.core.SeriesOps.compact(merged)
    }
  }

  /** Dynamic-K merge for an AGGREGATE operation: `aggOf` builds a Spark
    * aggregate expression over the per-time state VALUES (e.g. `max(_)`,
    * `min(_)`, `avg(_)`, or a conditional-sum for strict semantics).
    * Cheaper than [[mergeOpDynamic]] — the state never materializes as a
    * map; each distinct time aggregates its K entry rows directly, with
    * map-side partial aggregation inside the (key, bucket) layout. Output
    * compacted like merge(compact=True). */
  def mergeAggDynamic(
      df: DataFrame,
      aggOf: Column => Column,
      defaults: Option[DataFrame] = None,
      bucketBy: Option[Column] = None): DataFrame = {
    val withDef = withDefaults(df, defaults)
    bucketBy match {
      case Some(bk) =>
        val parts = dynamicParts(withDef, bk)
        val merged = parts.entries
          .groupBy(col(K), col("_bkt"), col(T))
          .agg(aggOf(col(V)).cast("double").as(V))
        val opens = markFirstBucket(
          parts.entry.groupBy(col("_ek").as("_ok"), col("_eb").as("_ob"))
            .agg(aggOf(col("_pcv")).cast("double").as("_ov")))
        compactAgainstOpens(merged, opens)
      case None =>
        val merged = iterMergeEntries(df, defaults, None)
          .groupBy(col(K), col(T))
          .agg(aggOf(col(V)).cast("double").as(V))
        graft.core.SeriesOps.compact(merged)
    }
  }

  /** The reference's `merge(ts_list, operation=f)` for an ARBITRARY
    * operation (traces/timeseries.py:1079-1099): `f` maps the state-vector
    * column (array<double>, ordered like `sids`) to the merged value;
    * output is compacted like merge(compact=True) — the first merged point
    * is always kept (set's len==0 short-circuit, timeseries.py:187-191).
    * [[mergeSum]] stays the delta-form specialization for associative sums
    * at unbounded K; property-tested equivalent via mergeOp(ignorant-sum).
    */
  def mergeOp(
      df: DataFrame,
      sids: Seq[String],
      f: Column => Column,
      defaults: Map[String, Column] = Map.empty,
      bucketBy: Option[Column] = None): DataFrame = {
    val merged = iterMerge(df, sids, defaults, bucketBy)
      .select(col(K), col(T), f(col("vs")).cast("double").as(V))
    bucketBy match {
      case Some(bk) => graft.core.SeriesOps.compactBucketed(merged, bk)
      case None     => graft.core.SeriesOps.compact(merged)
    }
  }

  /** ignorant_sum over a state vector (nulls dropped; all-null -> sum of
    * empty = 0, like Python sum([]) — traces/operations.py:4-6). */
  def ignorantSumOf(vs: Column): Column =
    aggregate(filter(vs, _.isNotNull), lit(0.0), (acc, x) => acc + x)

  /** strict_sum: any null makes the result null (traces/operations.py:9-11). */
  def strictSumOf(vs: Column): Column =
    when(exists(vs, _.isNull), lit(null).cast("double")).otherwise(ignorantSumOf(vs))

  /** ignorant max over a state vector (array_max skips nulls; all-null ->
    * null). The reference's merge(operation=max) over all-None state would
    * raise — callers there pass non-None defaults, as should ours. */
  def ignorantMaxOf(vs: Column): Column = array_max(vs)

  /** ignorant min (array_min skips nulls; all-null -> null). */
  def ignorantMinOf(vs: Column): Column = array_min(vs)

  /** ignorant mean: mean of the non-null slots; all-null -> null (the
    * reference's ignorant(mean) raises there — callers pass defaults). */
  def ignorantMeanOf(vs: Column): Column = {
    val n = size(filter(vs, _.isNotNull))
    when(n > 0, ignorantSumOf(vs) / n.cast("double"))
  }

  /** The flat transition stream of K series (reference
    * `iter_merge_transitions`, traces/timeseries.py:1006-1046): one row per
    * measurement, ordered (t, sid) with the series' previous value
    * attached. The reference's flat-sort strategy IS Spark's sort-based
    * shuffle here — one window, no K-vector state. Output:
    * (key, sid, t, prev, v). */
  def mergeTransitions(df: DataFrame, defaults: Option[DataFrame] = None): DataFrame = {
    val withDef = defaults match {
      case Some(d) => df.join(broadcast(d), Seq("sid"), "left")
      case None    => df.withColumn("default", lit(null).cast("double"))
    }
    val wSid = Window.partitionBy(K, "sid").orderBy(T)
    val prevStruct = lag(struct(col(V)), 1).over(wSid)
    withDef
      .withColumn("prev",
        when(prevStruct.isNull, col("default")).otherwise(prevStruct.getField(V)))
      .select(col(K), col("sid"), col(T), col("prev"), col(V))
  }

  /** For each distinct value: a step series counting how many input series
    * hold that value at each time (reference classmethod `count_by_value`,
    * traces/timeseries.py:1101-1170). Defaults seed the initial counts.
    * Output (value, t, count) with value in the `key` column position for
    * further series ops: (key=value, t, v=count).
    */
  def countByValue(
      df: DataFrame, // columns: sid, t, v
      defaults: Option[DataFrame] = None,
      bucketBy: Option[Column] = None): DataFrame = {
    val wSid = Window.partitionBy("sid").orderBy(T)
    val prevStruct = lag(struct(col(V)), 1).over(wSid)
    val withDef = defaults match {
      case Some(d) => df.join(broadcast(d), Seq("sid"), "left")
      case None    => df.withColumn("default", lit(null).cast("double"))
    }
    val prevV = when(prevStruct.isNull, col("default")).otherwise(prevStruct.getField(V))
    val trans = withDef.withColumn("_pv", prevV)
    val plus = trans.select(col(V).as("val"), col(T), lit(1L).as("d"))
    val minus = trans.select(col("_pv").as("val"), col(T), lit(-1L).as("d"))
    // seeds: one +1 per sid at t = -infinity for its default value; emitted
    // as the count *before* the first transition of that value
    val seedRows = withDef
      .groupBy(col("sid"))
      .agg(first("default").as("val"))
      .select(col("val"), lit(null).cast(df.schema(T).dataType).as(T), lit(1L).as("d"))
    val all = plus.unionByName(minus).unionByName(seedRows)
    // the running count partitions by VALUE — a boolean-valued corpus has
    // only two partitions, so `bucketBy` (a function of t) matters here as
    // much as for constant merge keys: seeds ride in the null time bucket,
    // which sorts before every real bucket in the offset handoff
    val byT = all.groupBy(col("val"), col(T)).agg(sum("d").as("d"))
      .select(col("val").as(K), col(T), col("d"))
    val counted = (bucketBy match {
      case Some(bk) =>
        graft.core.BucketedOps.running(byT, bk, Nil, sums = Seq("cnt" -> col("d")))
      case None =>
        val wRun = Window
          .partitionBy(K)
          .orderBy(col(T).asc_nulls_first)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        byT.withColumn("cnt", sum("d").over(wRun))
    })
      .filter(col(T).isNotNull) // drop the seed pseudo-time rows
      .select(col(K), col(T), col("cnt").cast("double").as(V))
    bucketBy match {
      case Some(bk) => graft.core.SeriesOps.compactBucketed(counted, bk)
      case None     => graft.core.SeriesOps.compact(counted)
    }
  }
}
