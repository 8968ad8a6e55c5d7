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

  /** As-of enrichment join: attach to every left row the latest right
    * measurement at-or-before its time — DuckDB/kdb ASOF-JOIN semantics,
    * and the probe-side generalization of [[alignPair]] (reference
    * `get(t, "previous")` evaluated at an arbitrary probe table instead
    * of a sample grid): left rows keep their FULL payload; right must be
    * a series (unique (key, t), double values); at equal times the right
    * measurement is visible to the left row (inclusive, matching
    * `t >= r.t`); left rows with no prior measurement get null.
    * Output = left columns + `outCol`.
    *
    * Same union-carry plan as [[alignPair]]: ONE (key) exchange and one
    * sort — never a left×right-history range join (the O(|L|·|R|) trap a
    * naive `l.t >= r.t` join plans). With `bucketBy` (a function of t)
    * the carry runs per (key, time-bucket) through the BucketedOps
    * handoff, so a hot key spreads across tasks.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      outCol: String = "asof_v",
      bucketBy: Option[Column] = None): DataFrame = {
    val payload = left.columns.filter(c => c != K && c != T).toSeq
    require(payload.nonEmpty, "left needs at least one payload column")
    val sl = left.select(col(K), col(T),
      lit(null).cast("struct<v:double>").as("_m"),
      struct(payload.map(col): _*).as("_pl"))
    val sr = right
      .select(col(K), col(T), struct(col(V).cast("double").as("v")).as("_m"))
      .withColumn("_pl", lit(null).cast(sl.schema("_pl").dataType))
    val union = sl.unionByName(sr)
    val tie = col("_m").isNull // right (measurement) rows first at equal t
    val carried = bucketBy match {
      case Some(bk) =>
        graft.core.BucketedOps
          .running(union, bk, Seq(tie), Nil, carries = Seq("_c" -> col("_m")))
      case None =>
        val w = Window.partitionBy(K).orderBy(col(T).asc, tie.asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        union.withColumn("_c", last(col("_m"), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("_pl").isNotNull)
      .select(col(K) +: col(T) +:
        payload.map(c => col(s"_pl.$c").as(c)) :+
        col("_c.v").as(outCol): _*)
  }

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
      // skew-safe: function of t (BucketedOps). MUST produce an INTEGRAL
      // (numeric) bucket id — the cross-bucket offset below uses a RANGE
      // frame ordered by the bucket column, which Spark only analyzes for
      // numeric order keys (a date_trunc bucket fails analysis; use
      // unix_micros/floor-division buckets, e.g. BucketedOps.adaptiveBucket)
      bucketBy: Option[Column] = None
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
        // NOTE (r6, measured): a shared repartition(key, bucket) ahead of
        // the closings aggregate looks like one saved exchange, but it
        // trades away the closings branch's MAP-SIDE partial aggregation
        // and makes both branches re-READ the full-row shuffle — the 24M
        // skew leg ran 2.5x slower (11.5 s -> 28.8 s). Guide §2.3
        // ("aggregate before you shuffle") wins here: the closings branch
        // re-scans the (cheap) source and shuffles only aggregated rows.
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
    * docs/merge_strategies.rst) — and at scale a silent 10^12-row grid is
    * a job-killer, so the plan carries a guard: each (key, grid-bucket)
    * whose predicted n_times x n_sids exceeds `maxGridPerBucket` fails
    * loudly with raise_error (opt out with maxGridPerBucket <= 0; audit
    * candidates first with [[mergeGridAudit]] — the same cap-plus-audit
    * pattern as [[graft.dedup.Dedup.minhashCandidates]]).
    *
    * `bucketBy` (function of t) makes the carry skew-safe: the grid is
    * built per (key, sid, bucket) inside ONE hash(key, bucket) exchange
    * with each sid's bucket-entry state riding in as a synthetic t=null
    * ENTRY row from a tiny windows-only handoff chain (no grid joins on
    * the data side, no diamond re-evaluation of the tiny lineage — the
    * round-3 join-built grid re-ran the caller's source aggregation 2-3x).
    */
  def iterMergeEntries(
      df: DataFrame, // columns: key, sid, t, v
      defaults: Option[DataFrame] = None, // columns: sid, default
      bucketBy: Option[Column] = None,
      maxGridPerBucket: Long = MAX_GRID_PER_BUCKET,
      // uniform default for EVERY sid (the reference's scalar `default=`
      // form) — zero extra lineage vs the per-sid defaults frame; ignored
      // when `defaults` is given
      constDefault: Option[Column] = None): DataFrame =
    dynamicEntries(df, defaults, bucketBy.getOrElse(lit(0L)), maxGridPerBucket, constDefault)
      .filter(!col("_ent"))
      .select(col(K), col("sid"), col(T), col(V))

  /** Default per-(key, grid-bucket) row bound for the dynamic-K merge
    * family (~50M rows of grid land in one hash(key, bucket) group). */
  final val MAX_GRID_PER_BUCKET = 50000000L

  /** Predicted dynamic-K grid sizes above `minGridRows`, per (key,
    * grid-bucket): (key, bucket, n_times, n_sids, grid_rows). Run this
    * next to an [[iterMergeEntries]]/[[mergeOpDynamic]] call before
    * raising `maxGridPerBucket`, so capped coverage is a visible audit
    * row, never silent (mirrors [[graft.dedup.Dedup.lshOversizedBuckets]]).
    */
  def mergeGridAudit(df: DataFrame, bucketBy: Option[Column] = None,
      minGridRows: Long = MAX_GRID_PER_BUCKET): DataFrame = {
    val bk = bucketBy.getOrElse(lit(0L))
    val nt = df.select(col(K), col(T)).distinct()
      .groupBy(col(K), bk.as("_bkt")).agg(count(lit(1)).as("n_times"))
    val ns = df.select(col(K), col("sid")).distinct()
      .groupBy(col(K)).agg(count(lit(1)).as("n_sids"))
    nt.join(ns.withColumnRenamed(K, "_nk"), col(K) <=> col("_nk"))
      .select(col(K), col("_bkt").as("bucket"), col("n_times"), col("n_sids"),
        (col("n_times") * col("n_sids")).as("grid_rows"))
      .filter(col("grid_rows") > minGridRows)
  }

  /** The shared dynamic-K grid (round-4 plan): one row per
    * (grid time x sid) with `v` = the sid's latest value at-or-before t
    * (its default before its first point), PLUS one ENTRY row (t = null,
    * `_ent` = true) per (key, sid, grid-bucket) carrying the sid's state
    * entering the bucket — so the per-bucket opening merged state rides
    * the same stream and downstream merges never re-consume tiny lineage.
    *
    * Plan shape — exactly ONE big exchange, hash(key, bucket):
    *  - `sidClose` (tiny, the single data aggregation of the handoff):
    *    per-(key, sid, nonempty-bucket) closing value.
    *  - the entry chain densifies sidClose to every (sid x grid bucket)
    *    with windows + one explode over the TINY frame — no joins, ONE
    *    consumer, so the data lineage behind sidClose runs once (the
    *    round-3 join-built version re-ran it per consumer: measured 2-3
    *    re-evaluations of the caller's source aggregation; exchange reuse
    *    cannot dedupe subtrees that prune differently).
    *  - `times` (distinct union times) joins the tiny entry table on
    *    (key, bucket) — AQE broadcasts the entry side — emitting one probe
    *    row per (time, sid); the row at the bucket's min time also emits
    *    the sid's entry row, so no second consumer of the entry chain.
    *  - probes ∪ data rows -> repartition(key, bucket) -> one cumulative
    *    window. hash(key, bucket) then also satisfies the (key, bucket, t)
    *    merge aggregation and the (key, bucket) compaction window
    *    downstream — zero further exchanges.
    * All joins are null-safe (<=>): a null merge key or sid is legitimate
    * (countByValue's None-value series) and must not be dropped.
    */
  private def dynamicEntries(
      df: DataFrame,
      defaults: Option[DataFrame],
      bk: Column,
      maxGridPerBucket: Long,
      constDefault: Option[Column] = None): DataFrame = {
    val tType = df.schema(T).dataType
    // ONE shared hash(key, bucket) exchange for all three consumers of the
    // input (closings aggregate, distinct-times grid, data rows) — guide
    // §2.4. Each consumer previously re-ran the whole upstream scan +
    // aggregation because their column pruning differs (no exchange reuse);
    // now they all sit above the same shuffle, the closings and the
    // distinct-times aggregates run exchange-free on the clustering
    // (hash(key,bkt) clusters every (key,sid,bkt) and — because the bucket
    // is a function of t — every (key,t) group), and the scan runs once.
    val base = df.withColumn("_bkt", bk).repartition(col(K), col("_bkt"))
    // scalar max_by keeps this a map-side-combined HashAggregate (a struct
    // max_by would fall back to SortAggregate); groups are nonempty, so a
    // null closing can only mean "measured None" — the struct wrap below
    // re-establishes null-vs-absent on the tiny frame
    val sidClose = base
      .groupBy(col(K), col("sid"), col("_bkt"))
      .agg(max_by(col(V), col(T)).as("_lvv"))
    val withDefs = defaults match {
      case Some(d) =>
        sidClose.join(broadcast(d.select(col("sid").as("_ds"), col("default").as("_def"))),
          col("sid") <=> col("_ds"), "left").drop("_ds")
      case None => sidClose.withColumn("_def", constDefault.getOrElse(lit(null)).cast("double"))
    }
    // entry chain: windows + one explode, all on the tiny frame. The
    // explicit repartition(key) pins a partitioning that satisfies BOTH
    // window specs ((key) and (key, sid)), so the planner cannot pick
    // hash(key, sid) first and force a second tiny exchange.
    val wKAll = Window.partitionBy(K)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wSid = Window.partitionBy(K, "sid").orderBy("_bkt")
    // the bucket rides inside a struct: a bare collect_list SKIPS null
    // buckets (null t under a bucketBy), and the missing probe row would
    // make grid0's inner join silently drop every null-t time — the
    // fixed-K window path keeps such rows, so the dynamic grid must too.
    // Struct ordering sorts the null bucket FIRST, matching the nulls-
    // first asc order of wCarry and of the main merge window over t.
    val e0 = withDefs.repartition(col(K))
      .withColumn("_allB", sort_array(array_distinct(
        collect_list(struct(col("_bkt").as("b"))).over(wKAll))))
      .withColumn("_rn", row_number().over(wSid))
    // each (key, sid)'s FIRST row fans out one probe per grid bucket; every
    // row contributes its own closing. slice(.., 1, 0) is the empty array
    // of the right element type (when/otherwise must agree).
    val probeArr = transform(col("_allB"), b =>
      struct(b.getField("b").as("_eb"), lit(null).cast("struct<_lvv:double>").as("_cl"),
        lit(true).as("_pr")))
    val e1 = e0.select(col(K), col("sid"), col("_def"),
      element_at(col("_allB"), 1).getField("b").as("_b0"),
      explode(concat(
        array(struct(col("_bkt").as("_eb"), struct(col("_lvv")).as("_cl"), lit(false).as("_pr"))),
        when(col("_rn") === 1, probeArr).otherwise(slice(probeArr, 1, 0)))).as("_x"))
      .select(col(K), col("sid"), col("_def"), col("_b0"),
        col("_x").getField("_eb").as("_eb"), col("_x").getField("_cl").as("_cl"),
        col("_x").getField("_pr").as("_pr"))
    // probe-before-closing at equal bucket (_pr desc: true first) => a
    // bucket's entry sees strictly-earlier closings only
    val wCarry = Window.partitionBy(K, "sid")
      .orderBy(col("_eb").asc, col("_pr").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val entry = e1
      .withColumn("_pcs", last(col("_cl"), ignoreNulls = true).over(wCarry))
      .filter(col("_pr"))
      .select(col(K).as("_ek"), col("sid").as("_es"), col("_eb"),
        when(col("_pcs").isNull, col("_def")).otherwise(col("_pcs").getField("_lvv")).as("_pcv"),
        (col("_eb") <=> col("_b0")).as("_ofirst"))
      .withColumn("_nsid", count(lit(1)).over(Window.partitionBy("_ek", "_eb")))
    // distinct union times + per-bucket min time (entry-row emission point)
    // and row count (grid guard input). The per-bucket stats come from a
    // tiny aggregate joined back (AQE broadcasts it), NOT a window over
    // `times` — a (key, bucket) window would cost the frame an extra
    // exchange+sort. The distinct carries _bkt (a function of t, so it
    // changes nothing about which rows are distinct) to stay inside the
    // shared hash(key, bucket) clustering — zero exchanges on this branch.
    val timesD = base.select(col(K), col(T), col("_bkt")).distinct()
    val tStats = timesD.groupBy(col(K).as("_tk"), col("_bkt").as("_tb"))
      .agg(min(col(T)).as("_tmin"), count(lit(1)).as("_ntime"))
    val times = timesD
      .join(tStats, col(K) <=> col("_tk") && col("_bkt") <=> col("_tb"))
      .drop("_tk", "_tb")
    // lossless inner join: every grid bucket holds >= 1 time and every
    // time's bucket has entry rows (both derive from the same data buckets)
    val grid0 = times.join(entry, col(K) <=> col("_ek") && col("_bkt") <=> col("_eb"))
    val gridOk = lit(maxGridPerBucket <= 0) ||
      col("_ntime") * col("_nsid") <= lit(maxGridPerBucket)
    val tOut = when(gridOk, col(T)).otherwise(raise_error(concat(
      lit("dynamic-K merge grid for key="), col(K).cast("string"),
      lit(" bucket="), col("_bkt").cast("string"),
      lit(" would be "), (col("_ntime") * col("_nsid")).cast("string"),
      lit(s" rows (> maxGridPerBucket=$maxGridPerBucket); use a finer bucketBy," +
        s" raise maxGridPerBucket explicitly, or audit with mergeGridAudit"))).cast(tType))
    val mNull = lit(null).cast("struct<v:double>")
    val probeRow = struct(tOut.as(T), mNull.as("_m"), lit(1).as("_ord"), lit(false).as("_ent"))
    val entryRow = struct(lit(null).cast(tType).as(T),
      struct(col("_pcv").as(V)).as("_m"), lit(0).as("_ord"), lit(true).as("_ent"))
    val probes = grid0.select(
      col(K), col("_es").as("sid"), col("_bkt"), col("_ofirst"),
      explode(when(col(T) === col("_tmin"), array(entryRow, probeRow))
        .otherwise(array(probeRow))).as("_x"))
      .select(col(K), col("sid"), col("_bkt"), col("_ofirst"),
        col("_x").getField(T).as(T), col("_x").getField("_m").as("_m"),
        col("_x").getField("_ord").as("_ord"), col("_x").getField("_ent").as("_ent"),
        lit(false).as("_isd"))
    val dat = base.select(col(K), col("sid"), col("_bkt"), lit(false).as("_ofirst"),
      col(T), struct(col(V)).as("_m"), lit(0).as("_ord"), lit(false).as("_ent"),
      lit(true).as("_isd"))
    // THE one big exchange. Within each (key, sid, bucket): entry row first
    // (t null), then (t, data-before-probe) — the cumulative last() is the
    // as-of value, never null on probe rows (the entry row seeds it).
    val big = probes.unionByName(dat).repartition(col(K), col("_bkt"))
    val wCum = Window.partitionBy(K, "sid", "_bkt")
      .orderBy(col(T).asc_nulls_first, col("_ord").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    big
      .withColumn("_lm", last(col("_m"), ignoreNulls = true).over(wCum))
      .filter(!col("_isd"))
      .select(col(K), col("sid"), col(T), col("_bkt"),
        col("_lm").getField(V).as(V), col("_ent"), col("_ofirst"))
  }

  /** merge(compact=True) over the entry-row-carrying merged stream: each
    * (key, bucket)'s t=null row IS the bucket's opening merged value (the
    * state entering the bucket is the state at the last time of the
    * previous nonempty bucket — every data time is a grid time, so no
    * transition hides between them). A real row is kept when its value
    * differs from the previous row's, or when the previous row is the
    * opening row of the key's FIRST grid bucket (`_of`) — merge always
    * keeps the first merged point (set()'s len==0 short-circuit,
    * timeseries.py:187-191). Runs entirely inside the hash(key, bucket)
    * clustering — no exchange, no join. */
  private def compactMerged(merged: DataFrame): DataFrame = {
    val wB = Window.partitionBy(K, "_bkt").orderBy(col(T).asc_nulls_first)
    val prev = lag(struct(col(T).as("_pt"), col(V).as("_pv"), col("_of").as("_pof")), 1).over(wB)
    merged
      .withColumn("_prev", prev)
      .filter(col(T).isNotNull)
      .filter(
        when(col("_prev").getField("_pt").isNull,
          col("_prev").getField("_pof") || !(col("_prev").getField("_pv") <=> col(V)))
          .otherwise(!(col("_prev").getField("_pv") <=> col(V))))
      .select(col(K), col(T), col(V))
  }

  /** Dynamic-K `merge(operation=f)`: `f` maps the per-time state MAP
    * (sid -> latest value, every sid of the key present) to the merged
    * value; sids never touch the driver. Output compacted like
    * merge(compact=True) (first merged point always kept). Use
    * `map_values(state)` for vector-style operations
    * ([[ignorantMaxOf]] etc.). For aggregate-expressible operations prefer
    * [[mergeAggDynamic]], which never materializes the map. Grid-size
    * guard and `bucketBy` semantics as in [[iterMergeEntries]]. */
  def mergeOpDynamic(
      df: DataFrame,
      f: Column => Column,
      defaults: Option[DataFrame] = None,
      bucketBy: Option[Column] = None,
      maxGridPerBucket: Long = MAX_GRID_PER_BUCKET,
      constDefault: Option[Column] = None): DataFrame = {
    val e = dynamicEntries(df, defaults, bucketBy.getOrElse(lit(0L)), maxGridPerBucket, constDefault)
    // sids are unique per (key, t), so the sorted entry list is map-safe;
    // the t=null group is exactly the bucket's entry rows = opening state
    val merged = e
      .groupBy(col(K), col("_bkt"), col(T))
      .agg(map_from_entries(array_sort(collect_list(struct(col("sid"), col(V))))).as("_st"),
        max(when(col("_ent"), col("_ofirst"))).as("_of"))
      .select(col(K), col("_bkt"), col(T), f(col("_st")).cast("double").as(V), col("_of"))
    compactMerged(merged)
  }

  /** Dynamic-K merge for an AGGREGATE operation: `aggOf` builds a Spark
    * aggregate expression over the per-time state VALUES (e.g. `max(_)`,
    * `min(_)`, `avg(_)`, or a conditional-sum for strict semantics).
    * Cheaper than [[mergeOpDynamic]] — the state never materializes as a
    * map; each distinct time aggregates its K entry rows directly, with
    * map-side partial aggregation inside the (key, bucket) layout. Output
    * compacted like merge(compact=True). Grid-size guard and `bucketBy`
    * semantics as in [[iterMergeEntries]]. */
  def mergeAggDynamic(
      df: DataFrame,
      aggOf: Column => Column,
      defaults: Option[DataFrame] = None,
      bucketBy: Option[Column] = None,
      maxGridPerBucket: Long = MAX_GRID_PER_BUCKET,
      constDefault: Option[Column] = None): DataFrame = {
    val e = dynamicEntries(df, defaults, bucketBy.getOrElse(lit(0L)), maxGridPerBucket, constDefault)
    val merged = e
      .groupBy(col(K), col("_bkt"), col(T))
      .agg(aggOf(col(V)).cast("double").as(V),
        max(when(col("_ent"), col("_ofirst"))).as("_of"))
    compactMerged(merged)
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
