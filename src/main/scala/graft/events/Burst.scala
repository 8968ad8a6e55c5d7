package graft.events

import graft.core.SeriesOps.{K, T}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kleinberg 2-state burst detection (Kleinberg, "Bursty and
  * Hierarchical Structure in Streams", KDD 2002 — public), EXACT and
  * distributed: per key, the optimal (Viterbi) state sequence of the
  * 2-state automaton over the inter-event gaps — state 0 emits gaps at
  * the key's base rate λ₀ = m/T (m gaps over span T), state 1 at
  * s·λ₀, entering state 1 costs γ·ln m. Unlike the usual sequential
  * Viterbi, BOTH dynamic programs (forward cost-to-reach and backward
  * cost-to-finish) are min-plus (tropical) 2×2 matrix scans — matrix
  * products in the (min, +) semiring are associative, so they
  * distribute on the [[graft.regularize.Regularize.holt]] two-level
  * plan: per-(key, bucket) linear UDF passes emit in-bucket prefix
  * products, tiny per-bucket nets fold across buckets in one
  * aggregate() HOF, rows finish with two column-expression
  * matrix-vector applications. A gap is marked bursty iff the best
  * path THROUGH state 1 at that gap strictly beats the best through
  * state 0 (F₁+H₁ < F₀+H₀) — the conservative marking: ties (possible
  * in integer costs) resolve to the base state, and where the optimum
  * is unique this IS the Viterbi path.
  *
  * Engine-exactness (why this scan family member gets a DuckDB oracle
  * where EWMA/Holt are rows-only): all costs are INTEGERS. The
  * state-independent part of each emission cancels (argmin paths are
  * invariant under per-position offsets), leaving for s = 2 the
  * relative cost r = SCALE·x·m div T − SCALE·ln 2, where the first
  * term is exact integer arithmetic (128-bit product, floor division —
  * gaps are nonnegative) and SCALE·ln 2 is the HARDCODED literal
  * 726817 (no runtime transcendental). The up-transition cost
  * γ·ln m·SCALE rounds once per key. Min-plus over longs is fully
  * associative — no float reassociation anywhere. Bounds: Σ r ≤
  * SCALE·m + m·726817 and up-costs ≤ (m/2)·γ·ln m·SCALE — ≪ 2⁶² for
  * any m this side of 10¹²; the ∞ sentinel 2⁶¹−ish never accumulates
  * twice (every product of ≥ 1 step matrix is finite).
  *
  * Output one row per gap: (key, t0, t1, gap_us, burst 0/1).
  */
object Burst {

  final val SCALE = graft.core.Quant.Scale // 2^20 cost quantum
  final val LN2S = 726817L // round(SCALE * ln 2) — hardcoded, no libm
  final val INF = Long.MaxValue / 4

  private type Mat = (Long, Long, Long, Long)
  private type Row = (Long, Long) // (t1, r)

  /** In-bucket min-plus scan: rows (t, r) in PROCESSING order plus the
    * constant up-cost; emits per row the running products BEFORE and
    * AFTER applying the row's own step matrix (before/after are what
    * the backward/forward faces respectively need; the net for the
    * cross-bucket fold is the last AFTER). `transposed = false` builds
    * M = [[0,0],[up+r, r]] (forward: P ← M ⊗ P); `true` builds Mᵀ
    * (backward: Q ← Mᵀ ⊗ Q). Identity = [[0,∞],[∞,0]]. */
  private def scanUdf(transposed: Boolean) =
    udf((arr: Seq[Row], up: Long) => {
      var p00 = 0L; var p01 = INF; var p10 = INF; var p11 = 0L
      arr.map { case (t, r) =>
        val b = (p00, p01, p10, p11)
        val (n00, n01, n10, n11) =
          if (!transposed)
            // M ⊗ P with M = [[0, 0], [up+r, r]]
            (math.min(p00, p10), math.min(p01, p11),
              math.min(up + r + p00, r + p10),
              math.min(up + r + p01, r + p11))
          else
            // Mᵀ ⊗ Q with Mᵀ = [[0, up+r], [0, r]]
            (math.min(p00, up + r + p10), math.min(p01, up + r + p11),
              math.min(p00, r + p10), math.min(p01, r + p11))
        p00 = n00; p01 = n01; p10 = n10; p11 = n11
        (t, b._1, b._2, b._3, b._4, n00, n01, n10, n11)
      }
    })

  private val fwdScan = scanUdf(transposed = false)
  private val revScan = scanUdf(transposed = true)

  /** See object doc. `events`: rows (key, t); duplicates collapse (an
    * EventSeries' simultaneous events open no gap). `s` is fixed at 2
    * (the cost algebra hardcodes ln 2 for exactness); `gamma` is
    * Kleinberg's burst-entry weight; `bucketMicros` is the two-level
    * width knob (result is bucketing-invariant, spec-checked). */
  def kleinbergBursts(
      events: DataFrame,
      gamma: Double = 1.0,
      bucketMicros: Long = 7L * 86400000000L): DataFrame = {
    require(gamma > 0, s"gamma $gamma must be positive")
    require(bucketMicros > 0, s"bucketMicros $bucketMicros must be positive")
    val wk = Window.partitionBy(col(K)).orderBy(col(T).asc)
    val dec = "decimal(38,0)"
    val pts = events.select(col(K), col(T)).distinct()
    val stats = pts.groupBy(col(K).as("_sk"))
      .agg((count(lit(1)) - 1).as("_m"),
        (max(col(T)) - min(col(T))).as("_T"))
      .filter(col("_m") >= 1 && col("_T") > 0)
      .withColumn("_up",
        floor(log(col("_m").cast("double")) * gamma * SCALE + 0.5)
          .cast("long"))
    val gaps = pts
      .withColumn("_t0", lag(col(T), 1).over(wk))
      .filter(col("_t0").isNotNull)
      .join(stats, col(K) <=> col("_sk"))
      .withColumn("_x", col(T) - col("_t0"))
      // r = SCALE·x·m div T − SCALE·ln2, exact via decimal(38,0)
      .withColumn("_r",
        expr(s"CAST((CAST($SCALE AS DECIMAL(38,0)) * _x * _m) DIV _T AS LONG)")
          - LN2S)
      .withColumn("_bkt", floor(col(T) / bucketMicros).cast("long"))
    val arrs = gaps
      .groupBy(col(K), col("_bkt"))
      .agg(sort_array(collect_list(struct(
        col(T).as("_1"), col("_r").as("_2"),
        col("_t0").as("_t0"), col("_x").as("_x")))).as("_arr"),
        first(col("_up")).as("_up"))
      .withColumn("_in",
        expr("transform(_arr, e -> struct(e._1 as _1, e._2 as _2))"))
      .withColumn("_f", fwdScan(col("_in"), col("_up")))
      .withColumn("_v", reverse(revScan(reverse(col("_in")), col("_up"))))
      .drop("_in")
    // cross-bucket folds over per-bucket NET products (tiny frames):
    // forward seeds the start-in-state-0 vector (0, ∞) and applies nets
    // ascending; backward seeds the free-finish (0, 0) and applies nets
    // descending. BOTH folds run off ONE nets frame and ONE groupBy —
    // two separate fold pipelines would re-evaluate the scan aggregate
    // above its reused exchange a second time and then need a
    // carry-vs-carry join; here the forward out-array (ascending) and
    // the reversed backward out-array align positionally by bucket, so
    // arrays_zip IS the join.
    def foldSql(arrExpr: String, fld: String, seed0: Long, seed1: Long) =
      s"""aggregate(
            $arrExpr,
            struct(cast($seed0 as bigint) as u0,
                   cast($seed1 as bigint) as u1,
                   cast(array() as array<struct<b:bigint,
                     c0:bigint, c1:bigint>>) as out),
            (acc, e) -> struct(
              least(e.$fld.m00 + acc.u0, e.$fld.m01 + acc.u1) as u0,
              least(e.$fld.m10 + acc.u0, e.$fld.m11 + acc.u1) as u1,
              array_append(acc.out,
                struct(e._nb as b, acc.u0 as c0, acc.u1 as c1)) as out),
            acc -> acc.out)"""
    def netOf(arr: org.apache.spark.sql.Column, idx: org.apache.spark.sql.Column) = {
      val e = element_at(arr, idx)
      struct(e.getField("_6").as("m00"), e.getField("_7").as("m01"),
        e.getField("_8").as("m10"), e.getField("_9").as("m11"))
    }
    val carries = arrs
      .select(col(K).as("_nk"), col("_bkt").as("_nb"),
        netOf(col("_f"), size(col("_f"))).as("_nf"),
        netOf(col("_v"), lit(1)).as("_nr"))
      .groupBy(col("_nk"))
      .agg(sort_array(collect_list(
        struct(col("_nb"), col("_nf"), col("_nr")))).as("_ns"))
      .select(col("_nk"), explode(arrays_zip(
        expr(foldSql("_ns", "_nf", 0L, INF)),
        reverse(expr(foldSql("reverse(_ns)", "_nr", 0L, 0L))))).as("_c"))
      .select(col("_nk"), col("_c")("0")("b").as("_cb"),
        col("_c")("0")("c0").as("_u0"), col("_c")("0")("c1").as("_u1"),
        col("_c")("1")("c0").as("_c0"), col("_c")("1")("c1").as("_c1"))
    arrs
      .select(col(K), col("_bkt"),
        explode(arrays_zip(col("_arr"), col("_f"), col("_v"))).as("_z"))
      .select(col(K), col("_bkt"),
        col("_z._arr._t0").as("t0"), col("_z._arr._1").as("t1"),
        col("_z._arr._x").as("gap_us"),
        col("_z._f._6").as("_p00"), col("_z._f._7").as("_p01"),
        col("_z._f._8").as("_p10"), col("_z._f._9").as("_p11"),
        col("_z._v._2").as("_q00"), col("_z._v._3").as("_q01"),
        col("_z._v._4").as("_q10"), col("_z._v._5").as("_q11"))
      .join(carries,
        col(K) <=> col("_nk") && col("_bkt") === col("_cb"))
      .withColumn("_f0", least(col("_p00") + col("_u0"), col("_p01") + col("_u1")))
      .withColumn("_f1", least(col("_p10") + col("_u0"), col("_p11") + col("_u1")))
      .withColumn("_h0", least(col("_q00") + col("_c0"), col("_q01") + col("_c1")))
      .withColumn("_h1", least(col("_q10") + col("_c0"), col("_q11") + col("_c1")))
      .select(col(K), col("t0"), col("t1"), col("gap_us"),
        (col("_f1") + col("_h1") < col("_f0") + col("_h0"))
          .cast("long").as("burst"))
  }
}
