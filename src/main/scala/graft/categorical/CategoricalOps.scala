package graft.categorical

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** String-valued ("categorical") series — the value-typed face of the
  * engine. The reference's TimeSeries holds arbitrary hashable values
  * (traces/timeseries.py:47 accepts any `data`; the README's canonical
  * example is a boolean/state series), and `distribution()` over such a
  * series is the time-in-state histogram (traces/histogram.py keys the
  * histogram by the measurement VALUE, numeric or not). The double-typed
  * operators in [[graft.core.SeriesOps]] cover the numeric surface; this
  * module covers states: points are (key, t: long epoch-µs, sv: string)
  * and every op uses previous-value interpolation, the reference default.
  *
  * Scale shapes: everything here is one lead/last window per key — the
  * same single hash(key) exchange as the numeric segment family; the
  * aggregated state tables (keys × distinct states) are small by the
  * nature of categorical data, so the normalizing window runs over the
  * post-aggregation frame, never over raw points.
  */
object CategoricalOps {

  /** Value-typed segments: (key, t0, t1, sv) — iterperiods
    * (traces/timeseries.py:589) for a string-valued series; the last
    * point opens no segment. */
  def segments(points: DataFrame, valueCol: String = "sv"): DataFrame = {
    val w = Window.partitionBy("key").orderBy("t")
    points
      .select(col("key"), col("t").as("t0"), lead(col("t"), 1).over(w).as("t1"), col(valueCol))
      .filter(col("t1").isNotNull)
  }

  /** Time-in-state distribution per key: the categorical
    * `distribution()` (traces/timeseries.py:877 with previous
    * interpolation over [first, last)). Returns (key, sv, dur_us, frac)
    * with frac = dur_us / Σ dur_us per key, rounded to 6 places
    * (histogram.normalize, traces/histogram.py). dur_us stays exact µs —
    * the reference's `normalized=False` seconds reading is dur_us/1e6. */
  def stateDistribution(points: DataFrame, valueCol: String = "sv"): DataFrame = {
    val durs = segments(points, valueCol)
      .groupBy(col("key"), col(valueCol))
      .agg(sum(col("t1") - col("t0")).as("dur_us"))
    durs.select(col("key"), col(valueCol), col("dur_us"),
      round(col("dur_us").cast("double") / sum("dur_us").over(Window.partitionBy("key")), 6)
        .as("frac"))
  }

  /** Consecutive state pairs aggregated into a transition-count table
    * (from_state, to_state, n) — `iterintervals(2)`
    * (traces/timeseries.py:631) over a state series, counted across all
    * keys; self-transitions (repeated measurements of the same state)
    * count too, exactly as iterintervals yields them. */
  def transitions(points: DataFrame, valueCol: String = "sv"): DataFrame = {
    val w = Window.partitionBy("key").orderBy("t")
    points
      .select(col(valueCol).as("from_state"), lead(col(valueCol), 1).over(w).as("to_state"))
      .filter(col("to_state").isNotNull)
      .groupBy("from_state", "to_state")
      .agg(count(lit(1)).as("n"))
  }

  /** Markov next-state baseline: for each current state, the modal next
    * state and its hit rate — the zero-parameter sequence predictor
    * every fancier model must beat, read straight off [[transitions]].
    * Ties break to the lexicographically smallest next state. All
    * counts exact; one division per row. Output (from_state, top_next,
    * n_top, n_total, hit_rate). */
  def markovBaseline(points: DataFrame, valueCol: String = "sv"): DataFrame = {
    val tr = transitions(points, valueCol)
    tr.groupBy(col("from_state"))
      .agg(sum(col("n")).as("n_total"),
        min(struct((-col("n")).as("_nn"), col("to_state").as("_ts")))
          .as("_m"))
      .select(col("from_state"), col("_m").getField("_ts").as("top_next"),
        (-col("_m").getField("_nn")).as("n_top"), col("n_total"),
        round((-col("_m").getField("_nn")).cast("double")
          / col("n_total"), 6).as("hit_rate"))
  }

  /** Dwell (run-length) statistics per (key, state): how LONG the series
    * stays in a state each time it enters it — the run-length complement
    * of [[stateDistribution]] (which only sums total time-in-state) and
    * [[transitions]] (which only counts entries). Consecutive repeated
    * measurements of the same state merge into one run (`compact`
    * semantics, traces/timeseries.py:187-191); a run lasts from its first
    * measurement to the NEXT distinct state's first measurement; the last
    * run of each key is unterminated and excluded, exactly like the open
    * final segment in [[segments]]. Output (key, sv, n_runs, total_us,
    * max_run_us, mean_run_us) — all engine-exact: the mean is a single
    * IEEE division of exact long µs, the rest stay longs.
    *
    * Scale: one lag + one running-sum window per key (single hash(key)
    * exchange, both windows share the sort), then a (key, state, run)
    * aggregate whose groups collapse map-side — no join, no second
    * shuffle beyond the final (key, sv) aggregate. */
  def dwellStats(points: DataFrame, valueCol: String = "sv"): DataFrame = {
    val ord = Window.partitionBy("key").orderBy("t")
    val run = Window.partitionBy("key").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sv = col(valueCol)
    val runs = points
      // null-safe <=>: a null state is a legitimate value and must not
      // glue two distinct runs together; the first row always opens a run
      .withColumn("_run", sum(when(row_number().over(ord) === 1, 1L)
        .otherwise(when(lag(sv, 1).over(ord) <=> sv, 0L).otherwise(1L))).over(run))
    val perRun = runs
      .groupBy(col("key"), col("_run"))
      .agg(first(sv).as(valueCol), min(col("t")).as("_r0"))
    val next = Window.partitionBy("key").orderBy("_r0")
    perRun
      .withColumn("_r1", lead(col("_r0"), 1).over(next))
      .filter(col("_r1").isNotNull) // final run is unterminated
      .groupBy(col("key"), col(valueCol))
      .agg(
        count(lit(1)).as("n_runs"),
        sum(col("_r1") - col("_r0")).as("total_us"),
        max(col("_r1") - col("_r0")).as("max_run_us"),
        // deliberately NOT round(…, 6): the mean is one IEEE division of
        // exact longs (bit-identical in any engine), and at µs magnitudes
        // ~1e11 a multiply-based round(x·1e6)/1e6 overflows 2^53 and
        // CORRUPTS the value instead of cleaning it
        (sum(col("_r1") - col("_r0")).cast("double") / count(lit(1)))
          .as("mean_run_us"))
  }

  /** Conditional entropy rate of the state sequence per key:
    * H(X_t | X_{t-1}) in bits — how unpredictable the NEXT state is
    * given the current one. The information-theoretic summary of the
    * transition table: 0 for a deterministic cycle, log2(#states) for
    * an i.i.d. uniform sequence; [[markovBaseline]]'s hit rate is the
    * argmax view of the same conditional distribution, this is its
    * entropy view.
    *
    *   H = −Σ_{a,b} p(a,b)·log2 p(b|a)
    *     = (1/N)·Σ_{a,b} n_ab·(ln n_a − ln n_ab) / ln 2
    *
    * Engine-exactness: bigram counts are exact integers; each ln is
    * quantized to the 2^20 grid (the [[graft.events.Burst]] Viterbi
    * convention — `floor(ln(x)·2^20 + 0.5)` as a long), so the sum of
    * per-bigram terms is EXACT long arithmetic, order-independent
    * under parallel aggregation; only the final divide chain touches
    * floats. Quantization error is < |pairs|·2^-20 nats before the
    * divide — invisible at the 1e-6 output grid for real tables.
    *
    * Output (key, n_transitions, n_bigrams, entropy_bits); keys with
    * no transition (a single measurement) emit nothing, like the
    * unterminated final run in [[dwellStats]].
    *
    * Scale: one lead window per key (single hash(key) exchange), a
    * (key, a, b) count whose groups collapse map-side, one
    * per-(key, a) window over the POST-aggregation bigram frame
    * (bounded by states², not data), and a final per-key aggregate. */
  def entropyRate(points: DataFrame, valueCol: String = "sv"): DataFrame = {
    val w = Window.partitionBy("key").orderBy("t")
    def qln(c: Column): Column = graft.core.Quant.qln20(c)
    val bigrams = points
      .select(col("key"), col(valueCol).as("_a"),
        lead(col(valueCol), 1).over(w).as("_b"))
      .filter(col("_b").isNotNull)
      .groupBy(col("key"), col("_a"), col("_b"))
      .agg(count(lit(1)).as("_nab"))
    val terms = bigrams
      .withColumn("_na", sum(col("_nab")).over(Window.partitionBy("key", "_a")))
      .select(col("key"), col("_nab"),
        (col("_nab") * (qln(col("_na")) - qln(col("_nab")))).as("_q"))
    terms.groupBy(col("key"))
      .agg(sum(col("_nab")).as("n_transitions"),
        count(lit(1)).as("n_bigrams"),
        sum(col("_q")).as("_qsum"))
      .select(col("key"), col("n_transitions"), col("n_bigrams"),
        round(col("_qsum").cast("double") / lit(1048576.0)
          / col("n_transitions").cast("double")
          / lit(0.6931471805599453), 6).as("entropy_bits"))
  }

  /** Trigram motif surprise — the sequence-mining face of the Markov
    * family: for every state trigram (a,b,c) seen at least `minN`
    * times across all keys' chains, the lift of its completion over
    * the first-order baseline,
    *
    *   lift = P(c | a,b) / P(c | b) = n_abc·n_b / (n_ab·n_bc)
    *
    * with n_ab/n_bc the [[transitions]] counts and n_b = Σ_c n_bc
    * (transitions out of b). lift ≫ 1 marks a second-order motif the
    * Markov-1 model ([[markovBaseline]], [[entropyRate]]) cannot see;
    * lift ≪ 1 an anti-pattern. Output the top-`k` by lift
    * (ties → lexicographic (a,b,c)): (a, b, c, n_abc, n_ab, n_bc,
    * n_b, lift).
    *
    * Engine-exactness: all four counts are exact; lift is ONE double
    * division of two exact long products (each < 2^63 — counts are
    * transition-table sized). Selection is a TakeOrdered top-k on the
    * (lift, a, b, c) total order — no window, no global sort.
    *
    * Scale: two lead windows per key share one hash(key) exchange;
    * trigram/bigram tables collapse map-side and are states³-bounded;
    * the joins against bigram/unigram totals are broadcast
    * (model-sized). */
  def motifSurprise(points: DataFrame, k: Int = 20, minN: Long = 5,
      valueCol: String = "sv"): DataFrame = {
    val w = Window.partitionBy("key").orderBy("t")
    val sv = col(valueCol)
    // ONE window projection feeds both n-gram tables — bigrams are the
    // b-non-null pairs of the same leads frame (≡ [[transitions]]), so
    // the per-key sort runs once, not twice
    val leads = points.select(sv.as("a"), lead(sv, 1).over(w).as("b"),
      lead(sv, 2).over(w).as("c"))
    val tri = leads
      .filter(col("b").isNotNull && col("c").isNotNull)
      .groupBy(col("a"), col("b"), col("c"))
      .agg(count(lit(1)).as("n_abc"))
    val bi = leads
      .filter(col("b").isNotNull)
      .groupBy(col("a").as("from_state"), col("b").as("to_state"))
      .agg(count(lit(1)).as("n"))
    val uni = bi.groupBy(col("from_state").as("_ub"))
      .agg(sum(col("n")).as("n_b"))
    tri
      .join(broadcast(bi.select(col("from_state").as("_a1"),
        col("to_state").as("_b1"), col("n").as("n_ab"))),
        col("a") <=> col("_a1") && col("b") <=> col("_b1"))
      .join(broadcast(bi.select(col("from_state").as("_b2"),
        col("to_state").as("_c2"), col("n").as("n_bc"))),
        col("b") <=> col("_b2") && col("c") <=> col("_c2"))
      .join(broadcast(uni), col("b") <=> col("_ub"))
      .filter(col("n_abc") >= minN)
      .select(col("a"), col("b"), col("c"), col("n_abc"), col("n_ab"),
        col("n_bc"), col("n_b"),
        round((col("n_abc") * col("n_b")).cast("double")
          / (col("n_ab") * col("n_bc")).cast("double"), 6).as("lift"))
      .orderBy(col("lift").desc, col("a").asc, col("b").asc, col("c").asc)
      .limit(k)
  }

  /** Previous-interpolated state at regular grid times — `sample()`
    * (traces/timeseries.py:1409) for a string-valued series. Grid times
    * before a key's first measurement carry the default (null), like
    * get() before the first point. Implemented with the union-grid trick:
    * grid rows ride the same hash(key) exchange as the data and pick up
    * the last preceding state via one ignore-nulls window — no join, no
    * per-key loop; `keys` (the distinct key frame) is usually the cheap
    * distinct of the points' keys. */
  def sampleStates(
      points: DataFrame,
      keys: DataFrame, // single column: key
      start: Long,
      end: Long,
      freqUs: Long,
      valueCol: String = "sv"): DataFrame = {
    val spark = points.sparkSession
    require(freqUs > 0, s"sampleStates: freqUs must be positive, got $freqUs")
    // Long arithmetic throughout: an Int cast would silently wrap on fine
    // grids over long spans (spark.range takes Long)
    val nGrid = (end - start) / freqUs + 1
    // deliberate keys × grid expansion (that IS the output domain); the
    // grid side is lit-range tiny, so this plans as a broadcast expansion
    val grid = keys
      .crossJoin(spark.range(nGrid).select((lit(start) + col("id") * freqUs).as("t")))
    // data rows sort before grid rows at the same t (_g = 0 first), so a
    // grid point AT a measurement time sees that measurement — get()'s
    // inclusive previous lookup
    val unioned = points
      .select(col("key"), col("t"), col(valueCol), lit(0).as("_g"))
      .unionByName(grid.select(col("key"), col("t"), lit(null).cast("string").as(valueCol),
        lit(1).as("_g")))
    val w = Window.partitionBy("key").orderBy(col("t"), col("_g"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_sv", last(col(valueCol), ignoreNulls = true).over(w))
      .filter(col("_g") === 1)
      .select(col("key"), col("t"), col("_sv").as(valueCol))
  }
}
