package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005): per group, a d×w
  * counter grid where every item increments one cell per hash row; a
  * point query reads the MINIMUM of its d cells — an overestimate,
  * never an underestimate, with error ≤ εN at probability 1−δ for
  * w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉. The frequency-sketch complement to
  * [[Kmv]]'s distinct-count sketch in the retention tiers: the sketch
  * is LINEAR (cell-wise addition), so a daily sketch summed from 24
  * hourly sketches is bit-identical to one built from the raw day —
  * the continuous-aggregate property, by linearity rather than KMV's
  * order statistics.
  *
  * The grid is materialized as ROWS (group*, r, c, cnt), never as a
  * driver-side array: counters aggregate with a plain hash groupBy
  * (map-side combine absorbs hot items), merges are a re-keyed sum,
  * lookups are an equi-join on 12-byte keys. Zero cells are absent
  * rows — a group's storage is min(d·w, d·n_distinct), and lookup
  * coalesces misses to 0.
  *
  * Hashes are salted md5 on the engine-portable `unitHash` convention,
  * so sketches, merges and estimates replay bit-for-bit in the DuckDB
  * oracle — no tolerance band.
  */
object CountMin {

  /** Row-r column index for a value: the shared [[Kmv.hash60]] 60-bit
    * md5 grid (ONE oracle-parity-critical hash recipe in the codebase),
    * salted per row, mod w. */
  def hashAt(c: Column, r: Int, w: Int): Column =
    Kmv.hash60(c, s"cm$r:") % w

  /** Build per-group sketches: one count cell per (group, r, c) touched.
    * Counts ITEMS (rows), the CMS contract — dedupe upstream to count
    * distinct-ish things. Output (groupCols*, r, c, cnt). */
  def sketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
      d: Int = 4, w: Int = 256): DataFrame = {
    require(d >= 1, s"d=$d must be >= 1")
    require(w >= 2, s"w=$w must be >= 2")
    val cells = array((0 until d).map(r =>
      struct(lit(r).as("r"), hashAt(col(valueCol), r, w).as("c"))): _*)
    df.select(groupCols.map(col) :+ explode(cells).as("_rc"): _*)
      .select(groupCols.map(col) :+ col("_rc.r").as("r") :+ col("_rc.c").as("c"): _*)
      .groupBy(groupCols.map(col) :+ col("r") :+ col("c"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Lossless merge to a coarser key by linearity: cell-wise sum. */
  def merge(sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    sketches.groupBy(groupCols.map(col) :+ col("r") :+ col("c"): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Point queries: probes carry (groupCols*, valueCol); each explodes to
    * its d cells, left-joins the sketch, and reports the min cell count
    * (missing cell = 0 ⇒ estimate 0 = definitely absent). Output
    * (groupCols*, valueCol, est_n). */
  def lookup(sketch: DataFrame, groupCols: Seq[String], probes: DataFrame,
      valueCol: String, d: Int = 4, w: Int = 256): DataFrame = {
    val cells = array((0 until d).map(r =>
      struct(lit(r).as("r"), hashAt(col(valueCol), r, w).as("c"))): _*)
    val pr = probes
      .select((groupCols :+ valueCol).map(col) :+ explode(cells).as("_rc"): _*)
      .select((groupCols :+ valueCol).map(col) :+
        col("_rc.r").as("_pr") :+ col("_rc.c").as("_pc"): _*)
    val sk = sketch.select(
      groupCols.map(n => col(n).as(s"_s_$n")) ++
        Seq(col("r"), col("c"), col("cnt")): _*)
    val cond = groupCols.map(n => pr(n) <=> sk(s"_s_$n"))
      .reduce(_ && _) && pr("_pr") === sk("r") && pr("_pc") === sk("c")
    pr.join(sk, cond, "left")
      .groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_n"))
  }
}
