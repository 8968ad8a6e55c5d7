package graft

import graft.agg.AggOps
import graft.ann.Ann
import graft.chunk.ChunkOps
import graft.core.SeriesOps
import graft.dedup.Dedup
import graft.events.EventOps
import graft.merge.MergeOps
import graft.multimodal.Multimodal
import graft.regularize.Regularize
import graft.rollup.Rollup
import graft.stats.StatsOps
import graft.text.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The driver-facing query battery: one entry per implemented operator
  * (SURVEY.md §2 inventory + training-data ops), each with a DuckDB oracle
  * over the same parquet tables.
  *
  * Conventions for oracle parity:
  *  - time = epoch µs (exact longs); durations exact; only final
  *    means/ratios are doubles, rounded to 6 digits on BOTH sides.
  *  - all cross-engine hashing is md5-based (identical in Spark & DuckDB).
  *  - column names/aliases match the SQL exactly (driver hashes by name).
  */
object GraftQueries {

  final val HOUR = 3600000000L
  final val DAY = 86400000000L
  final val WEEK = 7 * DAY
  final val WEEK_SHIFT = 4 * DAY // epoch day 0 is a Thursday; Monday alignment

  // ---------- loaders ----------

  /** events -> series points (key = event_type, t = µs, v = value), with
    * SortedDict overwrite semantics for duplicate (key, t): keep max(v)
    * (deterministic in any engine). */
  def points(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .parquet(s"$dir/events.parquet")
      .groupBy(col("event_type").as("key"), tsUs.as("t"))
      .agg(max("value").as("v"))

  def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  def embeddings(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  def bounds(pts: DataFrame): (Long, Long) = {
    val r = pts.agg(min("t"), max("t")).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Exact (min, max) event time of the sf directory, served from the
    * parquet FOOTER statistics — manual aggregate pushdown (guide §6:
    * min/max should come from scan metadata, not a scan). 29 queries run
    * `bounds(points(...))` at build time, each paying a scan + two
    * aggregate stages for two longs; the value is identical by
    * construction — grouping never changes the min/max of its own group
    * key, `unix_micros` is monotone, the `ts` column is physical INT64
    * micros, and parquet int64 statistics are exact (no truncation).
    * Falls back to the scan aggregate whenever any row group lacks
    * statistics, the column is missing, or the path is not one footer. */
  def eventBounds(spark: SparkSession, dir: String): (Long, Long) = {
    try {
      val conf = spark.sparkContext.hadoopConfiguration
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(s"$dir/events.parquet"), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val blocks = r.getFooter.getBlocks
        var mn = Long.MaxValue
        var mx = Long.MinValue
        var ok = !blocks.isEmpty
        val bit = blocks.iterator()
        while (ok && bit.hasNext) {
          var found = false
          val cit = bit.next().getColumns.iterator()
          while (!found && cit.hasNext) {
            val c = cit.next()
            if (c.getPath.toDotString == "ts") {
              found = true
              c.getStatistics match {
                case st: org.apache.parquet.column.statistics.LongStatistics
                    if st.hasNonNullValue =>
                  mn = math.min(mn, st.getMin)
                  mx = math.max(mx, st.getMax)
                case _ => ok = false
              }
            }
          }
          if (!found) ok = false
        }
        if (ok) return (mn, mx)
      } finally r.close()
    } catch { case scala.util.control.NonFatal(_) => () }
    val row = spark.read.parquet(s"$dir/events.parquet")
      .agg(min(tsUs), max(tsUs)).head()
    (row.getLong(0), row.getLong(1))
  }

  private val nullD = lit(null).cast("double")

  /** Skew-safe bucket for the constant-key merge family: the reference's
    * global merge/count_active/difference results have ONE key, so their
    * running windows would otherwise collapse onto a single task
    * (round-1 verdict "What's wrong" #1). Day buckets spread the work;
    * BucketedOps' handoff keeps the output identical. */
  private def dayBucket: Option[org.apache.spark.sql.Column] =
    Some(floor(col("t") / DAY).cast("long"))

  /** Constant merge key, derived NON-foldably: a plain lit("all") gets
    * constant-folded out of window partition specs, so even the tiny
    * per-bucket handoff window of BucketedOps would print WindowExec's
    * "No Partition Defined" warning. Appending an empty slice of a real
    * column keeps the value constant but the expression data-dependent,
    * so the partition spec (and the warning-free plan) survives. */
  private def constKey(name: String, from: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(lit(name), coalesce(substring(from, 1, 0), lit("")))

  /** epoch µs of the events timestamp; the driver parquet carries
    * TIMESTAMP_NTZ, interpreted as UTC (session TZ) — identical to
    * DuckDB's epoch_us over the same file. */
  private def tsUs = unix_micros(col("ts").cast("timestamp"))

  /** The shared oracle CTE: points, global bounds, and reference-style
    * segments over [tmin, tmax) (the last point opens no segment; each
    * key's pre-first stretch is a null-valued segment). */
  private def sqlPrefix(gPre: Long = 0L, gPost: Long = 0L): String =
    s"""WITH pts AS (
       |  SELECT event_type AS key, epoch_us(ts) AS t, max(value) AS v
       |  FROM events GROUP BY 1, 2),
       |b AS (SELECT min(t) AS tmin, max(t) AS tmax FROM pts),
       |segs AS (
       |  SELECT key, t AS t0,
       |         coalesce(lead(t) OVER (PARTITION BY key ORDER BY t),
       |                  (SELECT tmax + $gPost FROM b)) AS t1,
       |         v, t AS ot,
       |         lead(t) OVER (PARTITION BY key ORDER BY t) IS NULL AS lst
       |  FROM pts
       |  UNION ALL
       |  SELECT key, (SELECT tmin - $gPre FROM b), min(t), NULL, NULL, FALSE
       |  FROM pts GROUP BY key
       |)""".stripMargin

  // ---------- time-series core queries ----------

  def qSegments(spark: SparkSession, dir: String): DataFrame =
    SeriesOps.segments(points(spark, dir)).select("key", "t0", "t1", "v")

  val sqlSegments: String =
    """WITH pts AS (
      |  SELECT event_type AS key, epoch_us(ts) AS t, max(value) AS v
      |  FROM events GROUP BY 1, 2)
      |SELECT key, t AS t0, lead(t) OVER (PARTITION BY key ORDER BY t) AS t1, v
      |FROM pts QUALIFY t1 IS NOT NULL""".stripMargin

  def qCompact(spark: SparkSession, dir: String): DataFrame =
    SeriesOps.compact(
      points(spark, dir).withColumn("v", floor(col("v") / 50).cast("double")))

  val sqlCompact: String =
    """WITH pts AS (
      |  SELECT event_type AS key, epoch_us(ts) AS t,
      |         CAST(floor(max(value) / 50) AS DOUBLE) AS v
      |  FROM events GROUP BY 1, 2),
      |l AS (SELECT key, t, v,
      |        lag(v) OVER (PARTITION BY key ORDER BY t) AS pv,
      |        row_number() OVER (PARTITION BY key ORDER BY t) AS rn
      |      FROM pts)
      |SELECT key, t, v FROM l WHERE rn = 1 OR pv IS DISTINCT FROM v""".stripMargin

  def qSamplePrev(spark: SparkSession, dir: String): DataFrame = {
    val pts = points(spark, dir)
    val (tmin, tmax) = eventBounds(spark, dir)
    Regularize.samplePrevious(pts, Regularize.gridSeq(pts, tmin, tmax, HOUR), nullD)
  }

  val sqlSamplePrev: String =
    sqlPrefix() +
      s""", grid AS (
         |  SELECT key, gt FROM (SELECT DISTINCT key FROM pts),
         |    unnest(generate_series((SELECT tmin FROM b), (SELECT tmax FROM b), $HOUR)) g(gt))
         |SELECT g.key AS key, g.gt AS t, p.v AS v
         |FROM grid g ASOF LEFT JOIN pts p ON g.key = p.key AND g.gt >= p.t""".stripMargin

  def qSampleLinear(spark: SparkSession, dir: String): DataFrame = {
    val pts = points(spark, dir)
    val (tmin, tmax) = eventBounds(spark, dir)
    Regularize.sampleLinear(pts, Regularize.gridSeq(pts, tmin, tmax, HOUR), nullD)
      .withColumn("v", round(col("v"), 6))
  }

  val sqlSampleLinear: String =
    sqlPrefix() +
      s""", grid AS (
         |  SELECT key, gt FROM (SELECT DISTINCT key FROM pts),
         |    unnest(generate_series((SELECT tmin FROM b), (SELECT tmax FROM b), $HOUR)) g(gt))
         |SELECT g.key AS key, g.gt AS t,
         |  round(CASE WHEN p.t IS NULL THEN NULL
         |             WHEN n.t IS NULL THEN p.v
         |             ELSE p.v + (g.gt - p.t) / (n.t - p.t) * (n.v - p.v) END, 6) AS v
         |FROM grid g
         |ASOF LEFT JOIN pts p ON g.key = p.key AND g.gt >= p.t
         |ASOF LEFT JOIN pts n ON g.key = n.key AND g.gt < n.t""".stripMargin

  /** duration-weighted histogram of coarse states, exact µs weights. */
  def qDistribution(spark: SparkSession, dir: String): DataFrame = {
    val pts = points(spark, dir)
    val (tmin, tmax) = eventBounds(spark, dir)
    val segs = SeriesOps.segmentsInRange(pts, lit(tmin), lit(tmax), nullD)
    AggOps
      .distribution(segs.withColumn("v", floor(col("v") / 50).cast("double")), normalized = false)
      .select(col("key"), col("v").as("state"), col("weight").cast("long").as("weight_us"))
  }

  val sqlDistribution: String =
    sqlPrefix() +
      """ SELECT key, CAST(floor(v / 50) AS DOUBLE) AS state,
        |   CAST(sum(t1 - t0) AS BIGINT) AS weight_us
        | FROM segs WHERE t1 > t0 GROUP BY 1, 2""".stripMargin

  def qDistributionMasked(spark: SparkSession, dir: String): DataFrame = {
    val pts = points(spark, dir)
    val (tmin, tmax) = eventBounds(spark, dir)
    val s = spark; import s.implicits._
    val jan3 = 1704240000000000L // 2024-01-03
    val mask = Seq((jan3, jan3 + DAY), (jan3 + 2 * DAY, jan3 + 3 * DAY)).toDF("m0", "m1")
    val segs = SeriesOps.intersectMask(
      SeriesOps.segmentsInRange(pts, lit(tmin), lit(tmax), nullD), mask)
    AggOps
      .distribution(segs.withColumn("v", floor(col("v") / 50).cast("double")), normalized = false)
      .select(col("key"), col("v").as("state"), col("weight").cast("long").as("weight_us"))
  }

  val sqlDistributionMasked: String =
    sqlPrefix() +
      """, mask AS (SELECT * FROM (VALUES
        |   (1704240000000000, 1704326400000000),
        |   (1704412800000000, 1704499200000000)) m(m0, m1))
        |SELECT key, CAST(floor(v / 50) AS DOUBLE) AS state,
        |  CAST(sum(least(t1, m1) - greatest(t0, m0)) AS BIGINT) AS weight_us
        |FROM segs JOIN mask ON t0 < m1 AND t1 > m0
        |WHERE t1 > t0 GROUP BY 1, 2""".stripMargin

  /** distribution(interpolate="linear") (timeseries.py:905-930): per
    * segment the value is the linear interpolation at the segment MIDPOINT
    * between the bracketing measurements; values rounded to 6 BEFORE the
    * group-by so both engines bucket identically (the SQL repeats the
    * exact same expression term-for-term — all inputs are exact longs
    * below 2^53, so the double arithmetic is IEEE-identical). */
  def qDistributionLinear(spark: SparkSession, dir: String): DataFrame = {
    val pts = points(spark, dir)
    val (tmin, tmax) = eventBounds(spark, dir)
    // lookahead: the point AT tmax is the bracketing measurement for the
    // final segment's interpolation (get(mid,"linear") bisects to it)
    val segs = SeriesOps.segmentsInRange(pts, lit(tmin), lit(tmax), nullD, lookahead = true)
    segs
      .groupBy(col("key"), round(SeriesOps.segmentValue("linear", nullD), 6).as("state"))
      .agg(sum(col("t1") - col("t0")).cast("long").as("weight_us"))
  }

  val sqlDistributionLinear: String =
    """WITH pts AS (
      |  SELECT event_type AS key, epoch_us(ts) AS t, max(value) AS v
      |  FROM events GROUP BY 1, 2),
      |b AS (SELECT min(t) AS tmin, max(t) AS tmax FROM pts),
      |segs AS (
      |  SELECT key, t AS t0,
      |         coalesce(lead(t) OVER w, (SELECT tmax FROM b)) AS t1,
      |         v, t AS p0, lead(t) OVER w AS p1, lead(v) OVER w AS vn
      |  FROM pts WINDOW w AS (PARTITION BY key ORDER BY t)
      |  UNION ALL
      |  SELECT key, (SELECT tmin FROM b), min(t), NULL, NULL, NULL, NULL
      |  FROM pts GROUP BY key)
      |SELECT key,
      |  round(CASE WHEN p0 IS NULL THEN NULL
      |             WHEN p1 IS NULL THEN v
      |             ELSE v + ((t0 + t1) / 2.0 - p0) / (p1 - p0) * (vn - v) END, 6) AS state,
      |  CAST(sum(t1 - t0) AS BIGINT) AS weight_us
      |FROM segs WHERE t1 > t0
      |GROUP BY 1, 2""".stripMargin

  def qTwaMean(spark: SparkSession, dir: String): DataFrame = {
    val pts = points(spark, dir)
    val (tmin, tmax) = eventBounds(spark, dir)
    val segs = SeriesOps.segmentsInRange(pts, lit(tmin), lit(tmax), nullD)
    AggOps.timeWeightedMean(segs).withColumn("mean", round(col("mean"), 6))
  }

  val sqlTwaMean: String =
    sqlPrefix() +
      """ SELECT key, round(sum(v * (t1 - t0)) / sum(CASE WHEN v IS NOT NULL THEN t1 - t0 END), 6) AS mean
        | FROM segs WHERE t1 > t0 GROUP BY 1""".stripMargin

  def qNPoints(spark: SparkSession, dir: String): DataFrame = {
    val pts = points(spark, dir)
    val (tmin, tmax) = eventBounds(spark, dir)
    SeriesOps
      .nPointsWithNormalized(pts, lit(tmin), lit(tmax), includeStart = false, includeEnd = true)
      .withColumn("n_norm", round(col("n_norm"), 6))
  }

  val sqlNPoints: String =
    sqlPrefix() +
      """ SELECT key,
        |   count(*) FILTER (WHERE t > (SELECT tmin FROM b) AND t <= (SELECT tmax FROM b)) AS n_points,
        |   round(count(*) FILTER (WHERE t > (SELECT tmin FROM b) AND t <= (SELECT tmax FROM b))
        |         / count(*), 6) AS n_norm
        | FROM pts GROUP BY 1""".stripMargin

  def qMovingAverage(spark: SparkSession, dir: String): DataFrame = {
    val pts = points(spark, dir)
    val (tmin, tmax) = eventBounds(spark, dir)
    Regularize
      .movingAverage(pts, tmin, tmax, HOUR, 6 * HOUR, "center", nullD)
      .withColumn("mean", round(col("mean"), 6))
  }

  val sqlMovingAverage: String = {
    val w = 3 * HOUR
    sqlPrefix(gPre = w, gPost = w) +
      s""", grid AS (
         |  SELECT key, gt, gt - $w AS ws, gt + $w AS we
         |  FROM (SELECT DISTINCT key FROM pts),
         |    unnest(generate_series((SELECT tmin FROM b), (SELECT tmax FROM b), $HOUR)) g(gt))
         |SELECT g.key AS key, g.gt AS t,
         |  round(sum(s.v * (least(s.t1, g.we) - greatest(s.t0, g.ws)))
         |        / sum(least(s.t1, g.we) - greatest(s.t0, g.ws)), 6) AS mean
         |FROM grid g LEFT JOIN segs s
         |  ON s.key = g.key AND s.v IS NOT NULL AND s.t0 < g.we AND s.t1 > g.ws AND s.t1 > s.t0
         |GROUP BY 1, 2""".stripMargin
  }

  // ---------- rollup tiers (hourly from raw; daily FROM hourly; weekly FROM daily) ----------

  private def dayBounds(spark: SparkSession, dir: String): (Long, Long) = {
    val (tmin, tmax) = eventBounds(spark, dir)
    (Math.floorDiv(tmin, DAY) * DAY, (Math.floorDiv(tmax, DAY) + 1) * DAY)
  }

  def qRollupHourly(spark: SparkSession, dir: String): DataFrame = {
    val pts = points(spark, dir)
    val (h0, h1) = dayBounds(spark, dir)
    Rollup
      .tierStats(pts, h0, h1, HOUR)
      .withColumn("twa_mean", round(col("twa_mean"), 6))
      .select("key", "bin_start", "covered_us", "twa_mean", "min", "max", "n_points")
  }

  private def sqlTierStats(stepExpr: String): String =
    sqlPrefix() +
      s""", bb AS (SELECT (tmin // $DAY) * $DAY AS h0, ((tmax // $DAY) + 1) * $DAY AS h1 FROM b),
         |clipped AS (
         |  SELECT key,
         |         CASE WHEN ot IS NULL THEN (SELECT h0 FROM bb) ELSE t0 END AS t0,
         |         CASE WHEN lst THEN (SELECT h1 FROM bb) ELSE t1 END AS t1,
         |         v, ot
         |  FROM segs),
         |cells AS (
         |  SELECT key, v, ot,
         |         greatest(t0, $stepExpr * cell) AS t0,
         |         least(t1, $stepExpr * (cell + 1)) AS t1,
         |         $stepExpr * cell AS bin_start
         |  FROM clipped, unnest(generate_series(t0 // $stepExpr, t1 // $stepExpr)) c(cell)
         |  WHERE t1 > t0)
         |SELECT key, bin_start,
         |  CAST(sum(CASE WHEN v IS NOT NULL THEN t1 - t0 END) AS BIGINT) AS covered_us,
         |  round(sum(v * (t1 - t0)) / sum(CASE WHEN v IS NOT NULL THEN t1 - t0 END), 6) AS twa_mean,
         |  min(v) AS min, max(v) AS max,
         |  count(CASE WHEN ot = t0 THEN 1 END) AS n_points
         |FROM cells WHERE t1 > t0
         |GROUP BY 1, 2""".stripMargin

  val sqlRollupHourly: String = sqlTierStats(HOUR.toString)

  /** histogram tiers: hourly built from raw, daily REBINNED from hourly,
    * weekly REBINNED from daily — exact long weights, so matching a
    * direct-daily/weekly oracle proves the cascade lossless. */
  private def hourlyHist(spark: SparkSession, dir: String): DataFrame = {
    val pts = points(spark, dir).withColumn("v", floor(col("v") / 50).cast("double"))
    val (h0, h1) = dayBounds(spark, dir)
    Rollup.histTier(pts, h0, h1, HOUR)
      .select(col("key"), col("bin_start"), col("v").as("state"),
        col("weight").as("weight_us"))
  }

  def qRollupDaily(spark: SparkSession, dir: String): DataFrame =
    hourlyHist(spark, dir)
      .groupBy(col("key"), (floor(col("bin_start") / DAY) * DAY).cast("long").as("bin_start"), col("state"))
      .agg(sum("weight_us").cast("long").as("weight_us"))

  def qRollupWeekly(spark: SparkSession, dir: String): DataFrame =
    qRollupDaily(spark, dir)
      .groupBy(col("key"), Rollup.floorWeek(col("bin_start")).as("bin_start"), col("state"))
      .agg(sum("weight_us").cast("long").as("weight_us"))

  private def sqlHist(binExpr: String): String =
    sqlPrefix() +
      s""", bb AS (SELECT (tmin // $DAY) * $DAY AS h0, ((tmax // $DAY) + 1) * $DAY AS h1 FROM b),
         |clipped AS (
         |  SELECT key,
         |         CASE WHEN ot IS NULL THEN (SELECT h0 FROM bb) ELSE t0 END AS t0,
         |         CASE WHEN lst THEN (SELECT h1 FROM bb) ELSE t1 END AS t1,
         |         CAST(floor(v / 50) AS DOUBLE) AS state
         |  FROM segs)
         |SELECT key, $binExpr AS bin_start, state,
         |  CAST(sum(least(t1, ($binExpr) + __STEP__) - greatest(t0, $binExpr)) AS BIGINT) AS weight_us
         |FROM (
         |  SELECT key, state, t0, t1, cell
         |  FROM clipped, unnest(generate_series((t0 - __SHIFT__) // __STEP__, (t1 - __SHIFT__) // __STEP__)) c(cell)
         |  WHERE t1 > t0)
         |WHERE least(t1, ($binExpr) + __STEP__) > greatest(t0, $binExpr)
         |GROUP BY 1, 2, 3""".stripMargin

  val sqlRollupDaily: String =
    sqlHist(s"cell * $DAY").replace("__STEP__", DAY.toString).replace("__SHIFT__", "0")

  val sqlRollupWeekly: String =
    sqlHist(s"cell * $WEEK + $WEEK_SHIFT")
      .replace("__STEP__", WEEK.toString)
      .replace("__SHIFT__", WEEK_SHIFT.toString)

  def qDistHourOfDay(spark: SparkSession, dir: String): DataFrame = {
    val pts = points(spark, dir).withColumn("v", floor(col("v") / 50).cast("double"))
    val (tmin, tmax) = eventBounds(spark, dir)
    Rollup
      .distributionByHourOfDay(SeriesOps.segmentsInRange(pts, lit(tmin), lit(tmax), nullD))
      .select(col("key"), col("hour"), col("v").as("state"), col("weight").cast("long").as("weight_us"))
  }

  val sqlDistHourOfDay: String =
    sqlPrefix() +
      s""", cells AS (
         |  SELECT key, CAST(floor(v / 50) AS DOUBLE) AS state,
         |         greatest(t0, cell * $HOUR) AS c0, least(t1, (cell + 1) * $HOUR) AS c1,
         |         CAST(cell % 24 AS INT) AS hour
         |  FROM segs, unnest(generate_series(t0 // $HOUR, t1 // $HOUR)) c(cell)
         |  WHERE t1 > t0)
         |SELECT key, hour, state, CAST(sum(c1 - c0) AS BIGINT) AS weight_us
         |FROM cells WHERE c1 > c0 GROUP BY 1, 2, 3""".stripMargin

  def qDistDayOfWeek(spark: SparkSession, dir: String): DataFrame = {
    val pts = points(spark, dir).withColumn("v", floor(col("v") / 50).cast("double"))
    val (tmin, tmax) = eventBounds(spark, dir)
    Rollup
      .distributionByDayOfWeek(SeriesOps.segmentsInRange(pts, lit(tmin), lit(tmax), nullD))
      .select(col("key"), col("weekday"), col("v").as("state"), col("weight").cast("long").as("weight_us"))
  }

  val sqlDistDayOfWeek: String =
    sqlPrefix() +
      s""", cells AS (
         |  SELECT key, CAST(floor(v / 50) AS DOUBLE) AS state,
         |         greatest(t0, cell * $DAY) AS c0, least(t1, (cell + 1) * $DAY) AS c1,
         |         CAST((cell + 3) % 7 AS INT) AS weekday
         |  FROM segs, unnest(generate_series(t0 // $DAY, t1 // $DAY)) c(cell)
         |  WHERE t1 > t0)
         |SELECT key, weekday, state, CAST(sum(c1 - c0) AS BIGINT) AS weight_us
         |FROM cells WHERE c1 > c0 GROUP BY 1, 2, 3""".stripMargin

  def qCountByValue(spark: SparkSession, dir: String): DataFrame = {
    val df = spark.read
      .parquet(s"$dir/events.parquet")
      .groupBy(col("event_type").as("sid"), tsUs.as("t"))
      .agg(floor(max("value") / 100).cast("double").as("v"))
    MergeOps.countByValue(df, bucketBy = dayBucket)
      .select(col("key").as("state"), col("t"), col("v").cast("long").as("cnt"))
  }

  val sqlCountByValue: String =
    """WITH pts AS (
      |  SELECT event_type AS sid, epoch_us(ts) AS t,
      |         CAST(floor(max(value) / 100) AS DOUBLE) AS v
      |  FROM events GROUP BY 1, 2),
      |tr AS (SELECT sid, t, v, lag(v) OVER (PARTITION BY sid ORDER BY t) AS pv FROM pts),
      |d AS (
      |  SELECT v AS state, t, 1 AS delta FROM tr
      |  UNION ALL
      |  SELECT pv AS state, t, -1 AS delta FROM tr),
      |g AS (SELECT state, t, sum(delta) AS delta FROM d GROUP BY 1, 2),
      |r AS (SELECT state, t,
      |        sum(delta) OVER (PARTITION BY state ORDER BY t ROWS UNBOUNDED PRECEDING)
      |          + CASE WHEN state IS NULL THEN (SELECT count(DISTINCT sid) FROM pts) ELSE 0 END AS cnt
      |      FROM g),
      |c AS (SELECT state, t, cnt, lag(cnt) OVER (PARTITION BY state ORDER BY t) AS pc,
      |        row_number() OVER (PARTITION BY state ORDER BY t) AS rn
      |      FROM r)
      |SELECT state, t, CAST(cnt AS BIGINT) AS cnt FROM c
      |WHERE rn = 1 OR pc IS DISTINCT FROM cnt""".stripMargin

  def qThreshold(spark: SparkSession, dir: String): DataFrame =
    SeriesOps.compact(SeriesOps.threshold(points(spark, dir), lit(150.0)))

  val sqlThreshold: String =
    """WITH pts AS (
      |  SELECT event_type AS key, epoch_us(ts) AS t,
      |         CAST(max(value) > 150.0 AS DOUBLE) AS v
      |  FROM events GROUP BY 1, 2),
      |l AS (SELECT key, t, v,
      |        lag(v) OVER (PARTITION BY key ORDER BY t) AS pv,
      |        row_number() OVER (PARTITION BY key ORDER BY t) AS rn
      |      FROM pts)
      |SELECT key, t, v FROM l WHERE rn = 1 OR pv IS DISTINCT FROM v""".stripMargin

  /** exact weighted quantiles (mquantiles alpha=beta=0.5 knot algebra) of
    * the duration-weighted state distribution per key. */
  def qQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val pts = points(spark, dir).withColumn("v", floor(col("v") / 50).cast("double"))
    val (tmin, tmax) = eventBounds(spark, dir)
    val segs = SeriesOps.segmentsInRange(pts, lit(tmin), lit(tmax), nullD)
    val hist = AggOps
      .distribution(segs, normalized = false)
      .filter(col("v").isNotNull)
      .groupBy("key")
      .agg(map_from_entries(collect_list(struct(col("v"), col("weight").cast("double")))).as("hist"))
    val qs = Seq(0.25, 0.5, 0.9)
    val qcol = graft.hist.WeightedQuantile.quantilesUdf(qs)(col("hist"))
    hist
      .select(col("key"), posexplode(qcol))
      .select(col("key"),
        element_at(typedLit(qs), col("pos") + 1).as("q"),
        round(col("col"), 6).as("value"))
  }

  /** The same knot algebra in SQL: for each value (weight-ordered by
    * value), knots at (cum-w+beta)/total and (cum-beta)/total with
    * beta = 0.5 * min(weight); quantile = exact knot hit or linear
    * interpolation between bracketing knots, q clamped to [qmin, qmax]
    * (traces/histogram.py:172-247). */
  val sqlQuantiles: String =
    sqlPrefix() +
      """, hist AS (
        |  SELECT key, CAST(floor(v / 50) AS DOUBLE) AS state,
        |         CAST(sum(t1 - t0) AS DOUBLE) AS w
        |  FROM segs WHERE t1 > t0 AND v IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT key, sum(w) AS total, 0.5 * min(w) AS beta FROM hist GROUP BY 1),
        |cum AS (
        |  SELECT h.key, h.state, h.w, t.total, t.beta,
        |         sum(h.w) OVER (PARTITION BY h.key ORDER BY h.state) AS cw
        |  FROM hist h JOIN tot t USING (key)),
        |knots AS (
        |  SELECT key, state, (cw - w + beta) / total AS qk FROM cum
        |  UNION ALL
        |  SELECT key, state, (cw - beta) / total AS qk FROM cum),
        |qr AS (SELECT * FROM (VALUES (0.25), (0.5), (0.9)) q(q0)),
        |clamped AS (
        |  SELECT k.key, q.q0,
        |         least(greatest(q.q0, min(k.qk)), max(k.qk)) AS qc
        |  FROM knots k, qr q GROUP BY 1, 2),
        |lo AS (
        |  SELECT c.key, c.q0, max_by(k.state, k.qk) AS y1, max(k.qk) AS x1
        |  FROM clamped c JOIN knots k ON k.key = c.key AND k.qk <= c.qc
        |  GROUP BY 1, 2),
        |hi AS (
        |  SELECT c.key, c.q0, min_by(k.state, k.qk) AS y2, min(k.qk) AS x2
        |  FROM clamped c JOIN knots k ON k.key = c.key AND k.qk > c.qc
        |  GROUP BY 1, 2)
        |SELECT c.key, c.q0 AS q,
        |  round(CASE WHEN c.qc = l.x1 OR h.x2 IS NULL THEN l.y1
        |             ELSE (h.y2 - l.y1) * (c.qc - l.x1) / (h.x2 - l.x1) + l.y1 END, 6) AS value
        |FROM clamped c
        |JOIN lo l ON l.key = c.key AND l.q0 = c.q0
        |LEFT JOIN hi h ON h.key = c.key AND h.q0 = c.q0""".stripMargin

  // ---------- compression codec (round-trip == compacted input) ----------

  def qCodecRoundtrip(spark: SparkSession, dir: String): DataFrame =
    ChunkOps.readChunks(
      ChunkOps.writeChunks(SeriesOps.compact(points(spark, dir)), DAY))

  val sqlCodecRoundtrip: String =
    """WITH pts AS (
      |  SELECT event_type AS key, epoch_us(ts) AS t, max(value) AS v
      |  FROM events GROUP BY 1, 2),
      |l AS (SELECT key, t, v,
      |        lag(v) OVER (PARTITION BY key ORDER BY t) AS pv,
      |        row_number() OVER (PARTITION BY key ORDER BY t) AS rn
      |      FROM pts)
      |SELECT key, t, v FROM l WHERE rn = 1 OR pv IS DISTINCT FROM v""".stripMargin

  // ---------- merge / multi-series ----------

  /** values floored to integer doubles: delta-sum merges are float-order-
    * sensitive in the last ulp (the bucketed partial sums group additions
    * differently than the oracle's serial scan), so the query pins
    * order-exact integer arithmetic — the operator itself is unchanged. */
  def qMergeSum(spark: SparkSession, dir: String): DataFrame = {
    val df = spark.read
      .parquet(s"$dir/events.parquet")
      .groupBy(col("event_type").as("sid"), tsUs.as("t"))
      .agg(floor(max("value")).cast("double").as("v"))
      .withColumn("key", constKey("all", col("sid")))
    MergeOps.mergeSum(df, strict = false, bucketBy = dayBucket)
      .withColumn("v", round(col("v"), 6))
  }

  val sqlMergeSum: String =
    """WITH pts AS (
      |  SELECT event_type AS sid, epoch_us(ts) AS t,
      |         CAST(floor(max(value)) AS DOUBLE) AS v
      |  FROM events GROUP BY 1, 2),
      |d AS (SELECT sid, t,
      |        coalesce(v, 0) - coalesce(lag(v) OVER (PARTITION BY sid ORDER BY t), 0) AS delta
      |      FROM pts),
      |r AS (SELECT t, sid,
      |        sum(delta) OVER (ORDER BY t, sid ROWS UNBOUNDED PRECEDING) AS s,
      |        row_number() OVER (PARTITION BY t ORDER BY sid DESC) AS rn
      |      FROM d),
      |m AS (SELECT t, s AS v FROM r WHERE rn = 1),
      |c AS (SELECT t, v, lag(v) OVER (ORDER BY t) AS pv,
      |        row_number() OVER (ORDER BY t) AS rn2 FROM m)
      |SELECT 'all' AS key, t, round(v, 6) AS v FROM c
      |WHERE rn2 = 1 OR pv IS DISTINCT FROM v""".stripMargin

  /** arbitrary-operation K-way merge (traces merge(operation=f),
    * timeseries.py:1079-1099): ignorant max over the per-sid state vector
    * with per-series default 0. The sid list is collected driver-side —
    * the reference's ts_list is equally an in-memory enumeration. */
  def qMergeMax(spark: SparkSession, dir: String): DataFrame = {
    val df = spark.read
      .parquet(s"$dir/events.parquet")
      .groupBy(col("event_type").as("sid"), tsUs.as("t"))
      // measured nulls coalesce to the same 0.0 default the oracle uses:
      // the SQL's coalesce(p.v, 0.0) cannot distinguish a measured None
      // from the pre-first default, so the query pins them equal (the
      // operator itself carries None in the state slot — see iterMerge)
      .agg(coalesce(max("value"), lit(0.0)).as("v"))
      .withColumn("key", constKey("all", col("sid")))
    // every series defaults to 0.0: the uniform-constant form skips the
    // per-sid defaults frame (whose lineage re-ran the source aggregation)
    MergeOps
      .mergeAggDynamic(df, max(_), // ignorant max: max skips nulls
        bucketBy = dayBucket, constDefault = Some(lit(0.0)))
      .withColumn("v", round(col("v"), 6))
  }

  val sqlMergeMax: String =
    """WITH pts AS (
      |  SELECT event_type AS sid, epoch_us(ts) AS t, coalesce(max(value), 0.0) AS v
      |  FROM events GROUP BY 1, 2),
      |tms AS (SELECT DISTINCT t FROM pts),
      |sds AS (SELECT DISTINCT sid FROM pts),
      |grid AS (SELECT sid, t FROM sds, tms),
      |st AS (SELECT g.sid, g.t, coalesce(p.v, 0.0) AS v
      |       FROM grid g ASOF LEFT JOIN pts p ON g.sid = p.sid AND g.t >= p.t),
      |m AS (SELECT t, max(v) AS v FROM st GROUP BY 1),
      |c AS (SELECT t, v, lag(v) OVER (ORDER BY t) AS pv,
      |        row_number() OVER (ORDER BY t) AS rn FROM m)
      |SELECT 'all' AS key, t, round(v, 6) AS v FROM c
      |WHERE rn = 1 OR pv IS DISTINCT FROM v""".stripMargin

  /** the raw iter_merge state-vector stream (timeseries.py:1048-1077),
    * exploded to (t, slot, v) rows so the oracle hashes scalars; slot i =
    * i-th sid in name order, default 0 before a series' first point. */
  def qIterMerge(spark: SparkSession, dir: String): DataFrame = {
    val df = spark.read
      .parquet(s"$dir/events.parquet")
      .groupBy(col("event_type").as("sid"), tsUs.as("t"))
      .agg(coalesce(max("value"), lit(0.0)).as("v")) // see qMergeMax note
      .withColumn("key", constKey("all", col("sid")))
    val defaults = df.select("sid").distinct().withColumn("default", lit(0.0))
    // slot = rank of the sid in name order, derived distributedly (the
    // round-2 version collected sids driver-side and pivoted K columns)
    val slots = df.select(col("key"), col("sid")).distinct()
      .withColumn("slot",
        (row_number().over(Window.partitionBy("key").orderBy("sid")) - 1).cast("int"))
    MergeOps
      .iterMergeEntries(df, Some(defaults), bucketBy = dayBucket)
      .join(slots, Seq("key", "sid"))
      .select(col("t"), col("slot"), round(col("v"), 6).as("v"))
  }

  val sqlIterMerge: String =
    """WITH pts AS (
      |  SELECT event_type AS sid, epoch_us(ts) AS t, coalesce(max(value), 0.0) AS v
      |  FROM events GROUP BY 1, 2),
      |tms AS (SELECT DISTINCT t FROM pts),
      |sds AS (SELECT sid, row_number() OVER (ORDER BY sid) - 1 AS slot
      |        FROM (SELECT DISTINCT sid FROM pts)),
      |grid AS (SELECT sid, slot, t FROM sds, tms)
      |SELECT g.t, CAST(g.slot AS INT) AS slot, round(coalesce(p.v, 0.0), 6) AS v
      |FROM grid g ASOF LEFT JOIN pts p ON g.sid = p.sid AND g.t >= p.t""".stripMargin

  /** the flat transition stream (iter_merge_transitions,
    * timeseries.py:1006-1046): one row per measurement with the series'
    * previous value attached (default before the first). */
  def qMergeTransitions(spark: SparkSession, dir: String): DataFrame = {
    val df = spark.read
      .parquet(s"$dir/events.parquet")
      .groupBy(col("event_type").as("sid"), tsUs.as("t"))
      .agg(coalesce(max("value"), lit(0.0)).as("v")) // see qMergeMax note
      .withColumn("key", constKey("all", col("sid")))
    val defaults = df.select("sid").distinct()
      .withColumn("default", lit(0.0))
    MergeOps.mergeTransitions(df, Some(defaults))
      .select(col("sid"), col("t"), round(col("prev"), 6).as("prev"), round(col("v"), 6).as("v"))
  }

  val sqlMergeTransitions: String =
    """WITH pts AS (
      |  SELECT event_type AS sid, epoch_us(ts) AS t, coalesce(max(value), 0.0) AS v
      |  FROM events GROUP BY 1, 2)
      |SELECT sid, t,
      |  round(coalesce(lag(v) OVER (PARTITION BY sid ORDER BY t), 0.0), 6) AS prev,
      |  round(v, 6) AS v
      |FROM pts""".stripMargin

  def qCountActive(spark: SparkSession, dir: String): DataFrame = {
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val open = ev.filter(col("value") >= 100)
      .select(constKey("all", col("event_type")).as("key"), tsUs.as("t"))
    val closed = ev.filter(col("value") < 100)
      .select(constKey("all", col("event_type")).as("key"), tsUs.as("t"))
    EventOps.countActive(open, closed, dayBucket).withColumn("v", col("v").cast("long"))
  }

  val sqlCountActive: String =
    """WITH d AS (
      |  SELECT epoch_us(ts) AS t, sum(CASE WHEN value >= 100 THEN 1 ELSE -1 END) AS delta
      |  FROM events GROUP BY 1)
      |SELECT 'all' AS key, t,
      |  CAST(sum(delta) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS BIGINT) AS v
      |FROM d""".stripMargin

  def qCumsum(spark: SparkSession, dir: String): DataFrame =
    EventOps
      .cumulativeSum(spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_type").as("key"), tsUs.as("t")))
      .withColumn("v", col("v").cast("long"))

  val sqlCumsum: String =
    """WITH e AS (SELECT event_type AS key, epoch_us(ts) AS t, count(*) AS n
      |           FROM events GROUP BY 1, 2)
      |SELECT key, t, CAST(sum(n) OVER (PARTITION BY key ORDER BY t ROWS UNBOUNDED PRECEDING) AS BIGINT) AS v
      |FROM e""".stripMargin

  def qInterevent(spark: SparkSession, dir: String): DataFrame =
    EventOps.interEventTimes(spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_type").as("key"), tsUs.as("t")))

  val sqlInterevent: String =
    """WITH e AS (SELECT event_type AS key, epoch_us(ts) AS t FROM events)
      |SELECT key, t, gap FROM (
      |  SELECT key, t, t - lag(t) OVER (PARTITION BY key ORDER BY t) AS gap FROM e)
      |WHERE gap IS NOT NULL""".stripMargin

  def qEventsBetween(spark: SparkSession, dir: String): DataFrame = {
    val jan2 = 1704153600000000L
    EventOps.eventsBetween(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_type").as("key"), tsUs.as("t")),
      lit(jan2), lit(jan2 + 7 * DAY))
  }

  val sqlEventsBetween: String =
    """SELECT event_type AS key, count(*) AS n_events FROM events
      |WHERE epoch_us(ts) >= 1704153600000000 AND epoch_us(ts) <= 1704758400000000
      |GROUP BY 1""".stripMargin

  /** aligned difference of two event-type series (traces `difference`). */
  def qDifference(spark: SparkSession, dir: String): DataFrame = {
    val pts = points(spark, dir)
    val a = pts.filter(col("key") === "click").withColumn("key", constKey("pair", col("key")))
    val b = pts.filter(col("key") === "view").withColumn("key", constKey("pair", col("key")))
    MergeOps.difference(a, b, lit(0.0), lit(0.0), dayBucket)
      .withColumn("v", round(col("v"), 6))
  }

  val sqlDifference: String =
    """WITH pts AS (
      |  SELECT event_type AS key, epoch_us(ts) AS t, max(value) AS v
      |  FROM events WHERE event_type IN ('click', 'view') GROUP BY 1, 2),
      |u AS (
      |  SELECT t, CASE WHEN key = 'click' THEN v END AS va,
      |         CASE WHEN key = 'view' THEN v END AS vb,
      |         CASE WHEN key = 'click' THEN 0 ELSE 1 END AS side
      |  FROM pts),
      |f AS (SELECT t, side,
      |        last_value(va IGNORE NULLS) OVER (ORDER BY t, side ROWS UNBOUNDED PRECEDING) AS la,
      |        last_value(vb IGNORE NULLS) OVER (ORDER BY t, side ROWS UNBOUNDED PRECEDING) AS lb,
      |        row_number() OVER (PARTITION BY t ORDER BY side DESC) AS rn
      |      FROM u)
      |SELECT 'pair' AS key, t, round(coalesce(la, 0) - coalesce(lb, 0), 6) AS v
      |FROM f WHERE rn = 1""".stripMargin

  // ---------- text / dedup / similarity ----------

  def qDedupExact(spark: SparkSession, dir: String): DataFrame =
    Dedup.exact(docs(spark, dir))

  val sqlDedupExact: String =
    """SELECT md5(text) AS digest, min(doc_id) AS survivor_id, count(*) AS group_size
      |FROM documents GROUP BY 1""".stripMargin

  def qTokenCounts(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit("\\S+"), lit(0))).as("ws_tokens"),
      TextOps.bpeishTokenCount(col("text")).as("bpeish_tokens"))

  val sqlTokenCounts: String =
    """SELECT doc_id,
      |  len(regexp_extract_all(text, '\S+')) AS ws_tokens,
      |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpeish_tokens
      |FROM documents""".stripMargin

  def qQuality(spark: SparkSession, dir: String): DataFrame =
    TextOps
      .qualityFeatures(docs(spark, dir))
      .select(
        col("doc_id"), col("n_tokens"),
        round(col("stop_ratio"), 6).as("stop_ratio"),
        round(col("punct_ratio"), 6).as("punct_ratio"),
        round(col("alpha_ratio"), 6).as("alpha_ratio"),
        col("quality"))

  val sqlQuality: String = {
    val stops = TextOps.stopWords.map(w => s"'$w'").mkString(", ")
    s"""WITH f AS (
       |  SELECT doc_id,
       |    len(regexp_extract_all(text, '\\S+')) AS n_tokens,
       |    len(list_filter(list_transform(regexp_extract_all(text, '\\S+'), x -> lower(x)),
       |        x -> list_contains([$stops], x))) AS n_stop,
       |    len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
       |    len(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha,
       |    length(text) AS n_chars
       |  FROM documents),
       |r AS (
       |  SELECT doc_id, n_tokens,
       |    CASE WHEN n_tokens > 0 THEN n_stop * 1.0 / n_tokens ELSE 0.0 END AS stop_r,
       |    CASE WHEN n_chars > 0 THEN n_punct * 1.0 / n_chars ELSE 0.0 END AS punct_r,
       |    CASE WHEN n_chars > 0 THEN n_alpha * 1.0 / n_chars ELSE 0.0 END AS alpha_r
       |  FROM f)
       |SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
       |  round(stop_r, 6) AS stop_ratio, round(punct_r, 6) AS punct_ratio,
       |  round(alpha_r, 6) AS alpha_ratio,
       |  round(least(1.0, greatest(0.0,
       |    0.3 * least(n_tokens / 100.0, 1.0) + 0.3 * alpha_r
       |    + 0.2 * least(stop_r * 5.0, 1.0)
       |    + 0.2 * (1.0 - least(punct_r * 10.0, 1.0)))), 6) AS quality
       |FROM r""".stripMargin
  }

  def qLangId(spark: SparkSession, dir: String): DataFrame =
    TextOps.langId(docs(spark, dir))
      .select(col("doc_id"), col("pred_lang"), col("lang_score").cast("long").as("lang_score"))

  val sqlLangId: String = {
    val cases = TextOps.langMarkers.map { case (code, words) =>
      val lst = words.map(w => s"'$w'").mkString(", ")
      s"WHEN '$code' THEN len(list_filter(tk, x -> list_contains([$lst], x)))"
    }.mkString("\n        ")
    val codes = TextOps.langMarkers.map { case (c, _) => s"('$c')" }.mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, list_transform(regexp_extract_all(text, '\\S+'), x -> lower(x)) AS tk
       |  FROM documents),
       |sc AS (
       |  SELECT doc_id, code,
       |    CASE code
       |        $cases
       |        END AS score
       |  FROM toks, (VALUES $codes) l(code))
       |SELECT doc_id, code AS pred_lang, CAST(score AS BIGINT) AS lang_score
       |FROM sc
       |QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, code ASC) = 1""".stripMargin
  }

  def qFingerprint(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))

  val sqlFingerprint: String =
    """WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS tk FROM documents),
      |x AS (
      |  SELECT doc_id, bit_xor(('0x' || substr(md5(tk[i]), 1, 8))::BIGINT * i) AS fp
      |  FROM toks, unnest(generate_series(1, len(tk))) s(i)
      |  GROUP BY doc_id)
      |SELECT d.doc_id, CAST(coalesce(x.fp, 0) AS BIGINT) AS fp
      |FROM documents d LEFT JOIN x USING (doc_id)""".stripMargin

  /** one cap constant shared by the Spark call AND the SQL oracles — an
    * unmirrored cap would silently diverge the candidate sets the moment a
    * (band, band_hash) bucket exceeds it at larger scale factors. */
  final val LSH_MAX_BUCKET = 2000

  def qMinhashPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashCandidates(docs(spark, dir), maxBucket = LSH_MAX_BUCKET)

  private val sqlBandsCte: String =
    s"""WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS tk FROM documents),
       |sh AS (
       |  SELECT doc_id,
       |    list_distinct([array_to_string(tk[i : i + 2], ' ')
       |                   for i in generate_series(1, greatest(len(tk) - 2, 1))]) AS sh
       |  FROM toks),
       |xs AS (
       |  SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT AS x
       |  FROM sh, unnest(sh) t(s)),
       |mh AS (
       |  SELECT doc_id, j,
       |    min(((1000003 * (j + 1) * 2 + 1) * x + 7919 * (j + 1)) % ${Dedup.MINHASH_P}) AS h
       |  FROM xs, unnest(generate_series(0, 15)) jj(j)
       |  GROUP BY 1, 2),
       |bands0 AS (
       |  SELECT doc_id, j // 4 AS band, string_agg(h::VARCHAR, '|' ORDER BY j) AS band_hash
       |  FROM mh GROUP BY 1, 2),
       |bands AS (
       |  SELECT doc_id, band, band_hash FROM bands0
       |  QUALIFY count(*) OVER (PARTITION BY band, band_hash) <= $LSH_MAX_BUCKET)""".stripMargin

  val sqlMinhashPairs: String =
    sqlBandsCte +
      """
        |SELECT x.doc_id AS a, y.doc_id AS b
        |FROM bands x JOIN bands y
        |  ON x.band = y.band AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id
        |GROUP BY 1, 2""".stripMargin

  def qSimhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashDf(docs(spark, dir))

  val sqlSimhash: String =
    """WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS tk FROM documents),
      |h AS (
      |  SELECT doc_id, ('0x' || substr(md5(t.s), 1, 8))::BIGINT AS hv
      |  FROM toks, unnest(tk) t(s)),
      |votes AS (
      |  SELECT doc_id, k, sum(CASE WHEN (hv >> k) & 1 = 1 THEN 1 ELSE -1 END) AS vote
      |  FROM h, unnest(generate_series(0, 31)) kk(k)
      |  GROUP BY 1, 2),
      |s AS (
      |  SELECT doc_id,
      |    sum(CASE WHEN vote > 0 THEN (1::BIGINT << k) ELSE 0 END) AS simhash
      |  FROM votes GROUP BY 1)
      |SELECT d.doc_id, CAST(coalesce(s.simhash, 0) AS BIGINT) AS simhash
      |FROM documents d LEFT JOIN s USING (doc_id)""".stripMargin

  def qJaccard(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    Dedup.ngramJaccard(d, Dedup.minhashCandidates(d, maxBucket = LSH_MAX_BUCKET))
  }

  val sqlJaccard: String =
    sqlBandsCte +
      """,
        |pairs AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b
        |  FROM bands x JOIN bands y
        |    ON x.band = y.band AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2)
        |SELECT p.a, p.b,
        |  round(len(list_intersect(sa.sh, sb.sh)) * 1.0
        |        / len(list_distinct(list_concat(sa.sh, sb.sh))), 6) AS jaccard
        |FROM pairs p
        |JOIN sh sa ON sa.doc_id = p.a
        |JOIN sh sb ON sb.doc_id = p.b""".stripMargin

  /** embeddings with the float vector upcast to double so the cosine
    * arithmetic matches the SQL oracle's double math. */
  private def embD(spark: SparkSession, dir: String): DataFrame =
    embeddings(spark, dir)
      .withColumn("embedding", transform(col("embedding"), x => x.cast("double")))

  def qCosineTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = embD(spark, dir)
    Ann.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), 10)
      .select("q_id", "n_id", "cos", "rank")
  }

  val sqlCosineTopK: String =
    """WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
      |c AS (SELECT vec_id AS n_id, embedding AS nv FROM embeddings),
      |s AS (
      |  SELECT q_id, n_id,
      |    sum(qv[i]::DOUBLE * nv[i]::DOUBLE) AS dot,
      |    sum(qv[i]::DOUBLE * qv[i]::DOUBLE) AS nq,
      |    sum(nv[i]::DOUBLE * nv[i]::DOUBLE) AS nn
      |  FROM q, c, unnest(generate_series(1, 64)) d(i)
      |  WHERE q_id <> n_id
      |  GROUP BY 1, 2),
      |r AS (SELECT q_id, n_id, round(dot / (sqrt(nq) * sqrt(nn)), 6) AS cos FROM s)
      |SELECT q_id, n_id, cos,
      |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank
      |FROM r
      |QUALIFY rank <= 10""".stripMargin

  /** IVF-Flat probe path with SEEDED centroids (vec_id < 8) so the whole
    * pipeline — assignment argmax, probe ranking, in-cell top-k — is
    * reproducible in the DuckDB oracle (similarities rounded to 6 before
    * every argmax/rank; see Ann.ivfAssign). The production index builder is
    * Ann.kMeans (Lloyd's), recall-tested in AnnSpec; its trained centroids
    * aren't SQL-expressible, which is why the oracle query pins seeds. */
  def qAnnIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = embD(spark, dir)
    val centroids = emb.filter(col("vec_id") < 8)
    val assigned = Ann.ivfAssign(emb, centroids)
    Ann.ivfTopK(assigned, centroids, emb.filter(col("vec_id") < 5), 10, 3)
      .select("q_id", "n_id", "cos", "rank")
  }

  val sqlAnnIvf: String =
    """WITH c AS (SELECT vec_id AS cell, embedding AS cv FROM embeddings WHERE vec_id < 8),
      |ec AS (
      |  SELECT e.vec_id, c.cell,
      |    round(sum(e.embedding[i]::DOUBLE * c.cv[i]::DOUBLE)
      |      / (sqrt(sum(e.embedding[i]::DOUBLE ^ 2)) * sqrt(sum(c.cv[i]::DOUBLE ^ 2))), 6) AS sim
      |  FROM embeddings e, c, unnest(generate_series(1, 64)) d(i)
      |  GROUP BY 1, 2),
      |asg AS (
      |  SELECT vec_id, cell FROM ec
      |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell ASC) = 1),
      |qc AS (
      |  SELECT vec_id AS q_id, cell FROM ec WHERE vec_id < 5
      |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell ASC) <= 3),
      |cand AS (
      |  SELECT qc.q_id, a.vec_id AS n_id
      |  FROM qc JOIN asg a USING (cell)
      |  WHERE qc.q_id <> a.vec_id),
      |s AS (
      |  SELECT cd.q_id, cd.n_id,
      |    round(sum(q.embedding[i]::DOUBLE * n.embedding[i]::DOUBLE)
      |      / (sqrt(sum(q.embedding[i]::DOUBLE ^ 2)) * sqrt(sum(n.embedding[i]::DOUBLE ^ 2))), 6) AS cos
      |  FROM cand cd
      |  JOIN embeddings q ON q.vec_id = cd.q_id
      |  JOIN embeddings n ON n.vec_id = cd.n_id,
      |  unnest(generate_series(1, 64)) d(i)
      |  GROUP BY 1, 2)
      |SELECT q_id, n_id, cos,
      |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank
      |FROM s QUALIFY rank <= 10""".stripMargin

  /** IVF-vs-brute-force recall@10 with TRAINED centroids (round-2 verdict
    * #7): Lloyd's k-means (k=8, 2 iterations, coordinates pinned to 6
    * decimals) provides the coarse quantizer; the query emits per-query
    * recall of nProbe=3 IVF against the exact baseline. The oracle replays
    * the SAME deterministic Lloyd iterations in SQL. AnnSpec pins
    * recall >= 0.9. */
  def qAnnRecall(spark: SparkSession, dir: String): DataFrame = {
    val emb = embD(spark, dir)
    val cents = Ann.kMeans(emb, 8, iters = 2, roundTo = Some(6))
    val assigned = Ann.ivfAssign(emb, cents, cellCol = "cell")
    val queries = emb.filter(col("vec_id") < 5)
    val ivf = Ann.ivfTopK(assigned, cents, queries, 10, 3, cellCol = "cell")
    val exact = Ann.bruteForceTopK(emb, queries, 10)
    Ann.recallAtK(ivf, exact).select(col("q_id"), round(col("recall"), 6).as("recall"))
  }

  /** DuckDB replay of [[qAnnRecall]]: seeds = 8 lowest-id vectors (rounded),
    * then per iteration argmax-assign on rounded cosine + per-cell rounded
    * means (empty cells keep the previous centroid), then IVF nProbe=3
    * vs brute-force recall@10. Generated by a loop so the iteration count
    * stays in ONE place. */
  val sqlAnnRecall: String = {
    val iters = 2
    def simOver(centsCte: String): String =
      s"""SELECT e.vec_id, c.cell,
         |    round(sum(e.embedding[i]::DOUBLE * c.cv[i]) /
         |      (sqrt(sum(e.embedding[i]::DOUBLE ^ 2)) * sqrt(sum(c.cv[i] ^ 2))), 6) AS sim
         |  FROM embeddings e, $centsCte c, unnest(generate_series(1, 64)) d(i)
         |  GROUP BY 1, 2""".stripMargin
    val seed =
      """c0 AS (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
        |         list_transform(embedding, x -> round(x::DOUBLE, 6)) AS cv
        |  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8))""".stripMargin
    val iterCtes = (0 until iters).map { n =>
      s"""ec$n AS (
         |  ${simOver(s"c$n")}),
         |asg$n AS (
         |  SELECT vec_id, cell FROM ec$n
         |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell ASC) = 1),
         |mv$n AS (
         |  SELECT cell, list(m ORDER BY i) AS cv FROM (
         |    SELECT a.cell, d.i, round(avg(e.embedding[i]::DOUBLE), 6) AS m
         |    FROM asg$n a JOIN embeddings e USING (vec_id),
         |      unnest(generate_series(1, 64)) d(i)
         |    GROUP BY 1, 2)
         |  GROUP BY cell),
         |c${n + 1} AS (
         |  SELECT p.cell, coalesce(v.cv, p.cv) AS cv
         |  FROM c$n p LEFT JOIN mv$n v USING (cell))""".stripMargin
    }.mkString(",\n")
    s"""WITH $seed,
       |$iterCtes,
       |ecF AS (
       |  ${simOver(s"c$iters")}),
       |asgF AS (
       |  SELECT vec_id, cell FROM ecF
       |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell ASC) = 1),
       |qc AS (
       |  SELECT vec_id AS q_id, cell FROM ecF WHERE vec_id < 5
       |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell ASC) <= 3),
       |cand AS (
       |  SELECT qc.q_id, a.vec_id AS n_id FROM qc JOIN asgF a USING (cell)
       |  WHERE qc.q_id <> a.vec_id),
       |ivf AS (
       |  SELECT cd.q_id, cd.n_id FROM cand cd
       |  JOIN embeddings q ON q.vec_id = cd.q_id
       |  JOIN embeddings n ON n.vec_id = cd.n_id,
       |  unnest(generate_series(1, 64)) d(i)
       |  GROUP BY 1, 2
       |  QUALIFY row_number() OVER (PARTITION BY cd.q_id ORDER BY
       |    round(sum(q.embedding[i]::DOUBLE * n.embedding[i]::DOUBLE) /
       |      (sqrt(sum(q.embedding[i]::DOUBLE ^ 2)) * sqrt(sum(n.embedding[i]::DOUBLE ^ 2))), 6) DESC,
       |    cd.n_id ASC) <= 10),
       |bf AS (
       |  SELECT q.vec_id AS q_id, n.vec_id AS n_id
       |  FROM embeddings q, embeddings n, unnest(generate_series(1, 64)) d(i)
       |  WHERE q.vec_id < 5 AND q.vec_id <> n.vec_id
       |  GROUP BY 1, 2
       |  QUALIFY row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |    round(sum(q.embedding[i]::DOUBLE * n.embedding[i]::DOUBLE) /
       |      (sqrt(sum(q.embedding[i]::DOUBLE ^ 2)) * sqrt(sum(n.embedding[i]::DOUBLE ^ 2))), 6) DESC,
       |    n.vec_id ASC) <= 10)
       |SELECT b.q_id, round(sum(CASE WHEN i.n_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
       |       / count(*), 6) AS recall
       |FROM bf b LEFT JOIN ivf i ON b.q_id = i.q_id AND b.n_id = i.n_id
       |GROUP BY 1""".stripMargin
  }

  /** from_json/to_json DICT form roundtrip (timeseries.py:1322-1329,
    * 1381-1385): every series renders to ONE `{iso_time: value}` JSON
    * object, then parses back — output must equal the input points. */
  def qJsonDictRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val dict = graft.sources.Sources.toJsonDict(points(spark, dir))
    graft.sources.Sources.fromJsonDict(dict, "key", "series")
  }

  // lazy: sqlCsvRoundtrip is declared later in the object
  lazy val sqlJsonDictRoundtrip: String = sqlCsvRoundtrip

  def qMultimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    val s = spark; import s.implicits._
    val media = Multimodal.mediaFromDocs(docs(spark, dir)).as[Multimodal.MediaRow]
    Multimodal.decodeAll(media).toDF()
      .select("doc_id", "modality", "byte_len", "width", "height", "n_frames")
  }

  /** Replays the REAL container arithmetic: BMP byte length = 54-byte
    * headers + height x 4-byte-padded rows; WAV = 44-byte canonical header
    * + samples x channels data bytes; AVI = 232 header/index-entry bytes
    * + frames x (24 + padded-stride x height). */
  val sqlMultimodalMeta: String =
    """WITH m AS (
      |  SELECT doc_id,
      |    (['image', 'audio', 'video'])[CAST(doc_id % 3 AS INT) + 1] AS modality,
      |    octet_length(encode(coalesce(text, ''))) AS n,
      |    4 + doc_id % 13 AS bw, 3 + doc_id % 7 AS bh,
      |    1 + doc_id % 2 AS ch, 16 + octet_length(encode(coalesce(text, ''))) % 241 AS ns,
      |    4 + doc_id % 11 AS vw, 3 + doc_id % 5 AS vh, 1 + doc_id % 6 AS vf
      |  FROM documents)
      |SELECT doc_id, modality,
      |  CAST(CASE modality
      |    WHEN 'image' THEN 54 + bh * (((3 * bw + 3) // 4) * 4)
      |    WHEN 'audio' THEN 44 + ns * ch
      |    ELSE 232 + vf * (24 + vh * (((3 * vw + 3) // 4) * 4)) END AS INT) AS byte_len,
      |  CAST(CASE modality
      |    WHEN 'image' THEN bw
      |    WHEN 'audio' THEN 8000 + (doc_id % 8) * 1000
      |    ELSE vw END AS INT) AS width,
      |  CAST(CASE modality
      |    WHEN 'image' THEN bh
      |    WHEN 'audio' THEN 8
      |    ELSE vh END AS INT) AS height,
      |  CAST(CASE modality
      |    WHEN 'image' THEN 1
      |    WHEN 'audio' THEN ns
      |    ELSE vf END AS INT) AS n_frames
      |FROM m""".stripMargin

  // ---------- round-2 driver entries for previously test-only operators ----------

  /** sample_interval (traces/timeseries.py:616-745): time-weighted mean /
    * min / max per 6-hour grid cell. Cells fully inside one constant
    * segment get the segment value — the reference reaches that via its
    * trailing ffill() of cells without inflexion points; full-coverage
    * aggregation over split segments is the same function, computed
    * directly. */
  def qSampleInterval(spark: SparkSession, dir: String): DataFrame = {
    val pts = points(spark, dir)
    val (h0, h1) = dayBounds(spark, dir)
    Regularize
      .sampleInterval(pts, h0, h1, 6 * HOUR, nullD)
      .select(col("key"), col("cell_start"),
        round(col("mean"), 6).as("mean"), col("min"), col("max"))
  }

  val sqlSampleInterval: String = {
    val p = 6 * HOUR
    sqlPrefix() +
      s""", bb AS (SELECT (tmin // $DAY) * $DAY AS h0, ((tmax // $DAY) + 1) * $DAY AS h1 FROM b),
         |clipped AS (
         |  SELECT key,
         |         CASE WHEN ot IS NULL THEN (SELECT h0 FROM bb) ELSE t0 END AS t0,
         |         CASE WHEN lst THEN (SELECT h1 FROM bb) ELSE t1 END AS t1, v
         |  FROM segs),
         |cells AS (
         |  SELECT key, v,
         |         greatest(t0, $p * cell) AS t0, least(t1, $p * (cell + 1)) AS t1,
         |         $p * cell AS cell_start
         |  FROM clipped, unnest(generate_series(t0 // $p, t1 // $p)) c(cell)
         |  WHERE t1 > t0)
         |SELECT key, cell_start,
         |  round(sum(v * (t1 - t0)) / $p.0, 6) AS mean,
         |  min(v) AS min, max(v) AS max
         |FROM cells WHERE t1 > t0 GROUP BY 1, 2""".stripMargin
  }

  /** sample_interval(idx=...) (q59, traces/timeseries.py:616-745 explicit-
    * boundary branch): NON-uniform cells cycling widths 1h/3h/2h/6h within
    * each 12h block over the day-floored series span — the mean divides by
    * each cell's actual width. */
  def qSampleIntervalIdx(spark: SparkSession, dir: String): DataFrame = {
    val pts = points(spark, dir)
    val (tmin, tmax) = eventBounds(spark, dir)
    val h0 = tmin / DAY * DAY
    val h1 = (tmax / DAY + 1) * DAY
    val block = 12 * HOUR
    val offs = Array(0L, 1 * HOUR, 4 * HOUR, 6 * HOUR)
    val nBlocks = ((h1 - h0) / block).toInt
    val bnds = (0 until nBlocks).flatMap(blk => offs.map(o => h0 + blk * block + o)) :+ h1
    import spark.implicits._
    val cells = bnds.zip(bnds.drop(1)).toDF("cell_start", "cell_end")
    Regularize.sampleIntervalAt(pts, cells, h0, h1, nullD, 6 * HOUR)
      .select(col("key"), col("cell_start"),
        round(col("mean"), 6).as("mean"), col("min"), col("max"))
  }

  val sqlSampleIntervalIdx: String = {
    val blk = 12 * HOUR
    sqlPrefix() +
      s""", bb AS (SELECT (tmin // $DAY) * $DAY AS h0, ((tmax // $DAY) + 1) * $DAY AS h1 FROM b),
         |cells AS (
         |  SELECT h0 + (i // 4) * $blk +
         |           CASE i % 4 WHEN 0 THEN 0 WHEN 1 THEN $HOUR WHEN 2 THEN ${4 * HOUR} ELSE ${6 * HOUR} END
         |           AS cell_start,
         |         CASE WHEN i % 4 = 3 THEN h0 + ((i // 4) + 1) * $blk
         |              ELSE h0 + (i // 4) * $blk +
         |                CASE i % 4 WHEN 0 THEN $HOUR WHEN 1 THEN ${4 * HOUR} ELSE ${6 * HOUR} END
         |         END AS cell_end
         |  FROM bb, unnest(generate_series(0, ((h1 - h0) // $blk) * 4 - 1)) g(i)),
         |clipped AS (
         |  SELECT key,
         |         CASE WHEN ot IS NULL THEN (SELECT h0 FROM bb) ELSE t0 END AS t0,
         |         CASE WHEN lst THEN (SELECT h1 FROM bb) ELSE t1 END AS t1, v
         |  FROM segs),
         |ov AS (
         |  SELECT key, c.cell_start, c.cell_end, v,
         |         greatest(t0, c.cell_start) AS o0, least(t1, c.cell_end) AS o1
         |  FROM clipped s JOIN cells c ON s.t0 < c.cell_end AND s.t1 > c.cell_start)
         |SELECT key, cell_start,
         |  round(sum(v * (o1 - o0)) / (cell_end - cell_start), 6) AS mean,
         |  min(v) AS min, max(v) AS max
         |FROM ov WHERE o1 > o0 GROUP BY key, cell_start, cell_end""".stripMargin
  }

  /** to_bool + threshold + Python-truthiness logical and/or/xor over one
    * as-of alignment pass (traces/timeseries.py:1430-1517: and/or return
    * OPERANDS, xor returns a bool; None stays None). */
  def qLogicalOps(spark: SparkSession, dir: String): DataFrame = {
    // measured nulls pinned to 0.0: the oracle's last_value(... IGNORE
    // NULLS) carry-forward would SKIP a measured None that the operator's
    // struct-wrapped carry faithfully holds (see qMergeMax note)
    val pts = points(spark, dir).withColumn("v", coalesce(col("v"), lit(0.0)))
    val a = SeriesOps.toBool(pts.filter(col("key") === "click"))
      .withColumn("key", constKey("pair", col("key")))
    val b = SeriesOps.threshold(pts.filter(col("key") === "view"), lit(150.0))
      .withColumn("key", constKey("pair", col("key")))
    val aligned = MergeOps.alignPair(a, b, nullD, nullD, dayBucket)
    val ta = SeriesOps.truthy(col("va")); val tb = SeriesOps.truthy(col("vb"))
    aligned.select(
      col("key"), col("t"),
      when(ta, col("vb")).otherwise(col("va")).as("and_v"),
      when(ta, col("va")).otherwise(col("vb")).as("or_v"),
      (ta =!= tb).cast("double").as("xor_v"))
  }

  val sqlLogicalOps: String =
    """WITH pts AS (
      |  SELECT event_type AS key, epoch_us(ts) AS t, coalesce(max(value), 0.0) AS v
      |  FROM events WHERE event_type IN ('click', 'view') GROUP BY 1, 2),
      |u AS (
      |  SELECT t,
      |    CASE WHEN key = 'click' THEN CAST(v <> 0.0 AS DOUBLE) END AS va,
      |    CASE WHEN key = 'view' THEN CAST(v > 150.0 AS DOUBLE) END AS vb,
      |    CASE WHEN key = 'click' THEN 0 ELSE 1 END AS side
      |  FROM pts),
      |f AS (SELECT t, side,
      |        last_value(va IGNORE NULLS) OVER (ORDER BY t, side ROWS UNBOUNDED PRECEDING) AS la,
      |        last_value(vb IGNORE NULLS) OVER (ORDER BY t, side ROWS UNBOUNDED PRECEDING) AS lb,
      |        row_number() OVER (PARTITION BY t ORDER BY side DESC) AS rn
      |      FROM u),
      |g AS (SELECT t, la, lb,
      |        (la IS NOT NULL AND la <> 0.0) AS ta,
      |        (lb IS NOT NULL AND lb <> 0.0) AS tb
      |      FROM f WHERE rn = 1)
      |SELECT 'pair' AS key, t,
      |  CASE WHEN ta THEN lb ELSE la END AS and_v,
      |  CASE WHEN ta THEN la ELSE lb END AS or_v,
      |  CAST(ta <> tb AS DOUBLE) AS xor_v
      |FROM g""".stripMargin

  /** Histogram statistics of the duration-weighted state distribution:
    * total/mean/min/max/variance/stddev (traces/histogram.py:100-170,
    * ddof=0, None keys dropped, zero-weight values excluded from min/max)
    * plus the normalized weight of state 0 (histogram.normalized,
    * :139-148). */
  def qHistStats(spark: SparkSession, dir: String): DataFrame = {
    val pts = points(spark, dir).withColumn("v", floor(col("v") / 50).cast("double"))
    val (tmin, tmax) = eventBounds(spark, dir)
    val segs = SeriesOps.segmentsInRange(pts, lit(tmin), lit(tmax), nullD)
    val dist = AggOps.distribution(segs, normalized = false)
    val stats = AggOps.histogramStats(dist)
    val norm = dist
      .filter(col("v").isNotNull)
      .groupBy(col("key"))
      .agg((sum(when(col("v") === 0.0, col("weight"))).cast("double") /
        sum(col("weight"))).as("norm_w0"))
    stats.join(norm, Seq("key"))
      .select(col("key"),
        // total is an exact µs integer — BIGINT, not round(,6): DuckDB's
        // round() scales by 1e6 and loses precision past ~2^53/1e6
        col("total").cast("long").as("total"), round(col("mean"), 6).as("mean"),
        col("min"), col("max"),
        round(col("variance"), 6).as("variance"), round(col("stddev"), 6).as("stddev"),
        round(col("norm_w0"), 6).as("norm_w0"))
  }

  val sqlHistStats: String =
    sqlPrefix() +
      """, hist AS (
        |  SELECT key, CAST(floor(v / 50) AS DOUBLE) AS state,
        |         CAST(sum(t1 - t0) AS DOUBLE) AS w
        |  FROM segs WHERE t1 > t0 AND v IS NOT NULL GROUP BY 1, 2),
        |base AS (
        |  SELECT key, sum(w) AS total, sum(state * w) / sum(w) AS mean,
        |         min(CASE WHEN w > 0 THEN state END) AS mn,
        |         max(CASE WHEN w > 0 THEN state END) AS mx,
        |         sum(CASE WHEN state = 0.0 THEN w END) / sum(w) AS norm_w0
        |  FROM hist GROUP BY 1),
        |vr AS (
        |  SELECT h.key, sum(h.w * (h.state - b.mean) ^ 2) / sum(h.w) AS variance
        |  FROM hist h JOIN base b USING (key) GROUP BY 1)
        |SELECT b.key, CAST(b.total AS BIGINT) AS total, round(b.mean, 6) AS mean,
        |  b.mn AS min, b.mx AS max,
        |  round(v.variance, 6) AS variance, round(sqrt(v.variance), 6) AS stddev,
        |  round(b.norm_w0, 6) AS norm_w0
        |FROM base b JOIN vr v USING (key)""".stripMargin

  private val SI_START = 1704240000000000L // 2024-01-03
  private val SI_END = SI_START + 2 * DAY

  /** set_interval(start, end, value) (traces/timeseries.py:224-271):
    * points in [start, end] removed, `value` written at start and the OLD
    * as-of value at end. */
  def qSetInterval(spark: SparkSession, dir: String): DataFrame =
    SeriesOps.setInterval(points(spark, dir), lit(SI_START), lit(SI_END), lit(42.0), nullD)

  val sqlSetInterval: String =
    s"""WITH pts AS (
       |  SELECT event_type AS key, epoch_us(ts) AS t, max(value) AS v
       |  FROM events GROUP BY 1, 2),
       |keys AS (SELECT DISTINCT key FROM pts),
       |olde AS (SELECT key, max_by(v, t) AS v FROM pts WHERE t <= $SI_END GROUP BY 1)
       |SELECT key, t, v FROM pts WHERE t < $SI_START OR t > $SI_END
       |UNION ALL SELECT key, $SI_START AS t, 42.0 AS v FROM keys
       |UNION ALL SELECT k.key, $SI_END AS t, o.v FROM keys k LEFT JOIN olde o USING (key)""".stripMargin

  /** slice(start, end) (traces/timeseries.py:542-557): as-of value at
    * start, interior points, plus the value at end (inclusive lookup). */
  def qSlice(spark: SparkSession, dir: String): DataFrame =
    SeriesOps.sliceSeries(points(spark, dir), lit(SI_START), lit(SI_END), nullD)

  val sqlSlice: String =
    s"""WITH pts AS (
       |  SELECT event_type AS key, epoch_us(ts) AS t, max(value) AS v
       |  FROM events GROUP BY 1, 2),
       |keys AS (SELECT DISTINCT key FROM pts),
       |asof_s AS (SELECT key, max_by(v, t) AS v FROM pts WHERE t <= $SI_START GROUP BY 1),
       |asof_e AS (SELECT key, max_by(v, t) AS v FROM pts WHERE t <= $SI_END GROUP BY 1)
       |SELECT k.key, $SI_START AS t, s.v FROM keys k LEFT JOIN asof_s s USING (key)
       |UNION ALL SELECT key, t, v FROM pts WHERE t > $SI_START AND t < $SI_END
       |UNION ALL SELECT k.key, $SI_END AS t, e.v FROM keys k LEFT JOIN asof_e e USING (key)""".stripMargin

  /** per-key masked n_points: the mask is a boolean TimeSeries
    * (threshold > 150) composed exactly like the reference's mask path
    * (timeseries.py:975-989 over iterperiods(value=True) intervals). */
  def qMaskedNPoints(spark: SparkSession, dir: String): DataFrame = {
    val pts = points(spark, dir)
    val (tmin, tmax) = eventBounds(spark, dir)
    val maskSeries = SeriesOps.threshold(pts, lit(150.0))
    val mask = SeriesOps.trueIntervals(maskSeries, lit(tmin), lit(tmax), lit(0.0))
    SeriesOps.nPointsMasked(pts, mask)
  }

  val sqlMaskedNPoints: String =
    """WITH pts AS (
      |  SELECT event_type AS key, epoch_us(ts) AS t, max(value) AS v
      |  FROM events GROUP BY 1, 2),
      |b AS (SELECT min(t) AS tmin, max(t) AS tmax FROM pts),
      |bsegs AS (
      |  SELECT key, t AS m0,
      |         coalesce(lead(t) OVER (PARTITION BY key ORDER BY t),
      |                  (SELECT tmax FROM b)) AS m1,
      |         CAST(v > 150.0 AS DOUBLE) AS bv
      |  FROM pts),
      |mask AS (SELECT key, m0, m1 FROM bsegs WHERE bv = 1.0 AND m1 > m0),
      |cnt AS (
      |  SELECT p.key, count(*) AS n FROM pts p
      |  JOIN mask m ON p.key = m.key AND p.t >= m.m0 AND p.t < m.m1
      |  GROUP BY 1)
      |SELECT k.key, coalesce(c.n, 0) AS n_points
      |FROM (SELECT DISTINCT key FROM pts) k LEFT JOIN cnt c USING (key)""".stripMargin

  /** embedding cosine near-duplicate pairs inside sign-bit LSH buckets
    * (threshold picked from the data's in-bucket cosine range). */
  def qEmbeddingNearDup(spark: SparkSession, dir: String): DataFrame =
    Dedup.embeddingNearDup(embD(spark, dir), threshold = 0.3)
      .select(col("a"), col("b"), round(col("cos"), 6).as("cos"))

  val sqlEmbeddingNearDup: String =
    """WITH e AS (
      |  SELECT vec_id, embedding,
      |    (SELECT sum(CASE WHEN embedding[i + 1] >= 0 THEN 1 << i ELSE 0 END)
      |     FROM generate_series(0, 7) s(i)) AS bucket
      |  FROM embeddings),
      |p AS (
      |  SELECT x.vec_id AS a, y.vec_id AS b,
      |    (SELECT sum(x.embedding[i]::DOUBLE * y.embedding[i]::DOUBLE)
      |     FROM generate_series(1, 64) d(i)) /
      |    (sqrt((SELECT sum(x.embedding[i]::DOUBLE ^ 2) FROM generate_series(1, 64) d(i))) *
      |     sqrt((SELECT sum(y.embedding[i]::DOUBLE ^ 2) FROM generate_series(1, 64) d(i)))) AS cos
      |  FROM e x JOIN e y ON x.bucket = y.bucket AND x.vec_id < y.vec_id)
      |SELECT a, b, round(cos, 6) AS cos FROM p WHERE cos >= 0.3""".stripMargin

  /** Banded signed-random-projection LSH near-dup (q58): candidates share
    * all sign bits in at least one band of seeded integer-valued Gaussian
    * hyperplanes, then exact cosine filters. The signature arithmetic is
    * integer-exact (Dedup.embeddingNearDupSRP), so the oracle replays the
    * very same plane constants and sign decisions bit-for-bit. */
  def qSrpNearDup(spark: SparkSession, dir: String): DataFrame =
    Dedup.embeddingNearDupSRP(embD(spark, dir), dim = 64, threshold = 0.3,
      bands = 4, rowsPerBand = 8, seed = 42L)
      .select(col("a"), col("b"), round(col("cos"), 6).as("cos"))

  val sqlSrpNearDup: String = {
    val bands = 4; val rowsPerBand = 8
    val planes = Dedup.srpPlanes(bands, rowsPerBand, 64, 42L)
    val rows = for (b <- 0 until bands; r <- 0 until rowsPerBand) yield {
      val p = planes(b * rowsPerBand + r).map(_.toLong).mkString(", ")
      s"($b, $r, [$p]::DOUBLE[])"
    }
    s"""WITH planes(band, r, p) AS (VALUES ${rows.mkString(", ")}),
       |sig AS (
       |  SELECT e.vec_id, pl.band,
       |    sum(CASE WHEN (SELECT sum(round(e.embedding[i]::DOUBLE * 1024) * pl.p[i])
       |                   FROM generate_series(1, 64) d(i)) >= 0
       |        THEN 1 << pl.r ELSE 0 END) AS s
       |  FROM embeddings e CROSS JOIN planes pl
       |  GROUP BY 1, 2),
       |sigc AS (
       |  SELECT vec_id, band, s FROM sig
       |  QUALIFY count(*) OVER (PARTITION BY band, s) <= 10000),
       |cand AS (
       |  SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
       |  FROM sigc x JOIN sigc y ON x.band = y.band AND x.s = y.s AND x.vec_id < y.vec_id),
       |p2 AS (
       |  SELECT c.a, c.b,
       |    (SELECT sum(x.embedding[i]::DOUBLE * y.embedding[i]::DOUBLE)
       |     FROM generate_series(1, 64) d(i)) /
       |    (sqrt((SELECT sum(x.embedding[i]::DOUBLE ^ 2) FROM generate_series(1, 64) d(i))) *
       |     sqrt((SELECT sum(y.embedding[i]::DOUBLE ^ 2) FROM generate_series(1, 64) d(i)))) AS cos
       |  FROM cand c JOIN embeddings x ON x.vec_id = c.a JOIN embeddings y ON y.vec_id = c.b)
       |SELECT a, b, round(cos, 6) AS cos FROM p2 WHERE cos >= 0.3""".stripMargin
  }

  /** iterintervals(3) (traces/timeseries.py:450-472): sliding 3-tuples of
    * consecutive points, exploded to (key, t, pos, ti, vi) scalar rows. */
  def qSlidingIntervals(spark: SparkSession, dir: String): DataFrame =
    SeriesOps
      .slidingIntervals(points(spark, dir), 3)
      .select(col("key"), col("t"), posexplode(arrays_zip(col("ts"), col("vs"))))
      .select(col("key"), col("t"), col("pos"),
        col("col").getField("ts").as("ti"), col("col").getField("vs").as("vi"))

  val sqlSlidingIntervals: String =
    """WITH pts AS (
      |  SELECT event_type AS key, epoch_us(ts) AS t, max(value) AS v
      |  FROM events GROUP BY 1, 2),
      |x AS (
      |  SELECT key, t, v,
      |    lead(t, 1) OVER w AS t1, lead(v, 1) OVER w AS v1,
      |    lead(t, 2) OVER w AS t2, lead(v, 2) OVER w AS v2
      |  FROM pts WINDOW w AS (PARTITION BY key ORDER BY t))
      |SELECT key, t, CAST(i AS INT) AS pos,
      |  ([t, t1, t2])[i + 1] AS ti, ([v, v1, v2])[i + 1] AS vi
      |FROM x, unnest(generate_series(0, 2)) s(i)
      |WHERE t2 IS NOT NULL""".stripMargin

  /** ordered navigation: first/last item, get_item_by_index (positive and
    * negative), n_measurements (traces/timeseries.py:154-180, 390-396). */
  def qNavigation(spark: SparkSession, dir: String): DataFrame = {
    val pts = points(spark, dir)
    def ren(df: DataFrame, p: String) =
      df.select(col("key"), col("t").as(s"${p}_t"), col("v").as(s"${p}_v"))
    ren(SeriesOps.firstItem(pts), "first")
      .join(ren(SeriesOps.lastItem(pts), "last"), "key")
      .join(ren(SeriesOps.itemByIndex(pts, 1), "item1"), "key")
      .join(ren(SeriesOps.itemByIndex(pts, -2), "itemm2"), "key")
      .join(pts.groupBy("key").agg(count(lit(1)).as("n_measurements")), "key")
  }

  val sqlNavigation: String =
    """WITH pts AS (
      |  SELECT event_type AS key, epoch_us(ts) AS t, max(value) AS v
      |  FROM events GROUP BY 1, 2),
      |r AS (SELECT key, t, v,
      |        row_number() OVER (PARTITION BY key ORDER BY t) AS rn,
      |        count(*) OVER (PARTITION BY key) AS n
      |      FROM pts)
      |SELECT key,
      |  max(CASE WHEN rn = 1 THEN t END) AS first_t,
      |  max(CASE WHEN rn = 1 THEN v END) AS first_v,
      |  max(CASE WHEN rn = n THEN t END) AS last_t,
      |  max(CASE WHEN rn = n THEN v END) AS last_v,
      |  max(CASE WHEN rn = 2 THEN t END) AS item1_t,
      |  max(CASE WHEN rn = 2 THEN v END) AS item1_v,
      |  max(CASE WHEN rn = n - 1 THEN t END) AS itemm2_t,
      |  max(CASE WHEN rn = n - 1 THEN v END) AS itemm2_v,
      |  max(n) AS n_measurements
      |FROM r GROUP BY key""".stripMargin

  // ---------- sources round-trips, remove, equality, ffill ----------

  /** from_csv round-trip (traces/timeseries.py:1172-1239): the series is
    * exported to CSV with µs-precision time strings and re-parsed by
    * Sources.fromCsv; the result must equal the original points — the
    * oracle is the untouched series. */
  /** applicationId-scoped scratch path: concurrent driver runs over the
    * same data dir must not clobber each other's files mid-read. */
  private def roundtripScratch(spark: SparkSession, kind: String, dir: String): String =
    s"/tmp/graft_${kind}_roundtrip_" + spark.sparkContext.applicationId +
      "_" + dir.replaceAll("[^0-9A-Za-z]", "_")

  /** Materialize the re-parsed roundtrip result, then delete the scratch
    * dir (repeated Verify runs used to accumulate unbounded /tmp dirs).
    * The localCheckpoint pins the rows on the executors so the returned
    * frame stays valid after the files are gone. */
  private def materializeThenClean(df: DataFrame, scratch: String): DataFrame = {
    val pinned = df.localCheckpoint(true)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(scratch))
    pinned
  }

  def qCsvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    val out = roundtripScratch(spark, "csv", dir)
    points(spark, dir)
      .select(
        col("key"),
        date_format(timestamp_micros(col("t")), fmt).as("time"),
        col("v").as("value"))
      .write.mode("overwrite").option("header", "true").csv(out)
    materializeThenClean(
      graft.sources.Sources.fromCsv(spark, out, "time", "value",
        keyColumn = Some("key"), timeFormat = fmt), out)
  }

  val sqlCsvRoundtrip: String =
    """SELECT event_type AS key, epoch_us(ts) AS t, max(value) AS v
      |FROM events GROUP BY 1, 2""".stripMargin

  /** to_json -> from_json round-trip (traces/timeseries.py:1241-1397):
    * ISO-8601 times with offset, JSON-lines records; must reproduce the
    * original points exactly. */
  def qJsonRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = roundtripScratch(spark, "json", dir)
    graft.sources.Sources.toJson(points(spark, dir), out)
    materializeThenClean(
      graft.sources.Sources.fromJson(spark, out, keyColumn = Some("key"), multiLine = false), out)
  }

  val sqlJsonRoundtrip: String = sqlCsvRoundtrip

  /** from_csv/from_json/to_json `transforms` parity (reference
    * time_transform/value_transform callables, traces/timeseries.py:
    * 1178-1235, 1248-1299, 1358-1380): export with NON-default transforms
    * (raw epoch-µs numeric times instead of ISO strings, doubled values)
    * and re-parse with the inverse pair — the round-trip reproduces the
    * original points only if both sides' transforms replace the default
    * parses. x2 then /2 is exact in IEEE doubles, so the oracle is the
    * untouched series. */
  def qTransformsRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = roundtripScratch(spark, "transforms", dir)
    graft.sources.Sources.toJson(points(spark, dir), out,
      timeTransform = Some(c => c), // keep the epoch-µs long, not ISO
      valueTransform = Some(c => c * 2.0))
    materializeThenClean(
      graft.sources.Sources.fromJson(spark, out, keyColumn = Some("key"),
        multiLine = false,
        timeTransform = Some(c => c.cast("long")),
        valueTransform = Some(c => c.cast("double") / 2.0)), out)
  }

  val sqlTransformsRoundtrip: String = sqlCsvRoundtrip

  /** remove / __delitem__ (traces/timeseries.py:356-365): delete the exact
    * points at the global first and last measurement times. */
  def qRemovePoint(spark: SparkSession, dir: String): DataFrame = {
    val pts = points(spark, dir)
    val (tmin, tmax) = eventBounds(spark, dir)
    SeriesOps.removePoint(SeriesOps.removePoint(pts, lit(tmin)), lit(tmax))
  }

  val sqlRemovePoint: String =
    """WITH pts AS (
      |  SELECT event_type AS key, epoch_us(ts) AS t, max(value) AS v
      |  FROM events GROUP BY 1, 2),
      |b AS (SELECT min(t) AS tmin, max(t) AS tmax FROM pts)
      |SELECT key, t, v FROM pts
      |WHERE t <> (SELECT tmin FROM b) AND t <> (SELECT tmax FROM b)""".stripMargin

  /** __eq__ (traces/timeseries.py:1581-1582) as a distributed per-key
    * comparison: the series vs a copy with its global-earliest point
    * removed — the key holding that point compares unequal, the rest
    * equal. The default is deliberately NOT compared (reference quirk). */
  def qSeriesEquals(spark: SparkSession, dir: String): DataFrame = {
    val pts = points(spark, dir)
    val (tmin, _) = eventBounds(spark, dir)
    SeriesOps.seriesEqualsBy(pts, SeriesOps.removePoint(pts, lit(tmin)))
  }

  val sqlSeriesEquals: String =
    """WITH pts AS (
      |  SELECT event_type AS key, epoch_us(ts) AS t, max(value) AS v
      |  FROM events GROUP BY 1, 2),
      |b AS (SELECT min(t) AS tmin FROM pts),
      |b2 AS (SELECT key, t, v FROM pts WHERE t <> (SELECT tmin FROM b)),
      |j AS (SELECT coalesce(p.key, q.key) AS key,
      |        (p.key IS NOT NULL AND q.key IS NOT NULL
      |         AND p.v IS NOT DISTINCT FROM q.v) AS eq
      |      FROM pts p FULL OUTER JOIN b2 q ON p.key = q.key AND p.t = q.t)
      |SELECT key, bool_and(eq) AS equal FROM j GROUP BY key""".stripMargin

  /** sample_interval's trailing ffill (timeseries.py:744-745): values under
    * 150 are treated as None, so cells whose entire coverage is null
    * aggregate to null and forward-fill from the previous cell; leading
    * null cells stay null (pandas ffill leaves leading NaN). */
  def qSampleIntervalFfill(spark: SparkSession, dir: String): DataFrame = {
    val pts = points(spark, dir)
      .withColumn("v", when(col("v") < 150.0, nullD).otherwise(col("v")))
    val (h0, h1) = dayBounds(spark, dir)
    Regularize.sampleInterval(pts, h0, h1, 6 * HOUR, nullD, ffill = true)
      .select(col("key"), col("cell_start"),
        round(col("mean"), 6).as("mean"), col("min"), col("max"))
  }

  val sqlSampleIntervalFfill: String = {
    val p = 6 * HOUR
    s"""WITH pts AS (
       |  SELECT event_type AS key, epoch_us(ts) AS t,
       |         CASE WHEN max(value) < 150.0 THEN NULL ELSE max(value) END AS v
       |  FROM events GROUP BY 1, 2),
       |b AS (SELECT min(t) AS tmin, max(t) AS tmax FROM pts),
       |bb AS (SELECT (tmin // $DAY) * $DAY AS h0, ((tmax // $DAY) + 1) * $DAY AS h1 FROM b),
       |segs AS (
       |  SELECT key, t AS t0,
       |         coalesce(lead(t) OVER (PARTITION BY key ORDER BY t),
       |                  (SELECT h1 FROM bb)) AS t1, v
       |  FROM pts
       |  UNION ALL
       |  SELECT key, (SELECT h0 FROM bb), min(t), NULL FROM pts GROUP BY key),
       |cells AS (
       |  SELECT key, v,
       |         greatest(t0, $p * cell) AS t0, least(t1, $p * (cell + 1)) AS t1,
       |         $p * cell AS cell_start
       |  FROM segs, unnest(generate_series(t0 // $p, t1 // $p)) c(cell)
       |  WHERE t1 > t0),
       |ag AS (
       |  SELECT key, cell_start,
       |    sum(v * (t1 - t0)) / $p.0 AS mean, min(v) AS min, max(v) AS max
       |  FROM cells WHERE t1 > t0 GROUP BY 1, 2)
       |SELECT key, cell_start,
       |  round(last_value(mean IGNORE NULLS) OVER w, 6) AS mean,
       |  last_value(min IGNORE NULLS) OVER w AS min,
       |  last_value(max IGNORE NULLS) OVER w AS max
       |FROM ag
       |WINDOW w AS (PARTITION BY key ORDER BY cell_start
       |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin
  }

  /** masked sample (traces/timeseries.py:592-614 with mask): the per-key
    * mask is the boolean threshold series' true intervals, and the hourly
    * grid restarts at every mask-true period (inclusive of its end),
    * exactly like the reference's per-period `while current_time <= end`
    * loop. Completes the mask-composition surface: distribution (q06),
    * n_points (q43), sample (here). */
  def qMaskedSample(spark: SparkSession, dir: String): DataFrame = {
    val pts = points(spark, dir)
    val (tmin, tmax) = eventBounds(spark, dir)
    val mask = SeriesOps.trueIntervals(
      SeriesOps.threshold(pts, lit(150.0)), lit(tmin), lit(tmax), lit(0.0))
    Regularize.sampleMasked(pts, mask, HOUR, nullD)
  }

  val sqlMaskedSample: String =
    s"""WITH pts AS (
       |  SELECT event_type AS key, epoch_us(ts) AS t, max(value) AS v
       |  FROM events GROUP BY 1, 2),
       |b AS (SELECT min(t) AS tmin, max(t) AS tmax FROM pts),
       |bsegs AS (
       |  SELECT key, t AS m0,
       |         coalesce(lead(t) OVER (PARTITION BY key ORDER BY t),
       |                  (SELECT tmax FROM b)) AS m1,
       |         (v > 150.0) AS bv
       |  FROM pts),
       |mask AS (SELECT key, m0, m1 FROM bsegs WHERE bv AND m1 > m0),
       |grid AS (
       |  SELECT key, gt FROM mask, unnest(generate_series(m0, m1, $HOUR)) g(gt))
       |SELECT g.key AS key, g.gt AS t, p.v AS v
       |FROM grid g ASOF LEFT JOIN pts p ON g.key = p.key AND g.gt >= p.t""".stripMargin

  /** multiply / __mul__ (traces/timeseries.py:1503-1505): click(t) × view(t)
    * at the union of measurement times, both sides defaulting to 1.0 before
    * their first point; same skew-safe bucketed alignment as q19. */
  def qMultiply(spark: SparkSession, dir: String): DataFrame = {
    val pts = points(spark, dir)
    val a = pts.filter(col("key") === "click").withColumn("key", constKey("pair", col("key")))
    val b = pts.filter(col("key") === "view").withColumn("key", constKey("pair", col("key")))
    MergeOps.multiply(a, b, lit(1.0), lit(1.0), dayBucket)
      .withColumn("v", round(col("v"), 6))
  }

  val sqlMultiply: String =
    """WITH pts AS (
      |  SELECT event_type AS key, epoch_us(ts) AS t, max(value) AS v
      |  FROM events WHERE event_type IN ('click', 'view') GROUP BY 1, 2),
      |u AS (
      |  SELECT t, CASE WHEN key = 'click' THEN v END AS va,
      |         CASE WHEN key = 'view' THEN v END AS vb,
      |         CASE WHEN key = 'click' THEN 0 ELSE 1 END AS side
      |  FROM pts),
      |f AS (SELECT t, side,
      |        last_value(va IGNORE NULLS) OVER (ORDER BY t, side ROWS UNBOUNDED PRECEDING) AS la,
      |        last_value(vb IGNORE NULLS) OVER (ORDER BY t, side ROWS UNBOUNDED PRECEDING) AS lb,
      |        row_number() OVER (PARTITION BY t ORDER BY side DESC) AS rn
      |      FROM u)
      |SELECT 'pair' AS key, t, round(coalesce(la, 1.0) * coalesce(lb, 1.0), 6) AS v
      |FROM f WHERE rn = 1""".stripMargin

  /** remove_points_from_interval (traces/timeseries.py:367-388, [start,end)
    * half-open) chained with is_not_none (timeseries.py:330-354): values
    * under 150 are treated as None measurements, the interval's points are
    * deleted, and the availability series maps value→not-None. */
  def qRemoveIntervalNotNone(spark: SparkSession, dir: String): DataFrame = {
    val pts = points(spark, dir)
      .withColumn("v", when(col("v") < 150.0, nullD).otherwise(col("v")))
    SeriesOps.isNotNone(SeriesOps.removeInterval(pts, lit(SI_START), lit(SI_END)))
  }

  val sqlRemoveIntervalNotNone: String =
    s"""WITH pts AS (
       |  SELECT event_type AS key, epoch_us(ts) AS t,
       |         CASE WHEN max(value) < 150.0 THEN NULL ELSE max(value) END AS v
       |  FROM events GROUP BY 1, 2)
       |SELECT key, t, CAST(v IS NOT NULL AS DOUBLE) AS v
       |FROM pts WHERE NOT (t >= $SI_START AND t < $SI_END)""".stripMargin

  // ---------- categorical (string-valued) series ----------

  /** events -> per-user STATE series (key = user_id, t = µs,
    * sv = event_type): the reference's dynamic-typing surface — TimeSeries
    * holds arbitrary hashable values (traces/timeseries.py:47), states
    * being the canonical non-numeric case. Duplicate (key, t) resolve by
    * SortedDict overwrite = last write wins; event_id is insertion order,
    * so max_by(event_type, event_id) is the deterministic tiebreak. */
  def statePoints(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .parquet(s"$dir/events.parquet")
      .groupBy(col("user_id").as("key"), tsUs.as("t"))
      .agg(max_by(col("event_type"), col("event_id")).as("sv"))

  private val sqlStatePts: String =
    """WITH spts AS (
      |  SELECT user_id AS key, epoch_us(ts) AS t, arg_max(event_type, event_id) AS sv
      |  FROM events GROUP BY 1, 2)""".stripMargin

  /** Categorical distribution() (traces/timeseries.py:877 over hashable
    * values; traces/histogram.py keys by value): per-user time-in-state
    * durations and normalized fractions under previous interpolation. */
  def qStateDistribution(spark: SparkSession, dir: String): DataFrame =
    graft.categorical.CategoricalOps.stateDistribution(statePoints(spark, dir))

  val sqlStateDistribution: String =
    sqlStatePts +
      """,
        |segs AS (
        |  SELECT key, sv, lead(t) OVER (PARTITION BY key ORDER BY t) - t AS dur
        |  FROM spts QUALIFY dur IS NOT NULL),
        |d AS (SELECT key, sv, CAST(sum(dur) AS BIGINT) AS dur_us FROM segs GROUP BY 1, 2)
        |SELECT key, sv, dur_us,
        |       round(CAST(dur_us AS DOUBLE) / sum(dur_us) OVER (PARTITION BY key), 6) AS frac
        |FROM d""".stripMargin

  /** State-transition counts — iterintervals(2) (traces/timeseries.py:631)
    * over every user's state series, aggregated into a (from, to, n)
    * Markov table; self-transitions count, exactly as iterintervals
    * yields repeated measurements. */
  def qStateTransitions(spark: SparkSession, dir: String): DataFrame =
    graft.categorical.CategoricalOps.transitions(statePoints(spark, dir))

  val sqlStateTransitions: String =
    sqlStatePts +
      """,
        |pr AS (
        |  SELECT sv AS from_state, lead(sv) OVER (PARTITION BY key ORDER BY t) AS to_state
        |  FROM spts)
        |SELECT from_state, to_state, count(*) AS n
        |FROM pr WHERE to_state IS NOT NULL GROUP BY 1, 2""".stripMargin

  /** Markov next-state baseline over the user state sequences: modal
    * next state per current state with its hit rate (the q?? state
    * transitions rolled into the zero-parameter predictor). */
  def qMarkovBaseline(spark: SparkSession, dir: String): DataFrame =
    graft.categorical.CategoricalOps.markovBaseline(statePoints(spark, dir))

  val sqlMarkovBaseline: String =
    sqlStatePts +
      """,
        |pr AS (
        |  SELECT sv AS from_state,
        |    lead(sv) OVER (PARTITION BY key ORDER BY t) AS to_state
        |  FROM spts),
        |c AS (SELECT from_state, to_state, count(*) AS n
        |      FROM pr WHERE to_state IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT from_state, CAST(sum(n) AS BIGINT) AS n_total FROM c GROUP BY 1),
        |top AS (SELECT from_state, to_state AS top_next, n AS n_top
        |        FROM c QUALIFY row_number() OVER (PARTITION BY from_state
        |          ORDER BY n DESC, to_state) = 1)
        |SELECT top.from_state, top.top_next, top.n_top, tot.n_total,
        |  round(CAST(top.n_top AS DOUBLE) / tot.n_total, 6) AS hit_rate
        |FROM top JOIN tot ON top.from_state = tot.from_state""".stripMargin

  /** String-valued sample() (traces/timeseries.py:1409): each user's
    * previous-interpolated state on a global 6-hour grid; grid times
    * before a user's first event carry the default (null), like get()
    * before the first measurement. Oracle = DuckDB ASOF join. */
  def qStateSample(spark: SparkSession, dir: String): DataFrame = {
    val pts = statePoints(spark, dir)
    val (tmin, tmax) = eventBounds(spark, dir)
    val start = Math.floorDiv(tmin, 6 * HOUR) * (6 * HOUR)
    graft.categorical.CategoricalOps.sampleStates(
      pts, pts.select("key").distinct(), start, tmax, 6 * HOUR)
  }

  val sqlStateSample: String =
    sqlStatePts +
      s""",
         |b AS (SELECT min(t) AS tmin, max(t) AS tmax FROM spts),
         |grid AS (
         |  SELECT k.key, g.g AS t
         |  FROM (SELECT DISTINCT key FROM spts) k,
         |       (SELECT unnest(generate_series(
         |          (SELECT tmin // ${6 * HOUR} * ${6 * HOUR} FROM b),
         |          (SELECT tmax FROM b), ${6 * HOUR})) AS g) g)
         |SELECT grid.key, grid.t, spts.sv
         |FROM grid ASOF LEFT JOIN spts
         |  ON grid.key = spts.key AND grid.t >= spts.t""".stripMargin

  // ---------- duplicate clusters / survivors / sampling ----------

  /** Transitive closure of the LSH candidate pairs: every doc labeled with
    * its duplicate-cluster id (min doc_id of the connected component;
    * docs in no pair are their own singleton cluster). Engine: pointer-
    * jumping connected components (Clusters.connectedComponents); oracle:
    * DuckDB recursive reachability over the same pair graph. */
  def qDupClusters(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.minhashCandidates(docs(spark, dir), maxBucket = LSH_MAX_BUCKET)
    val cc = graft.dedup.Clusters.connectedComponents(pairs)
    docs(spark, dir)
      .select(col("doc_id"))
      .join(cc.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cluster"), col("doc_id")).as("cluster_id"))
  }

  private val sqlCcCte: String =
    """,
      |edges AS (
      |  SELECT x.doc_id AS u, y.doc_id AS v
      |  FROM bands x JOIN bands y
      |    ON x.band = y.band AND x.band_hash = y.band_hash AND x.doc_id <> y.doc_id
      |  GROUP BY 1, 2),
      |reach(node, r) AS (
      |  SELECT u, u FROM edges GROUP BY 1, 2
      |  UNION
      |  SELECT reach.node, e.v FROM reach JOIN edges e ON e.u = reach.r),
      |cc AS (SELECT node, min(r) AS cluster FROM reach GROUP BY 1)""".stripMargin

  val sqlDupClusters: String =
    "WITH RECURSIVE " + sqlBandsCte.stripPrefix("WITH ") + sqlCcCte +
      """
        |SELECT d.doc_id, coalesce(cc.cluster, d.doc_id) AS cluster_id
        |FROM documents d LEFT JOIN cc ON d.doc_id = cc.node""".stripMargin

  /** One survivor per duplicate cluster — keep the longest crawl
    * (max n_chars, ties to the smallest doc_id), with the cluster size.
    * The select-best composition every dedup pipeline ends with. */
  def qDedupSurvivors(spark: SparkSession, dir: String): DataFrame = {
    val members = qDupClusters(spark, dir)
      .join(docs(spark, dir).select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      .select(col("doc_id").as("node"), col("cluster_id").as("cluster"), col("n_chars"))
    graft.dedup.Clusters.survivors(members, "n_chars")
      .select(col("cluster").as("cluster_id"), col("survivor").as("survivor_id"),
        col("cluster_size"))
  }

  val sqlDedupSurvivors: String =
    "WITH RECURSIVE " + sqlBandsCte.stripPrefix("WITH ") + sqlCcCte +
      """,
        |m AS (
        |  SELECT d.doc_id, coalesce(cc.cluster, d.doc_id) AS cluster_id, d.n_chars
        |  FROM documents d LEFT JOIN cc ON d.doc_id = cc.node)
        |SELECT cluster_id, doc_id AS survivor_id, cluster_size FROM (
        |  SELECT cluster_id, doc_id,
        |         count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
        |         row_number() OVER (PARTITION BY cluster_id
        |                            ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM m) WHERE rn = 1""".stripMargin

  /** Deterministic stratified sampling (training-data mixing ratios):
    * membership is a pure hash of doc_id against a per-language fraction,
    * so the sample is identical in any engine, at any partitioning, and
    * stable under corpus growth (sample.Sampling). */
  def qStratifiedSample(spark: SparkSession, dir: String): DataFrame =
    graft.sample.Sampling.stratifiedSample(
      docs(spark, dir).select(col("doc_id"), col("lang")),
      "doc_id", "lang",
      Map("en" -> 0.5, "de" -> 1.0, "fr" -> 0.25), defaultFraction = 0.1)

  val sqlStratifiedSample: String =
    """SELECT doc_id, lang FROM documents
      |WHERE ('0x' || substr(md5('smp' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |        / 4294967296.0
      |      < CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 1.0
      |                  WHEN 'fr' THEN 0.25 ELSE 0.1 END""".stripMargin

  /** PII redaction (CCNet/RefinedWeb-style scrub): the synthetic corpus
    * carries no PII, so the query first APPENDS deterministic
    * doc_id-derived email/IP/phone strings in both engines, then counts
    * and redacts them; the md5 of the redacted text proves byte-exact
    * replacement, not just counting. */
  def qPiiRedaction(spark: SparkSession, dir: String): DataFrame = {
    val withPii = docs(spark, dir).select(col("doc_id"),
      concat(col("text"),
        lit(" Contact user"), col("doc_id"), lit("@example.com or 10.0."),
        pmod(col("doc_id"), lit(256)), lit("."),
        pmod(floor(col("doc_id") / 256).cast("long"), lit(256)),
        lit(" call +1415555"),
        lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")).as("text"))
    graft.text.TextOps.piiCounts(withPii)
      .select(col("doc_id"), col("n_emails"), col("n_ips"), col("n_phones"),
        md5(graft.text.TextOps.redactPii(col("text")).cast("binary")).as("redacted_md5"))
  }

  val sqlPiiRedaction: String = {
    import graft.text.TextOps.{EMAIL_RE, IPV4_RE, PHONE_RE}
    s"""WITH p AS (
       |  SELECT doc_id,
       |    text || ' Contact user' || doc_id || '@example.com or 10.0.' ||
       |      (doc_id % 256) || '.' || ((doc_id // 256) % 256) ||
       |      ' call +1415555' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
       |  FROM documents),
       |e AS (SELECT doc_id, text,
       |        regexp_replace(text, '$EMAIL_RE', '<EMAIL>', 'g') AS no_email
       |      FROM p)
       |SELECT doc_id,
       |  len(regexp_extract_all(text, '$EMAIL_RE')) AS n_emails,
       |  len(regexp_extract_all(no_email, '$IPV4_RE')) AS n_ips,
       |  len(regexp_extract_all(no_email, '$PHONE_RE')) AS n_phones,
       |  md5(regexp_replace(regexp_replace(no_email,
       |        '$IPV4_RE', '<IP>', 'g'), '$PHONE_RE', '<PHONE>', 'g')) AS redacted_md5
       |FROM e""".stripMargin
  }

  /** Gopher repetition filters (Rae et al. 2021): duplicate-line and
    * 2-gram repetition statistics per document, plus the published keep
    * thresholds. The synthetic corpus repeats its filler word heavily, so
    * top_2gram_frac is a REAL discriminator here, not a constant. */
  def qRepetition(spark: SparkSession, dir: String): DataFrame =
    graft.text.TextOps.repetitionFeatures(docs(spark, dir))
      .select(col("doc_id"), col("n_lines"), col("dup_line_frac"),
        col("total_2grams"), col("distinct_2grams"),
        col("top_2gram_frac"), col("dup_2gram_frac"),
        col("repetition_keep").cast("int").as("repetition_keep"))

  val sqlRepetition: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_extract_all(text, '\S+') AS tk,
      |         list_filter(string_split(text, chr(10)), l -> len(l) > 0) AS lines
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, array_to_string(tk[i : i + 1], ' ') AS gram
      |  FROM toks, unnest(generate_series(1, len(tk) - 1)) s(i)
      |  WHERE len(tk) >= 2),
      |c AS (SELECT doc_id, gram, count(*) AS n FROM g GROUP BY 1, 2),
      |a AS (SELECT doc_id, sum(n) AS total, count(*) AS dis, max(n) AS top
      |      FROM c GROUP BY 1)
      |SELECT t.doc_id,
      |  CAST(len(t.lines) AS INT) AS n_lines,
      |  CASE WHEN len(t.lines) > 0
      |       THEN round(1.0 - len(list_distinct(t.lines)) * 1.0 / len(t.lines), 6)
      |       ELSE 0.0 END AS dup_line_frac,
      |  CAST(coalesce(a.total, 0) AS BIGINT) AS total_2grams,
      |  coalesce(a.dis, 0) AS distinct_2grams,
      |  coalesce(round(a.top * 1.0 / a.total, 6), 0.0) AS top_2gram_frac,
      |  coalesce(round(1.0 - a.dis * 1.0 / a.total, 6), 0.0) AS dup_2gram_frac,
      |  CAST((coalesce(round(a.top * 1.0 / a.total, 6), 0.0) <= 0.2 AND
      |        (CASE WHEN len(t.lines) > 0
      |              THEN round(1.0 - len(list_distinct(t.lines)) * 1.0 / len(t.lines), 6)
      |              ELSE 0.0 END) <= 0.3) AS INT) AS repetition_keep
      |FROM toks t LEFT JOIN a ON t.doc_id = a.doc_id""".stripMargin

  /** Benchmark decontamination (GPT-3/PaLM-style n-gram overlap): a
    * deterministic ~1% slice of the corpus plays the evaluation set;
    * every remaining doc reports how many of its shingles appear in the
    * benchmark's shingle vocabulary. */
  def qContamination(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    Dedup.contamination(
      d.filter(pmod(col("doc_id"), lit(97)) =!= 0),
      d.filter(pmod(col("doc_id"), lit(97)) === 0))
      .withColumn("contaminated", col("contaminated").cast("int"))
  }

  val sqlContamination: String =
    """WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS tk FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |    list_distinct([array_to_string(tk[i : i + 2], ' ')
      |                   for i in generate_series(1, greatest(len(tk) - 2, 1))]) AS sh
      |  FROM toks),
      |bench AS (SELECT DISTINCT s FROM sh, unnest(sh) t(s) WHERE doc_id % 97 = 0),
      |docsh AS (SELECT doc_id, s FROM sh, unnest(sh) t(s) WHERE doc_id % 97 <> 0),
      |a AS (
      |  SELECT d.doc_id, count(*) AS n_shingles,
      |         CAST(sum(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |           AS n_contaminated
      |  FROM docsh d LEFT JOIN bench b ON d.s = b.s GROUP BY 1)
      |SELECT doc_id, n_shingles, n_contaminated,
      |       round(n_contaminated * 1.0 / n_shingles, 6) AS contamination_frac,
      |       CAST(n_contaminated >= 1 AS INT) AS contaminated
      |FROM a""".stripMargin

  /** CCNet-style segment-level dedup (Wenzek et al. 2020): every distinct
    * 3-word segment survives only at its first (doc, position) occurrence
    * corpus-wide; each doc is rewritten to its surviving segments. The
    * 3-word width makes cross-doc collisions real on this vocabulary
    * (~19% of segments dedup away at sf0.01). */
  def qSegmentDedup(spark: SparkSession, dir: String): DataFrame =
    Dedup.segmentDedup(docs(spark, dir), t => Dedup.wordWindows(t, 3))

  val sqlSegmentDedup: String =
    """WITH toks AS (SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents),
      |segs AS (
      |  SELECT doc_id, i, array_to_string(tk[(i*3+1):(i*3+3)], ' ') AS seg
      |  FROM toks, unnest(generate_series(0, CAST(ceil(len(tk)/3.0) AS BIGINT) - 1)) s(i)),
      |perdoc AS (SELECT md5(seg) AS h, doc_id, min(i) AS pos FROM segs GROUP BY 1, 2),
      |win AS (SELECT h, min(doc_id) AS doc_id, arg_min(pos, doc_id) AS pos
      |        FROM perdoc GROUP BY 1),
      |keep AS (SELECT doc_id, list_sort(list(pos)) AS kp FROM win GROUP BY 1)
      |SELECT t.doc_id,
      |  CAST(ceil(len(t.tk)/3.0) AS INT) AS n_segments,
      |  CAST(coalesce(len(k.kp), 0) AS INT) AS n_kept,
      |  coalesce(array_to_string(
      |    [array_to_string(t.tk[(p*3+1):(p*3+3)], ' ') for p in coalesce(k.kp, [])],
      |    ' '), '') AS text_dedup
      |FROM toks t LEFT JOIN keep k ON t.doc_id = k.doc_id""".stripMargin

  /** GPT-style concat-and-chunk sequence packing: md5-shuffle the corpus
    * deterministically, concatenate the token stream, chunk into 128-token
    * blocks; output the (block, doc) span table. */
  def qPackSequences(spark: SparkSession, dir: String): DataFrame =
    graft.pack.Packing.packSequences(
      docs(spark, dir), size(graft.text.TextOps.wsTokens(col("text"))), 128L)

  val sqlPackSequences: String =
    """WITH d AS (
      |  SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS n,
      |         md5(CAST(doc_id AS VARCHAR) || '#42') AS h
      |  FROM documents
      |  WHERE len(regexp_extract_all(text, '\S+')) > 0),
      |c AS (
      |  SELECT doc_id, n,
      |         CAST(sum(n) OVER (ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c1
      |  FROM d),
      |e AS (SELECT doc_id, n, c1 - n AS c0, c1 FROM c)
      |SELECT b AS block_id, doc_id,
      |  greatest(0, b*128 - c0) AS tok_start,
      |  least(n, (b+1)*128 - c0) AS tok_end
      |FROM e, unnest(generate_series(c0 // 128, (c1-1) // 128)) s(b)""".stripMargin

  /** Per-domain quota (web-corpus practice: cap any one domain's share of
    * the training mix): keep the 10 longest docs per source (20 sources x 25 docs at sf0.01, so the quota genuinely bites), skew-safe
    * two-phase top-N. */
  def qDomainCap(spark: SparkSession, dir: String): DataFrame =
    graft.sample.Sampling.capPerGroup(
      docs(spark, dir).select(col("source"), col("doc_id"), col("n_chars")),
      col("source"), Seq(col("n_chars").desc, col("doc_id").asc), 10, col("doc_id"))

  val sqlDomainCap: String =
    """SELECT source, doc_id, n_chars, CAST(rank AS INT) AS rank FROM (
      |  SELECT source, doc_id, n_chars,
      |    row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rank
      |  FROM documents) WHERE rank <= 10""".stripMargin

  /** URL canonicalization + host/domain extraction (text.UrlOps): the
    * synthetic corpus has no URL column, so deterministic doc_id-derived
    * URLs — five shapes covering uppercase scheme/host, default ports,
    * www., utm_* params in first and later positions, fragments, multi-
    * label suffixes, and trailing slashes — are built identically in both
    * engines, then canonicalized by the real rules. */
  /** Deterministic doc_id-derived URL over the five q75 shapes (shared by
    * q75 and the q79 pipeline; the synthetic corpus has no URL column).
    * Shape 4 carries no doc_id, so distinct docs from the same
    * (source, doc_id%7) host genuinely collide after canonicalization —
    * the URL-dedup stage has real work to do. */
  private def synthUrl: org.apache.spark.sql.Column = {
    val m = pmod(col("doc_id"), lit(5))
    val hostCore = concat(col("source"), lit("-"), pmod(col("doc_id"), lit(7)))
    when(m === 0, concat(lit("HTTPS://WWW."), upper(hostCore),
        lit(".Example.COM:443/Art/"), col("doc_id"),
        lit("?utm_source=feed&utm_campaign=x&id="), col("doc_id"), lit("#frag")))
      .when(m === 1, concat(lit("http://"), hostCore, lit(".example.com:80/p/"),
        col("doc_id"), lit("/")))
      .when(m === 2, concat(lit("https://news."), hostCore, lit(".example.co.uk/p/"),
        col("doc_id"), lit("?id="), col("doc_id"), lit("&utm_medium=rss")))
      .when(m === 3, concat(lit("http://www."), hostCore, lit(".example.com/p/"),
        col("doc_id"), lit("?utm_x=1&id="), col("doc_id")))
      .otherwise(concat(lit("https://"), hostCore, lit(".example.com/")))
  }

  def qUrlCanon(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.UrlOps
    val d = docs(spark, dir)
    val url = synthUrl
    val canon = UrlOps.canonicalizeUrl(url)
    val host = UrlOps.hostOf(canon)
    d.select(col("doc_id"), url.as("url"), canon.as("canon_url"), host.as("host"),
      UrlOps.registeredDomain(host).as("domain"))
  }

  /** The synthetic-URL CASE (mirrors [[synthUrl]]) and the c1→c6
    * canonicalization CTE chain, shared verbatim by the q75 and q79
    * oracles — the Scala side shares synthUrl/UrlOps for exactly the same
    * reason: the canonicalization rules must not be able to drift between
    * the two queries. The chain expects a CTE `u` providing (url, …) and
    * yields c6 with canon_url + host added; every step is `SELECT *` so a
    * caller's extra carried columns (q79 keeps source/n_chars) pass
    * through. */
  private val sqlSynthUrlCase: String =
    """CASE doc_id % 5
      |      WHEN 0 THEN 'HTTPS://WWW.' || upper(source || '-' || (doc_id % 7)) ||
      |        '.Example.COM:443/Art/' || doc_id ||
      |        '?utm_source=feed&utm_campaign=x&id=' || doc_id || '#frag'
      |      WHEN 1 THEN 'http://' || source || '-' || (doc_id % 7) ||
      |        '.example.com:80/p/' || doc_id || '/'
      |      WHEN 2 THEN 'https://news.' || source || '-' || (doc_id % 7) ||
      |        '.example.co.uk/p/' || doc_id || '?id=' || doc_id || '&utm_medium=rss'
      |      WHEN 3 THEN 'http://www.' || source || '-' || (doc_id % 7) ||
      |        '.example.com/p/' || doc_id || '?utm_x=1&id=' || doc_id
      |      ELSE 'https://' || source || '-' || (doc_id % 7) || '.example.com/'
      |    END""".stripMargin

  private val sqlCanonChain: String =
    """c1 AS (SELECT *, regexp_replace(url, '#.*', '') AS nofrag FROM u),
      |c2 AS (SELECT *, coalesce(regexp_extract(nofrag,
      |         '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*'), '') AS prefix FROM c1),
      |c3 AS (SELECT *, substr(nofrag, len(prefix) + 1) AS rest FROM c2),
      |c3b AS (SELECT *, coalesce(regexp_extract(rest, '^[^?]*'), '') AS path,
      |          substr(rest, len(coalesce(regexp_extract(rest, '^[^?]*'), '')) + 1) AS query
      |        FROM c3),
      |c4 AS (SELECT *,
      |         regexp_replace(regexp_replace(regexp_replace(lower(prefix),
      |           '^(http://[^/:]+):80$', '\1'),
      |           '^(https://[^/:]+):443$', '\1'),
      |           '^(https?://)www\.', '\1') AS auth,
      |         regexp_replace(path, '/$', '') AS path2,
      |         regexp_replace(regexp_replace(query,
      |           '[?&]utm_[A-Za-z_]+=[^&]*', '', 'g'),
      |           '^&', '?') AS query2
      |       FROM c3b),
      |c5 AS (SELECT *, auth || path2 || query2 AS canon_url FROM c4),
      |c6 AS (SELECT *, coalesce(regexp_extract(canon_url,
      |         '^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1), '') AS host FROM c5)""".stripMargin

  val sqlUrlCanon: String =
    s"""WITH u AS (
      |  SELECT doc_id,
      |    $sqlSynthUrlCase AS url
      |  FROM documents),
      |$sqlCanonChain
      |SELECT doc_id, url, canon_url, host,""".stripMargin + "\n" +
    """  CASE WHEN regexp_matches(host, '[^.]+\.co\.uk$')
      |         THEN regexp_extract(host, '([^.]+\.co\.uk)$', 1)
      |       WHEN regexp_matches(host, '[^.]+\.com\.au$')
      |         THEN regexp_extract(host, '([^.]+\.com\.au)$', 1)
      |       WHEN regexp_matches(host, '[^.]+\.co\.jp$')
      |         THEN regexp_extract(host, '([^.]+\.co\.jp)$', 1)
      |       WHEN coalesce(regexp_extract(host, '([^.]+\.[^.]+)$', 1), '') <> ''
      |         THEN regexp_extract(host, '([^.]+\.[^.]+)$', 1)
      |       ELSE host END AS domain
      |FROM c6""".stripMargin

  /** fastText-shaped hashed-n-gram classifier score (text.Classifier):
    * dyadic md5-derived weights make the doc score bit-reproducible in
    * any engine and under any summation order. */
  def qClassifierScore(spark: SparkSession, dir: String): DataFrame =
    graft.text.Classifier.hashedNgramScore(docs(spark, dir))
      .select(col("doc_id"), col("n_grams"), col("clf_score"))

  val sqlClassifierScore: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    [lower(t) for t in regexp_extract_all(text, '\S+')] AS tk
      |  FROM documents),
      |g AS (
      |  SELECT doc_id,
      |    tk || CASE WHEN len(tk) >= 2
      |      THEN [array_to_string(tk[i : i + 1], ' ')
      |            for i in generate_series(1, len(tk) - 1)]
      |      ELSE [] END AS grams
      |  FROM toks),
      |e AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT % 4096 AS b
      |      FROM g, unnest(grams) t(s)),
      |w AS (SELECT doc_id,
      |        sum((('0x' || substr(md5('w' || CAST(b AS VARCHAR)), 1, 8))::BIGINT % 2048)
      |            / 1024.0 - 1.0) AS s,
      |        count(*) AS n
      |      FROM e GROUP BY 1)
      |SELECT t.doc_id,
      |  CAST(coalesce(w.n, 0) AS INT) AS n_grams,
      |  coalesce(round(1.0 / (1.0 + exp(-(w.s / w.n))), 6), 0.5) AS clf_score
      |FROM g t LEFT JOIN w USING (doc_id)""".stripMargin

  /** DSIR importance weights (sample.Dsir): a deterministic ~4% slice
    * (doc_id % 23 = 0) plays the target set; every remaining doc gets
    * log w = Σ_g quantized log-ratio of its hashed-gram buckets. */
  def qDsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    graft.sample.Dsir.importanceWeights(
      d.filter(pmod(col("doc_id"), lit(23)) =!= 0),
      d.filter(pmod(col("doc_id"), lit(23)) === 0))
  }

  val sqlDsirWeights: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    [lower(t) for t in regexp_extract_all(text, '\S+')] AS tk
      |  FROM documents),
      |g AS (
      |  SELECT doc_id,
      |    tk || CASE WHEN len(tk) >= 2
      |      THEN [array_to_string(tk[i : i + 1], ' ')
      |            for i in generate_series(1, len(tk) - 1)]
      |      ELSE [] END AS grams
      |  FROM toks),
      |e AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT % 8192 AS b
      |      FROM g, unnest(grams) t(s)),
      |rawb AS (SELECT b, count(*) AS rn FROM e WHERE doc_id % 23 <> 0 GROUP BY 1),
      |tgtb AS (SELECT b, count(*) AS tn FROM e WHERE doc_id % 23 = 0 GROUP BY 1),
      |tot AS (SELECT (SELECT CAST(sum(rn) AS BIGINT) FROM rawb) AS rtot,
      |               (SELECT CAST(sum(tn) AS BIGINT) FROM tgtb) AS ttot),
      |ratio AS (
      |  SELECT coalesce(r.b, t.b) AS b,
      |    CAST(round((ln((coalesce(t.tn, 0) + 1) * 1.0 / (tot.ttot + 8192))
      |              - ln((coalesce(r.rn, 0) + 1) * 1.0 / (tot.rtot + 8192)))
      |         * 1000000) AS BIGINT) AS lri
      |  FROM rawb r FULL OUTER JOIN tgtb t ON r.b = t.b, tot),
      |pd AS (SELECT e.doc_id, count(*) AS n_grams,
      |              CAST(sum(ratio.lri) AS BIGINT) AS lwi
      |       FROM e JOIN ratio ON e.b = ratio.b
      |       WHERE e.doc_id % 23 <> 0 GROUP BY 1)
      |SELECT d.doc_id,
      |  CAST(coalesce(pd.n_grams, 0) AS BIGINT) AS n_grams,
      |  round(coalesce(pd.lwi, 0) / 1000000.0, 6) AS log_weight
      |FROM documents d LEFT JOIN pd USING (doc_id)
      |WHERE d.doc_id % 23 <> 0""".stripMargin

  /** Temperature-based source mixing (sample.Sampling.temperatureMix):
    * alpha = 0.7 (the mT5 setting) over the 20 sources with a 250-row
    * budget — acceptance fractions land strictly between the natural and
    * uniform mixes, so the temperature genuinely bites. */
  def qTemperatureMix(spark: SparkSession, dir: String): DataFrame =
    graft.sample.Sampling.temperatureMix(
      docs(spark, dir).select(col("doc_id"), col("source")),
      "doc_id", "source", 0.7, 250L)

  val sqlTemperatureMix: String =
    """WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
      |z AS (SELECT sum(pow(n, 0.7)) AS z FROM c),
      |r AS (SELECT source,
      |        round(least(1.0, 250 * pow(n, 0.7) / z.z / n), 6) AS accept_frac
      |      FROM c, z)
      |SELECT d.source, d.doc_id, r.accept_frac
      |FROM documents d JOIN r ON d.source IS NOT DISTINCT FROM r.source
      |WHERE ('0x' || substr(md5('smp' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
      |        / 4294967296.0
      |      < r.accept_frac""".stripMargin

  /** End-to-end curation pipeline (q79): the stages a web-corpus run
    * chains in practice, each the REAL library operator, composed as one
    * declarative plan — (1) URL canonicalization ([[graft.text.UrlOps]]),
    * (2) canonical-URL dedup (first occurrence survives), (3) exact-text
    * dedup ([[graft.dedup.Dedup.exact]]), (4) Gopher repetition gate
    * ([[graft.text.TextOps.repetitionFeatures]]), (5) classifier-score
    * gate ([[graft.text.Classifier.hashedNgramScore]]), (6) per-host
    * diversity cap ([[graft.sample.Sampling.capPerGroup]], skew-safe
    * two-phase top-N).
    *
    * Scale shape: stages 1/4/5 are pure scan projections fused into ONE
    * pass over the corpus; the only shuffles are the two dedup-winner
    * aggregates (16-byte digests / canonical URLs, never text) and the
    * capped per-host rank. The gates filter BEFORE the cap, so the
    * window ranks only survivors. */
  def qCurationPipeline(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.{Classifier, TextOps, UrlOps}
    val d = docs(spark, dir)
    val canon = UrlOps.canonicalizeUrl(synthUrl)
    // The gates cost ~1 ms/row (interpreted higher-order functions), so
    // they must run at chosen cluster width, not input-SPLIT width (one
    // row group = one task), and they must be evaluated exactly once. Two
    // mechanisms enforce that together: (1) an explicit repartition —
    // user-specified partition counts are exempt from AQE coalescing,
    // which would otherwise fold this small-by-bytes but expensive-by-CPU
    // shuffle back to one partition; (2) the gate columns materialize
    // through first() over a window on the unique doc_id, because Catalyst
    // pushes predicates through plain projections by SUBSTITUTION (which
    // would re-inline the gate trees into the filter below the
    // repartition) but cannot push a predicate on a window output below
    // the window. The window's required distribution is exactly the
    // repartition's, so no extra exchange appears, and the filter tests
    // the materialized booleans.
    val wDoc = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
    val gated = Classifier.hashedNgramScore(
        TextOps.repetitionFeatures(
          d.repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
            .withColumn("canon_url", canon)
            .withColumn("host", UrlOps.hostOf(col("canon_url")))))
      .withColumn("_gate",
        first(struct(col("repetition_keep"), col("clf_score"))).over(wDoc))
      .select(col("doc_id"), col("source"), col("n_chars"), col("canon_url"),
        col("host"), col("_gate").getField("repetition_keep").as("repetition_keep"),
        col("_gate").getField("clf_score").as("clf_score"))
    // winner aggregates read their own cheap scan-side projections — the
    // canonical URL derives from (doc_id, source) only, no repartition
    val urlWinners = d.select(col("doc_id"), col("source"))
      .withColumn("canon_url", canon).groupBy("canon_url")
      .agg(min("doc_id").as("doc_id")).select("doc_id")
    val textWinners = Dedup.exact(d).select(col("survivor_id").as("doc_id"))
    val kept = gated
      .join(urlWinners, Seq("doc_id"), "left_semi")
      .join(textWinners, Seq("doc_id"), "left_semi")
      // clf_score is already rounded to 6 decimals inside the library, so
      // the >= 0.5 gate compares the SAME value the oracle computes — a
      // last-ulp exp() difference cannot flip membership
      .filter(col("repetition_keep") && col("clf_score") >= 0.5)
    graft.sample.Sampling.capPerGroup(
      kept.select(col("host"), col("doc_id"), col("source"), col("n_chars"),
        col("clf_score")),
      col("host"), Seq(col("n_chars").desc, col("doc_id").asc), 3, col("doc_id"))
  }

  val sqlCurationPipeline: String =
    s"""WITH u AS (
      |  SELECT doc_id, source, n_chars,
      |    $sqlSynthUrlCase AS url
      |  FROM documents),
      |$sqlCanonChain,""".stripMargin + "\n" +
    """uw AS (SELECT min(doc_id) AS doc_id FROM c6 GROUP BY canon_url),
      |tw AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
      |rtoks AS (
      |  SELECT doc_id, regexp_extract_all(text, '\S+') AS tk,
      |         list_filter(string_split(text, chr(10)), l -> len(l) > 0) AS lines
      |  FROM documents),
      |rg AS (
      |  SELECT doc_id, array_to_string(tk[i : i + 1], ' ') AS gram
      |  FROM rtoks, unnest(generate_series(1, len(tk) - 1)) s(i)
      |  WHERE len(tk) >= 2),
      |rc AS (SELECT doc_id, gram, count(*) AS n FROM rg GROUP BY 1, 2),
      |ra AS (SELECT doc_id, sum(n) AS total, max(n) AS top
      |       FROM rc GROUP BY 1),
      |rep AS (
      |  SELECT t.doc_id,
      |    (coalesce(round(a.top * 1.0 / a.total, 6), 0.0) <= 0.2 AND
      |     (CASE WHEN len(t.lines) > 0
      |           THEN round(1.0 - len(list_distinct(t.lines)) * 1.0 / len(t.lines), 6)
      |           ELSE 0.0 END) <= 0.3) AS keep
      |  FROM rtoks t LEFT JOIN ra a ON t.doc_id = a.doc_id),
      |ltoks AS (
      |  SELECT doc_id,
      |    [lower(t) for t in regexp_extract_all(text, '\S+')] AS tk
      |  FROM documents),
      |lg AS (
      |  SELECT doc_id,
      |    tk || CASE WHEN len(tk) >= 2
      |      THEN [array_to_string(tk[i : i + 1], ' ')
      |            for i in generate_series(1, len(tk) - 1)]
      |      ELSE [] END AS grams
      |  FROM ltoks),
      |le AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT % 4096 AS b
      |       FROM lg, unnest(grams) t(s)),
      |lw AS (SELECT doc_id,
      |         sum((('0x' || substr(md5('w' || CAST(b AS VARCHAR)), 1, 8))::BIGINT % 2048)
      |             / 1024.0 - 1.0) AS s,
      |         count(*) AS n
      |       FROM le GROUP BY 1),
      |clf AS (SELECT g.doc_id,
      |          coalesce(round(1.0 / (1.0 + exp(-(lw.s / lw.n))), 6), 0.5) AS clf_score
      |        FROM lg g LEFT JOIN lw USING (doc_id)),
      |kept AS (
      |  SELECT c.host, c.doc_id, c.source, c.n_chars, clf.clf_score
      |  FROM c6 c
      |  JOIN uw ON c.doc_id = uw.doc_id
      |  JOIN tw ON c.doc_id = tw.doc_id
      |  JOIN rep ON c.doc_id = rep.doc_id AND rep.keep
      |  JOIN clf ON c.doc_id = clf.doc_id AND clf.clf_score >= 0.5)
      |SELECT host, doc_id, source, n_chars, clf_score, CAST(rank AS INT) AS rank
      |FROM (SELECT *, row_number() OVER (PARTITION BY host
      |        ORDER BY n_chars DESC, doc_id) AS rank FROM kept)
      |WHERE rank <= 3""".stripMargin

  /** CCNet-style bigram-LM perplexity (text.Perplexity): a deterministic
    * 10% slice (doc_id % 10 = 0) trains the hashed count model; every doc
    * (train slice included, as CCNet scores its whole crawl) gets the
    * perplexity of its bigram stream under the smoothed model. */
  def qLmPerplexity(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    graft.text.Perplexity.perplexity(d, d.filter(pmod(col("doc_id"), lit(10)) === 0))
  }

  val sqlLmPerplexity: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    [lower(t) for t in regexp_extract_all(text, '\S+')] AS tk
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id,
      |    ('0x' || substr(md5(tk[i]), 1, 8))::BIGINT % 8192 AS ub,
      |    ('0x' || substr(md5(tk[i] || ' ' || tk[i+1]), 1, 8))::BIGINT % 65536 AS bb
      |  FROM toks, unnest(generate_series(1, len(tk) - 1)) s(i)
      |  WHERE len(tk) >= 2),
      |cu AS (SELECT ub, count(*) AS cu FROM bg WHERE doc_id % 10 = 0 GROUP BY 1),
      |cb AS (SELECT bb, count(*) AS cb FROM bg WHERE doc_id % 10 = 0 GROUP BY 1),
      |sc AS (
      |  SELECT g.doc_id,
      |    CAST(round(ln((coalesce(cb.cb, 0) + 1) * 1.0
      |                  / (coalesce(cu.cu, 0) + 65536)) * 1000000) AS BIGINT) AS lpi
      |  FROM bg g LEFT JOIN cb ON g.bb = cb.bb LEFT JOIN cu ON g.ub = cu.ub),
      |pd AS (SELECT doc_id, count(*) AS n_bigrams, CAST(sum(lpi) AS BIGINT) AS lps
      |       FROM sc GROUP BY 1)
      |SELECT d.doc_id,
      |  CAST(coalesce(pd.n_bigrams, 0) AS BIGINT) AS n_bigrams,
      |  CASE WHEN pd.n_bigrams IS NOT NULL
      |       THEN round(exp(-(lps / 1000000.0) / pd.n_bigrams), 6) END AS ppl
      |FROM documents d LEFT JOIN pd USING (doc_id)""".stripMargin

  /** HTML → text extraction (text.HtmlOps): wrap every document's text in
    * a deterministic page template that exercises EVERY step of the strip
    * chain — head with embedded style + script (the script body contains a
    * raw `<` and a literal `"</div>"`), comments, uppercase/attributed
    * tags, entity-escaped body text, a double-escaped `&amp;lt;` that must
    * survive as literal `&lt;` — then extract and measure. The oracle
    * replays the identical build + extract chain in DuckDB, so any
    * regex-semantics drift between engines fails the hash. */
  private val htmlTplA = "<html><!-- crawl "
  private val htmlTplB =
    " --><head><title>skip me</title><style>p{color:red}</style>" +
      "<script>if(1<2){x=\"</div>\"}</script></head><body><h1>Doc "
  private val htmlTplC = "</h1><P CLASS=\"b\">"
  private val htmlTplD =
    "</P><p>&amp;lt; stays&nbsp;&quot;quoted&quot; &#39;q&#39;</p>" +
      "<!-- tail --></body></html>"

  def qHtmlExtract(spark: SparkSession, dir: String): DataFrame = {
    val esc = replace(replace(replace(col("text"),
      lit("&"), lit("&amp;")), lit("<"), lit("&lt;")), lit(">"), lit("&gt;"))
    val html = concat(
      lit(htmlTplA), col("doc_id"), lit(htmlTplB), col("doc_id"),
      lit(htmlTplC), esc, lit(htmlTplD))
    docs(spark, dir).select(
      col("doc_id"),
      graft.text.HtmlOps.extractText(html).as("ext_text"))
      .withColumn("n_ext", length(col("ext_text")).cast("long"))
  }

  val sqlHtmlExtract: String = {
    def q(s: String) = "'" + s.replace("'", "''") + "'"
    val esc = "replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')"
    val html = s"${q(htmlTplA)} || CAST(doc_id AS VARCHAR) || ${q(htmlTplB)} || " +
      s"CAST(doc_id AS VARCHAR) || ${q(htmlTplC)} || $esc || ${q(htmlTplD)}"
    s"""WITH h AS (SELECT doc_id, $html AS html FROM documents),
       |e AS (SELECT doc_id, ${graft.text.HtmlOps.extractTextSql("html")} AS ext_text FROM h)
       |SELECT doc_id, ext_text, CAST(length(ext_text) AS BIGINT) AS n_ext FROM e""".stripMargin
  }

  /** ExactSubstr duplicated-span removal (dedup.Dedup.exactSubstrDedup):
    * L=5 token windows over the whole corpus; every non-first occurrence
    * of a duplicated window has its extent cut, first occurrences keep
    * their text. The oracle replays windows → winners → marked extents →
    * index-filtered rewrite in DuckDB. */
  def qExactSubstr(spark: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.exactSubstrDedup(docs(spark, dir), L = 5)

  val sqlExactSubstr: String =
    """WITH tk AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS tk FROM documents),
      |w AS (SELECT doc_id, i - 1 AS pos, md5(array_to_string(tk[i:i+4], ' ')) AS h
      |      FROM tk, unnest(generate_series(1, len(tk) - 4)) s(i) WHERE len(tk) >= 5),
      |pd AS (SELECT h, doc_id, min(pos) AS pos FROM w GROUP BY 1, 2),
      |win AS (SELECT h, min(doc_id) AS wd, arg_min(pos, doc_id) AS wp FROM pd GROUP BY 1),
      |mk AS (SELECT w.doc_id, w.pos FROM w JOIN win USING (h)
      |       WHERE NOT (w.doc_id = win.wd AND w.pos = win.wp)),
      |ndw AS (SELECT doc_id, count(*) AS n_dup_windows FROM mk GROUP BY 1),
      |cov AS (SELECT DISTINCT doc_id, tp
      |        FROM mk, unnest(generate_series(mk.pos, mk.pos + 4)) s(tp)),
      |cut AS (SELECT doc_id, list(tp) AS cut, count(*) AS n_removed FROM cov GROUP BY 1)
      |SELECT t.doc_id,
      |  CAST(len(t.tk) AS BIGINT) AS n_tokens,
      |  CAST(coalesce(n.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
      |  CAST(coalesce(c.n_removed, 0) AS BIGINT) AS n_removed,
      |  coalesce(array_to_string([t.tk[p + 1] for p in
      |    list_filter(range(0, len(t.tk)), p -> NOT list_contains(coalesce(c.cut, []), p))],
      |    ' '), '') AS text_dedup
      |FROM tk t LEFT JOIN ndw n USING (doc_id) LEFT JOIN cut c USING (doc_id)""".stripMargin

  /** WARC ingest roundtrip (sources.Warc + text.HtmlOps): synthesize a
    * WARC/1.0 response record per document (deterministic uri/date/html
    * payload), parse the headers back, and extract the payload text — the
    * Common-Crawl ingest shape that produces the north-rule input table
    * (url, warc_ts, html) from raw crawl records. The oracle replays
    * build → parse → extract in DuckDB. */
  def qWarcIngest(spark: SparkSession, dir: String): DataFrame = {
    val uri = concat(lit("https://crawl.example.org/"), col("source"),
      lit("/"), col("doc_id"))
    val ts = timestamp_micros(lit(1704067200000000L) + col("doc_id") * lit(60000000L))
    val payload = concat(lit("<html><head><title>x</title></head><body><p>"),
      col("text"), lit("</p></body></html>"))
    docs(spark, dir)
      .select(col("doc_id"),
        graft.sources.Warc.parseRecord(
          graft.sources.Warc.buildRecord(uri, ts, payload)).as("w"))
      .select(col("doc_id"), col("w.warc_type").as("warc_type"),
        col("w.uri").as("uri"), col("w.ts_us").as("ts_us"),
        col("w.content_length").as("content_length"),
        graft.text.HtmlOps.extractText(col("w.payload")).as("ext_text"))
  }

  val sqlWarcIngest: String = {
    val crlf = "chr(13) || chr(10)"
    s"""WITH p AS (
       |  SELECT doc_id, source,
       |    '<html><head><title>x</title></head><body><p>' || text
       |      || '</p></body></html>' AS payload
       |  FROM documents),
       |r AS (
       |  SELECT doc_id,
       |    'WARC/1.0' || $crlf || 'WARC-Type: response' || $crlf
       |    || 'WARC-Date: ' || strftime(TIMESTAMP '2024-01-01 00:00:00'
       |         + doc_id * INTERVAL 1 MINUTE, '%Y-%m-%dT%H:%M:%SZ') || $crlf
       |    || 'WARC-Target-URI: https://crawl.example.org/' || source || '/'
       |         || CAST(doc_id AS VARCHAR) || $crlf
       |    || 'Content-Length: ' || CAST(octet_length(CAST(payload AS BLOB)) AS VARCHAR) || $crlf
       |    || $crlf || payload AS rec
       |  FROM p),
       |e AS (
       |  SELECT doc_id,
       |    regexp_extract(rec, 'WARC-Type: ([^\\r\\n]+)', 1) AS warc_type,
       |    regexp_extract(rec, 'WARC-Target-URI: ([^\\r\\n]+)', 1) AS uri,
       |    epoch_us(strptime(regexp_extract(rec, 'WARC-Date: ([^\\r\\n]+)', 1),
       |      '%Y-%m-%dT%H:%M:%SZ')) AS ts_us,
       |    CAST(regexp_extract(rec, 'Content-Length: ([^\\r\\n]+)', 1) AS BIGINT)
       |      AS content_length,
       |    regexp_extract(rec, '(?s)\\r\\n\\r\\n(.*)$$', 1) AS pay FROM r)
       |SELECT doc_id, warc_type, uri, ts_us, content_length,
       |  ${graft.text.HtmlOps.extractTextSql("pay")} AS ext_text
       |FROM e""".stripMargin
  }

  /** Distributed BPE tokenizer training (text.Bpe): 8 merge rounds over
    * the documents vocabulary; output is the learned merge table
    * (rank, a, b, freq). The oracle UNROLLS the 8 rounds as CTE stages —
    * pair stats, deterministic argmax (freq DESC, a, b), greedy
    * every-other-in-run merge application — so DuckDB replays the whole
    * training loop. */
  def qBpeTrain(spark: SparkSession, dir: String): DataFrame =
    graft.text.Bpe.train(docs(spark, dir), nMerges = 8)

  /** Shared CTE prefix for the BPE oracles: vocabulary w0 plus n unrolled
    * merge rounds ending at w$n; also the merges-union select. */
  private def bpeOracleParts(n: Int): (String, String) = {
    def iter(i: Int): String =
      s"""p$i AS MATERIALIZED (SELECT word, cnt, syms, j - 1 AS p, syms[j] AS a, syms[j+1] AS b
         |       FROM w${i - 1}, unnest(generate_series(1, len(syms) - 1)) s(j)),
         |b$i AS (SELECT a, b, CAST(sum(cnt) AS BIGINT) AS freq FROM p$i GROUP BY 1, 2
         |       ORDER BY freq DESC, a, b LIMIT 1),
         |c$i AS (SELECT p.word, p.p FROM p$i p JOIN b$i ON p.a = b$i.a AND p.b = b$i.b),
         |g$i AS (SELECT word, p, p - row_number() OVER (PARTITION BY word ORDER BY p) AS grp
         |       FROM c$i),
         |k$i AS (SELECT word, list(p ORDER BY p) AS sel FROM
         |         (SELECT word, p, min(p) OVER (PARTITION BY word, grp) AS mn FROM g$i) q
         |        WHERE (p - mn) % 2 = 0 GROUP BY word),
         |w$i AS MATERIALIZED (SELECT w.word, w.cnt,
         |         CASE WHEN k.sel IS NULL THEN w.syms ELSE
         |           [CASE WHEN list_contains(k.sel, x) THEN w.syms[x+1] || w.syms[x+2]
         |                 ELSE w.syms[x+1] END
         |            for x in list_filter(range(0, len(w.syms)),
         |                       y -> NOT list_contains(list_transform(k.sel, z -> z + 1), y))]
         |         END AS syms
         |        FROM w${i - 1} w LEFT JOIN k$i k USING (word))""".stripMargin
    val body = (1 to n).map(iter).mkString(",\n")
    val union = (1 to n)
      .map(i => s"SELECT CAST($i AS BIGINT) AS rank, a, b, freq FROM b$i")
      .mkString("\nUNION ALL ")
    val prefix =
      s"""WITH v AS (
         |  SELECT word, count(*) AS cnt FROM
         |    (SELECT unnest(regexp_extract_all(lower(text), '\\S+')) AS word FROM documents) t
         |  GROUP BY 1),
         |w0 AS MATERIALIZED (SELECT word, cnt,
         |        list_append([word[i] for i in range(1, length(word) + 1)], '</w>') AS syms
         |       FROM v),
         |$body""".stripMargin
    (prefix, union)
  }

  val sqlBpeTrain: String = {
    val (prefix, union) = bpeOracleParts(8)
    s"$prefix\n$union"
  }

  /** BPE encoding (text.Bpe.encode): documents → token streams under the
    * 8-merge model; one row per (doc, word position, symbol position).
    * The oracle extends the q84 CTE chain with the vocabulary layout
    * (sorted base symbols 0..B-1, merge r → B+r-1) and the token-stream
    * joins. */
  def qBpeEncode(spark: SparkSession, dir: String): DataFrame =
    graft.text.Bpe.encode(docs(spark, dir), nMerges = 8)

  val sqlBpeEncode: String = {
    val (prefix, union) = bpeOracleParts(8)
    s"""$prefix,
       |m AS ($union),
       |basev AS MATERIALIZED (SELECT sym, row_number() OVER (ORDER BY sym) - 1 AS id
       |          FROM (SELECT DISTINCT unnest(syms) AS sym FROM w0) q),
       |vocab AS (SELECT sym, min(id) AS id FROM (
       |            SELECT sym, id FROM basev
       |            UNION ALL
       |            SELECT a || b AS sym,
       |                   (SELECT count(*) FROM basev) + rank - 1 AS id FROM m) u
       |          GROUP BY sym),
       |tok AS (SELECT doc_id, i - 1 AS wpos, tk[i] AS word
       |        FROM (SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS tk
       |              FROM documents) t,
       |             unnest(generate_series(1, len(tk))) s(i)),
       |st AS (SELECT t.doc_id, t.wpos, j - 1 AS spos, g.syms[j] AS sym
       |       FROM tok t JOIN w8 g ON t.word = g.word,
       |            unnest(generate_series(1, len(g.syms))) s(j))
       |SELECT st.doc_id, CAST(st.wpos AS BIGINT) AS wpos,
       |  CAST(st.spos AS BIGINT) AS spos, st.sym, CAST(v.id AS BIGINT) AS id
       |FROM st JOIN vocab v USING (sym)""".stripMargin
  }

  /** End-to-end ingest composition — the north-rule input path in ONE
    * declarative plan: raw WARC records (synthesized from documents; 100
    * urls × 5 crawls each) → parsed (url, warc_ts, html, lang) pages →
    * HTML text extraction → per-url measurement → hourly tier aggregate.
    * Every stage is the real library operator (sources.Warc,
    * text.HtmlOps); the only shuffle is the final (url, hour) aggregate,
    * everything upstream is scan-projection work. */
  def qPagesIngest(spark: SparkSession, dir: String): DataFrame = {
    val uri = concat(lit("https://crawl.example.org/"), col("source"),
      lit("/p"), pmod(col("doc_id"), lit(20)))
    val ts = timestamp_micros(lit(1704067200000000L) + col("doc_id") * lit(60000000L))
    val payload = concat(lit("<html><head><title>x</title></head><body><p>"),
      col("text"), lit("</p></body></html>"))
    docs(spark, dir)
      .select(graft.sources.Warc.parseRecord(
        graft.sources.Warc.buildRecord(uri, ts, payload)).as("w"))
      .select(col("w.uri").as("url"), col("w.ts_us").as("warc_ts_us"),
        col("w.payload").as("html"))
      .select(col("url"), col("warc_ts_us"),
        length(graft.text.HtmlOps.extractText(col("html"))).cast("long").as("v"))
      .groupBy(col("url"),
        (floor(col("warc_ts_us") / 3600000000L) * 3600000000L).cast("long").as("hour_us"))
      .agg(count(lit(1)).as("n_points"), sum("v").as("sum_v"),
        round(avg("v"), 6).as("mean_v"))
  }

  val sqlPagesIngest: String = {
    val crlf = "chr(13) || chr(10)"
    s"""WITH p AS (
       |  SELECT doc_id,
       |    'https://crawl.example.org/' || source || '/p'
       |      || CAST(doc_id % 20 AS VARCHAR) AS uri,
       |    '<html><head><title>x</title></head><body><p>' || text
       |      || '</p></body></html>' AS payload
       |  FROM documents),
       |r AS (
       |  SELECT doc_id,
       |    'WARC/1.0' || $crlf || 'WARC-Type: response' || $crlf
       |    || 'WARC-Date: ' || strftime(TIMESTAMP '2024-01-01 00:00:00'
       |         + doc_id * INTERVAL 1 MINUTE, '%Y-%m-%dT%H:%M:%SZ') || $crlf
       |    || 'WARC-Target-URI: ' || uri || $crlf
       |    || 'Content-Length: '
       |         || CAST(octet_length(CAST(payload AS BLOB)) AS VARCHAR) || $crlf
       |    || $crlf || payload AS rec
       |  FROM p),
       |e AS (
       |  SELECT
       |    regexp_extract(rec, 'WARC-Target-URI: ([^\\r\\n]+)', 1) AS url,
       |    epoch_us(strptime(regexp_extract(rec, 'WARC-Date: ([^\\r\\n]+)', 1),
       |      '%Y-%m-%dT%H:%M:%SZ')) AS warc_ts_us,
       |    regexp_extract(rec, '(?s)\\r\\n\\r\\n(.*)$$', 1) AS pay FROM r),
       |x AS (SELECT url, warc_ts_us,
       |        length(${graft.text.HtmlOps.extractTextSql("pay")}) AS v FROM e)
       |SELECT url,
       |  CAST(floor(warc_ts_us / 3600000000) * 3600000000 AS BIGINT) AS hour_us,
       |  CAST(count(*) AS BIGINT) AS n_points,
       |  CAST(sum(v) AS BIGINT) AS sum_v,
       |  round(avg(v), 6) AS mean_v
       |FROM x GROUP BY 1, 2""".stripMargin
  }

  /** CCNet head/middle/tail bucketing (the step after perplexity scoring:
    * split each language's corpus into quality tertiles by LM perplexity).
    * Tertile assignment is rank-based — integer arithmetic over
    * (row_number, count) per language partition — so it is exact and
    * engine-portable, unlike percentile-threshold formulations. Docs too
    * short to score (NULL ppl) land in an explicit 'unscored' bucket. */
  def qPplBuckets(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs(spark, dir)
    val ppl = graft.text.Perplexity.perplexity(
      d, d.filter(pmod(col("doc_id"), lit(10)) === 0))
    // ONE pass over the scored frame (a branch-and-union would re-run the
    // whole perplexity aggregation): unscored docs rank NULLS LAST past
    // n = count(scored), then their bucket is overridden. Both windows
    // are lang-partitioned; NULLS LAST is explicit because Spark defaults
    // nulls-first where the SQL oracle defaults nulls-last.
    ppl
      .join(d.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("lang").orderBy(col("ppl").asc_nulls_last, col("doc_id"))))
      .withColumn("n", count(col("ppl")).over(Window.partitionBy("lang")))
      .withColumn("bucket",
        when(col("ppl").isNull, lit("unscored")).otherwise(
          element_at(array(lit("head"), lit("middle"), lit("tail")),
            (expr("((CAST(rn AS BIGINT) - 1) * 3) div n") + 1).cast("int"))))
      .select(col("doc_id"), col("lang"), col("ppl"), col("bucket"))
  }

  val sqlPplBuckets: String =
    s"""WITH ppl_t AS ($sqlLmPerplexity),
       |j AS (SELECT p.doc_id, d.lang, p.ppl
       |      FROM ppl_t p JOIN documents d USING (doc_id)),
       |s AS (SELECT doc_id, lang, ppl,
       |        row_number() OVER (PARTITION BY lang
       |          ORDER BY ppl ASC NULLS LAST, doc_id) AS rn,
       |        count(ppl) OVER (PARTITION BY lang) AS n
       |      FROM j)
       |SELECT doc_id, lang, ppl,
       |  CASE WHEN ppl IS NULL THEN 'unscored'
       |       ELSE CASE ((rn - 1) * 3) // n WHEN 0 THEN 'head' WHEN 1 THEN 'middle'
       |            ELSE 'tail' END END AS bucket
       |FROM s""".stripMargin

  /** RefinedWeb/C4-style URL filtering (text.UrlOps.urlFilter): a
    * deterministic slice of the synthetic URLs gets flagged-word
    * injections (casino-poker, free-movies-download); two hosts are
    * hard-blocked; keep = not blocked and score under threshold. Scores
    * the RAW url, blocks on the canonical host. */
  private val q88BlockedHosts = Seq("news.src1-3.example.co.uk", "src2-0.example.com")
  private val q88Words = Seq(
    "casino" -> 0.5, "poker" -> 0.4, "free-movies" -> 0.3,
    "download" -> 0.2, "/art/" -> 0.05)

  def qUrlFilter(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.UrlOps
    val raw = when(pmod(col("doc_id"), lit(13)) === 0,
        concat(synthUrl, lit("&ref=casino-poker")))
      .when(pmod(col("doc_id"), lit(17)) === 0,
        concat(synthUrl, lit("&dl=free-movies-download")))
      .otherwise(synthUrl)
    docs(spark, dir)
      .select(col("doc_id"), raw.as("url"))
      .select(col("doc_id"), col("url"),
        UrlOps.hostOf(UrlOps.canonicalizeUrl(col("url"))).as("host"))
      .select(col("doc_id"), col("url"), col("host"),
        graft.text.UrlOps.urlFilter(col("url"), col("host"),
          q88BlockedHosts, q88Words, threshold = 0.5).as("f"))
      .select(col("doc_id"), col("url"), col("host"),
        col("f.blocked").as("blocked"), col("f.url_score").as("url_score"),
        col("f.url_keep").as("url_keep"))
  }

  val sqlUrlFilter: String = {
    val hosts = q88BlockedHosts.map(h => s"'$h'").mkString(", ")
    val score = q88Words
      .map { case (w, wt) =>
        s"CASE WHEN contains(lower(url), '$w') THEN $wt ELSE 0.0 END" }
      .mkString("\n      + ")
    s"""WITH u AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 13 = 0 THEN ($sqlSynthUrlCase) || '&ref=casino-poker'
       |         WHEN doc_id % 17 = 0 THEN ($sqlSynthUrlCase) || '&dl=free-movies-download'
       |         ELSE $sqlSynthUrlCase END AS url
       |  FROM documents),
       |$sqlCanonChain,
       |s AS (SELECT doc_id, url, host,
       |        host IN ($hosts) AS blocked,
       |        round($score, 6) AS url_score
       |      FROM c6)
       |SELECT doc_id, url, host, blocked, url_score,
       |  (NOT blocked AND url_score < 0.5) AS url_keep
       |FROM s""".stripMargin
  }

  /** In-engine classifier TRAINING (text.Classifier.trainLogistic): 5
    * full-batch GD steps, label = text contains 'spark', lr 0.5, 4096
    * hashed-gram buckets. The oracle unrolls the 5 steps as MATERIALIZED
    * CTE stages — rational fast-sigmoid link and 1e-6 integer-grid sums
    * make every step bit-replayable. */
  def qClfTrain(spark: SparkSession, dir: String): DataFrame =
    graft.text.Classifier.trainLogistic(
      docs(spark, dir), col("text").contains("spark"), steps = 5, lr = 0.5)

  val sqlClfTrain: String = {
    val n = 5
    def step(t: Int): String =
      s"""z$t AS (SELECT f.doc_id, f.y,
         |        sum(CAST(round(w.w * f.x * 1000000.0) AS BIGINT)) / 1000000.0 AS z
         |      FROM fb f JOIN w${t - 1} w USING (b) GROUP BY 1, 2),
         |r$t AS (SELECT doc_id, 0.5 + z / (2.0 * (1.0 + abs(z))) - y AS r FROM z$t),
         |g$t AS (SELECT f.b, sum(CAST(round(r.r * f.x * 1000000.0) AS BIGINT)) AS g
         |      FROM fb f JOIN r$t r USING (doc_id) GROUP BY 1),
         |w$t AS MATERIALIZED (
         |  SELECT w.b,
         |    round((w.w - (0.5 * g.g) / (1000000.0 * (SELECT n FROM nd)))
         |          * 1000000.0) / 1000000.0 AS w
         |  FROM w${t - 1} w JOIN g$t g USING (b))""".stripMargin
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    CASE WHEN contains(text, 'spark') THEN 1.0 ELSE 0.0 END AS y,
       |    [lower(t) for t in regexp_extract_all(text, '\\S+')] AS tk
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, y,
       |    tk || CASE WHEN len(tk) >= 2
       |      THEN [array_to_string(tk[i : i + 1], ' ')
       |            for i in generate_series(1, len(tk) - 1)]
       |      ELSE [] END AS grams
       |  FROM toks),
       |e AS (SELECT doc_id, y, len(grams) AS ng,
       |             ('0x' || substr(md5(s), 1, 8))::BIGINT % 4096 AS b
       |      FROM g, unnest(grams) t(s)),
       |fb AS MATERIALIZED (
       |  SELECT doc_id, y, b, count(*) * 1.0 / ng AS x
       |  FROM e GROUP BY doc_id, y, ng, b),
       |nd AS (SELECT count(DISTINCT doc_id) AS n FROM fb),
       |w0 AS MATERIALIZED (SELECT DISTINCT b, 0.0 AS w FROM fb),
       |${(1 to n).map(step).mkString(",\n")}
       |SELECT b, w FROM w$n""".stripMargin
  }

  /** SemDeDup semantic dedup (q90): seeded centroids (vec_id < 8, the q29
    * pattern) coarse-quantize the embedding corpus; eps-similar cell-mates
    * resolve by the paper's keep rule (lowest centroid-cosine survives).
    * The oracle replays assignment argmax, the eps test and the keep rule
    * on the same rounded cosines. */
  def qSemDedup(spark: SparkSession, dir: String): DataFrame = {
    val emb = embD(spark, dir)
    Dedup.semanticDedup(emb, emb.filter(col("vec_id") < 8), eps = 0.3)
      .select("vec_id", "cell", "csim", "kept")
  }

  val sqlSemDedup: String =
    """WITH c AS (SELECT vec_id AS cell, embedding AS cv FROM embeddings WHERE vec_id < 8),
      |ec AS (
      |  SELECT e.vec_id, c.cell,
      |    round(sum(e.embedding[i]::DOUBLE * c.cv[i]::DOUBLE)
      |      / (sqrt(sum(e.embedding[i]::DOUBLE ^ 2)) * sqrt(sum(c.cv[i]::DOUBLE ^ 2))), 6) AS sim
      |  FROM embeddings e, c, unnest(generate_series(1, 64)) d(i)
      |  GROUP BY 1, 2),
      |asg AS (
      |  SELECT vec_id, cell, sim AS csim FROM ec
      |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell ASC) = 1),
      |pairable AS (
      |  SELECT * FROM asg QUALIFY count(*) OVER (PARTITION BY cell) <= 10000),
      |dropped AS (
      |  SELECT DISTINCT x.vec_id
      |  FROM pairable x
      |  JOIN pairable y ON x.cell = y.cell AND x.vec_id <> y.vec_id
      |  JOIN embeddings ex ON ex.vec_id = x.vec_id
      |  JOIN embeddings ey ON ey.vec_id = y.vec_id,
      |  unnest(generate_series(1, 64)) d(i)
      |  GROUP BY x.vec_id, y.vec_id, x.csim, y.csim
      |  HAVING round(sum(ex.embedding[i]::DOUBLE * ey.embedding[i]::DOUBLE)
      |      / (sqrt(sum(ex.embedding[i]::DOUBLE ^ 2))
      |         * sqrt(sum(ey.embedding[i]::DOUBLE ^ 2))), 6) >= 0.3
      |    AND (y.csim < x.csim OR (y.csim = x.csim AND y.vec_id < x.vec_id)))
      |SELECT a.vec_id, a.cell, a.csim,
      |  CAST(d.vec_id IS NULL AS INT) AS kept
      |FROM asg a LEFT JOIN dropped d USING (vec_id)""".stripMargin

  /** C4 heuristic page cleaning (q91): line-level terminal-punctuation /
    * min-words / javascript gates, page-level sentence-count and
    * lorem-ipsum/brace gates, digest of the cleaned text. The documents
    * corpus is single-line unpunctuated word soup, so (q69/q75 pattern)
    * each doc deterministically expands into a multi-line page whose lines
    * trip different gates — short line, no-punctuation line, a JavaScript
    * boilerplate line on doc_id%5, a lorem-ipsum line on %11, a curly-brace
    * line on %13 — and the oracle replays page synthesis and every gate
    * with DuckDB list lambdas on the same trimmed lines. */
  def qC4Clean(spark: SparkSession, dir: String): DataFrame = {
    // the token array feeds four slice consumers: materialize it as a
    // column (the q79 CSE lesson), never inline the HOF four times
    val tk = col("_tk")
    val page = concat_ws("\n",
      concat(array_join(slice(tk, 1, 8), " "), lit(".")),
      lit("too short."),
      array_join(slice(tk, 9, 6), " "),
      concat(array_join(slice(tk, 15, 5), " "), lit("!")),
      when(col("doc_id") % 5 === 0,
        lit("Please enable JavaScript to view this page."))
        .otherwise(concat(array_join(slice(tk, 20, 7), " "), lit("?"))),
      when(col("doc_id") % 11 === 0,
        lit("Extra filler with lorem ipsum inside here today."))
        .otherwise(lit("")),
      when(col("doc_id") % 13 === 0, lit("code sample { return 1; }"))
        .otherwise(lit("")))
    graft.text.TextOps.c4Clean(
      docs(spark, dir)
        .select(col("doc_id"), graft.text.TextOps.wsTokens(col("text")).as("_tk"))
        .select(col("doc_id"), page.as("text")))
      .select("doc_id", "n_lines", "n_kept", "n_sentences", "keep", "clean_digest")
  }

  val sqlC4Clean: String =
    """WITH tk AS (
      |  SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents),
      |pg AS (
      |  SELECT doc_id, concat_ws(chr(10),
      |    coalesce(array_to_string(t[1:8], ' '), '') || '.',
      |    'too short.',
      |    coalesce(array_to_string(t[9:14], ' '), ''),
      |    coalesce(array_to_string(t[15:19], ' '), '') || '!',
      |    CASE WHEN doc_id % 5 = 0 THEN 'Please enable JavaScript to view this page.'
      |         ELSE coalesce(array_to_string(t[20:26], ' '), '') || '?' END,
      |    CASE WHEN doc_id % 11 = 0
      |         THEN 'Extra filler with lorem ipsum inside here today.' ELSE '' END,
      |    CASE WHEN doc_id % 13 = 0 THEN 'code sample { return 1; }' ELSE '' END
      |  ) AS text
      |  FROM tk),
      |l AS (
      |  SELECT doc_id, text,
      |    list_filter([trim(x) for x in string_split(text, chr(10))],
      |                x -> len(x) > 0) AS lines
      |  FROM pg),
      |k AS (
      |  SELECT doc_id, text, lines,
      |    list_filter(lines, x ->
      |      right(x, 1) IN ('.', '!', '?', '"')
      |      AND len(regexp_extract_all(x, '\S+')) >= 5
      |      AND NOT contains(lower(x), 'javascript')) AS kept
      |  FROM l),
      |c AS (
      |  SELECT doc_id, text, len(lines)::BIGINT AS n_lines,
      |    len(kept)::BIGINT AS n_kept,
      |    coalesce(array_to_string(kept, chr(10)), '') AS clean
      |  FROM k)
      |SELECT doc_id, n_lines, n_kept,
      |  (length(clean) - length(translate(clean, '.!?', '')))::BIGINT AS n_sentences,
      |  CAST((length(clean) - length(translate(clean, '.!?', '')) >= 3
      |    AND NOT contains(lower(text), 'lorem ipsum')
      |    AND NOT contains(lower(text), '{')) AS INT) AS keep,
      |  md5(clean) AS clean_digest
      |FROM c""".stripMargin

  /** Gopher quality rules (q92): the published Rae et al. Table A1
    * non-repetition gates over deterministically synthesized pages (the
    * q91 pattern — the corpus is single-line word soup, so bullet lines
    * land on doc_id%4, an ellipsis-ending line on %6, a hash-symbol line
    * on %9). minWords=10 and maxBulletFrac=0.5 replace the published 50 /
    * 0.9 so the gates actually bite at this corpus shape; all other
    * thresholds are the paper's. */
  def qGopherRules(spark: SparkSession, dir: String): DataFrame = {
    val page = concat_ws("\n",
      col("text"),
      when(col("doc_id") % 4 === 0, lit("• bullet item from a list"))
        .otherwise(lit("")),
      when(col("doc_id") % 4 === 0, lit("• a second bullet entry"))
        .otherwise(lit("")),
      when(col("doc_id") % 6 === 0,
        lit("this sentence trails off into the distance..."))
        .otherwise(lit("")),
      when(col("doc_id") % 9 === 0, lit("#### section marker ####"))
        .otherwise(lit("")))
    graft.text.TextOps.gopherRules(
      docs(spark, dir).select(col("doc_id"), page.as("text")),
      minWords = 10, maxBulletFrac = 0.5)
      .select("doc_id", "n_words", "mean_word_len", "hash_ratio",
        "ellipsis_ratio", "bullet_frac", "ellipsis_line_frac",
        "alpha_word_frac", "stop_hits", "gopher_keep")
  }

  val sqlGopherRules: String =
    """WITH pg AS (
      |  SELECT doc_id, concat_ws(chr(10), text,
      |    CASE WHEN doc_id % 4 = 0 THEN '• bullet item from a list' ELSE '' END,
      |    CASE WHEN doc_id % 4 = 0 THEN '• a second bullet entry' ELSE '' END,
      |    CASE WHEN doc_id % 6 = 0
      |         THEN 'this sentence trails off into the distance...' ELSE '' END,
      |    CASE WHEN doc_id % 9 = 0 THEN '#### section marker ####' ELSE '' END
      |  ) AS text
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, text,
      |    regexp_extract_all(text, '\S+') AS tk,
      |    list_filter([trim(x) for x in string_split(text, chr(10))],
      |                x -> len(x) > 0) AS lines
      |  FROM pg),
      |m AS (
      |  SELECT doc_id, text, tk, lines, len(tk) AS n, len(lines) AS nl,
      |    length(text) - length(translate(text, '#', '')) AS hashes,
      |    (length(text) - length(replace(text, '...', ''))) / 3 AS ellipses
      |  FROM f),
      |r AS (
      |  SELECT doc_id, n::BIGINT AS n_words,
      |    CASE WHEN n > 0 THEN round(
      |      list_sum(list_transform(tk, t -> length(t))) * 1.0 / n, 6)
      |      ELSE 0.0 END AS mean_word_len,
      |    CASE WHEN n > 0 THEN round(hashes * 1.0 / n, 6) ELSE 0.0 END AS hash_ratio,
      |    CASE WHEN n > 0 THEN round(ellipses * 1.0 / n, 6) ELSE 0.0 END AS ellipsis_ratio,
      |    CASE WHEN nl > 0 THEN round(len(list_filter(lines, l ->
      |      starts_with(l, '•') OR starts_with(l, '- ') OR starts_with(l, '* ')
      |      )) * 1.0 / nl, 6) ELSE 0.0 END AS bullet_frac,
      |    CASE WHEN nl > 0 THEN round(len(list_filter(lines, l ->
      |      ends_with(l, '...'))) * 1.0 / nl, 6) ELSE 0.0 END AS ellipsis_line_frac,
      |    CASE WHEN n > 0 THEN round(len(list_filter(tk, t ->
      |      regexp_matches(t, '[A-Za-z]'))) * 1.0 / n, 6) ELSE 0.0 END AS alpha_word_frac,
      |    len(list_filter(['the','be','to','of','and','that','have','with'],
      |        w -> list_contains(list_transform(tk, t -> lower(t)), w)))::INT AS stop_hits
      |  FROM m)
      |SELECT doc_id, n_words, mean_word_len, hash_ratio, ellipsis_ratio,
      |  bullet_frac, ellipsis_line_frac, alpha_word_frac, stop_hits,
      |  CAST((n_words >= 10 AND n_words <= 100000
      |    AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
      |    AND hash_ratio <= 0.1 AND ellipsis_ratio <= 0.1
      |    AND bullet_frac <= 0.5 AND ellipsis_line_frac <= 0.3
      |    AND alpha_word_frac >= 0.8 AND stop_hits >= 2) AS INT) AS gopher_keep
      |FROM r""".stripMargin

  /** Gap-based sessionization over the events table (gap = 12h), on the
    * plain many-key plan — user keys scale WITH the data (per-key rows
    * stay bounded), so one window pass per key is the shape that holds
    * at 10^12 rows; the skew-safe bucketed path is spec-equivalent
    * (SessionizeSpec) and head-to-head benched in the skew section. */
  def qSessionize(spark: SparkSession, dir: String): DataFrame =
    graft.events.EventOps.sessionize(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("user_id").as("key"), tsUs.as("t"), col("value").as("v")),
      gap = 12L * 3600 * 1000000,
      bucketBy = None)
      .select(col("key").as("user_id"), col("session_idx"),
        col("t_start"), col("t_end"), col("n_events"),
        round(col("v_sum"), 6).as("v_sum"))

  val sqlSessionize: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS t, value AS v FROM events),
      |f AS (
      |  SELECT user_id, t, v,
      |    CASE WHEN lag(t) OVER w IS NULL
      |              OR t - lag(t) OVER w > 43200000000 THEN 1 ELSE 0 END AS flag
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, v)),
      |s AS (
      |  SELECT user_id, t, v,
      |    CAST(sum(flag) OVER (PARTITION BY user_id ORDER BY t, v
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
      |  FROM f)
      |SELECT user_id, session_idx, min(t) AS t_start, max(t) AS t_end,
      |  count(*) AS n_events, round(sum(v), 6) AS v_sum
      |FROM s GROUP BY 1, 2""".stripMargin

  /** Top-5 tf-idf keywords per document. */
  def qTfidfTopK(spark: SparkSession, dir: String): DataFrame =
    graft.text.TextOps.tfIdfTopK(docs(spark, dir), k = 5)

  val sqlTfidfTopK: String =
    """WITH tf AS (
      |  SELECT doc_id, s AS term, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS s
      |        FROM documents)
      |  GROUP BY 1, 2),
      |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT count(*) AS n FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.term,
      |    round(tf.tf * (ln((1 + n.n) * 1.0 / (1 + dft.df)) + 1.0), 6) AS score
      |  FROM tf JOIN dft USING (term) CROSS JOIN n),
      |ranked AS (
      |  SELECT doc_id, term, score,
      |    CAST(row_number() OVER (PARTITION BY doc_id
      |      ORDER BY score DESC, term ASC) AS INT) AS term_rank
      |  FROM scored)
      |SELECT doc_id, term, term_rank, score FROM ranked
      |WHERE term_rank <= 5""".stripMargin

  /** Top-3 TF-IDF cosine neighbours per document (df-capped term join,
    * exact ln-grid integer weights): the weighted near-dup modality
    * beside winnowing (q223) and MinHash (q25). */
  def qTfidfCosine(spark: SparkSession, dir: String): DataFrame =
    graft.text.TextOps.tfidfCosinePairs(docs(spark, dir))

  val sqlTfidfCosine: String =
    """WITH tf AS (
      |  SELECT doc_id, s AS term, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS s
      |        FROM documents)
      |  GROUP BY 1, 2),
      |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT count(*) AS n FROM documents),
      |w AS (SELECT tf.doc_id, tf.term,
      |        tf.tf * (CAST(floor(ln((1 + n.n) * 1.0 / (1 + dft.df))
      |                            * 1048576 + 0.5) AS BIGINT) + 1048576)
      |          AS w
      |      FROM tf JOIN dft USING (term) CROSS JOIN n
      |      WHERE dft.df <= 50),
      |nrm AS (SELECT doc_id, sum(CAST(w AS HUGEINT) * w) AS n2
      |        FROM w GROUP BY 1),
      |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |         sum(CAST(a.w AS HUGEINT) * b.w) AS dot,
      |         count(*) AS n_shared
      |       FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
      |       GROUP BY 1, 2 HAVING count(*) >= 3),
      |c AS (SELECT pr.doc_a, pr.doc_b, pr.n_shared,
      |        round(CAST(pr.dot AS DOUBLE)
      |              / (sqrt(CAST(na.n2 AS DOUBLE))
      |                 * sqrt(CAST(nb.n2 AS DOUBLE))), 6) AS cos_sim
      |      FROM pr JOIN nrm na ON na.doc_id = pr.doc_a
      |        JOIN nrm nb ON nb.doc_id = pr.doc_b)
      |SELECT doc_a, doc_b, n_shared, cos_sim, sim_rank FROM (
      |  SELECT c.*, CAST(row_number() OVER (PARTITION BY doc_a
      |    ORDER BY cos_sim DESC, doc_b ASC) AS INT) AS sim_rank
      |  FROM c)
      |WHERE sim_rank <= 3""".stripMargin

  /** Benchmark decontamination via the Bloom-prefiltered path (exact
    * result — the filter only prunes the shuffle; the inner verification
    * join removes its false positives). Different corpus/benchmark split
    * from q71 so the two queries cannot share a cached answer. */
  def qBloomDecon(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    Dedup.contaminationBloom(
      d.filter(pmod(col("doc_id"), lit(89)) =!= 0),
      d.filter(pmod(col("doc_id"), lit(89)) === 0))
      .withColumn("contaminated", col("contaminated").cast("int"))
  }

  val sqlBloomDecon: String =
    """WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS tk FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |    list_distinct([array_to_string(tk[i : i + 2], ' ')
      |                   for i in generate_series(1, greatest(len(tk) - 2, 1))]) AS sh
      |  FROM toks),
      |bench AS (SELECT DISTINCT s FROM sh, unnest(sh) t(s) WHERE doc_id % 89 = 0),
      |docsh AS (SELECT doc_id, s FROM sh, unnest(sh) t(s) WHERE doc_id % 89 <> 0),
      |a AS (
      |  SELECT d.doc_id, count(*) AS n_shingles,
      |         CAST(sum(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |           AS n_contaminated
      |  FROM docsh d LEFT JOIN bench b ON d.s = b.s GROUP BY 1)
      |SELECT doc_id, n_shingles, n_contaminated,
      |       round(n_contaminated * 1.0 / n_shingles, 6) AS contamination_frac,
      |       CAST(n_contaminated >= 1 AS INT) AS contaminated
      |FROM a""".stripMargin

  /** Hourly p50/p90/p99 tier over January (per event_type — denser bins
    * than per-user, so the interpolated-rank arithmetic is actually
    * exercised). */
  def qTierPercentiles(spark: SparkSession, dir: String): DataFrame =
    Rollup.tierPercentiles(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_type").as("key"), tsUs.as("t"), col("value").as("v")),
      startUs = 1704067200000000L, endUs = 1706745600000000L,
      stepUs = HOUR, qs = Seq(0.5, 0.9, 0.99))
      .select(col("key").as("event_type"), col("bin_start"), col("n_points"),
        col("q"), col("value"))

  val sqlTierPercentiles: String =
    """WITH e AS (SELECT event_type, epoch_us(ts) AS t, value AS v FROM events),
      |b AS (
      |  SELECT event_type,
      |    CAST((t - 1704067200000000) // 3600000000 * 3600000000
      |         + 1704067200000000 AS BIGINT) AS bin_start, v
      |  FROM e WHERE t >= 1704067200000000 AND t < 1706745600000000
      |    AND v IS NOT NULL),
      |a AS (
      |  SELECT event_type, bin_start, count(*) AS n_points,
      |    quantile_cont(v, 0.5) AS p50, quantile_cont(v, 0.9) AS p90,
      |    quantile_cont(v, 0.99) AS p99
      |  FROM b GROUP BY 1, 2)
      |SELECT event_type, bin_start, n_points, 0.5 AS q,
      |  round(p50, 6) AS value FROM a
      |UNION ALL SELECT event_type, bin_start, n_points, 0.9, round(p90, 6) FROM a
      |UNION ALL SELECT event_type, bin_start, n_points, 0.99, round(p99, 6) FROM a""".stripMargin

  /** Rolling z-score anomalies per user (24-event lookback, |z| > 2.5). */
  def qRollingZscore(spark: SparkSession, dir: String): DataFrame =
    graft.events.EventOps.rollingZscore(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("user_id").as("key"), tsUs.as("t"), col("value").as("v")),
      lookback = 24, threshold = 2.5)
      .select(col("key").as("user_id"), col("t"), col("v"), col("z"), col("anomaly"))

  val sqlRollingZscore: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS t, value AS v FROM events),
      |w AS (
      |  SELECT user_id, t, v,
      |    avg(v) OVER win AS mu, stddev_samp(v) OVER win AS sd,
      |    count(v) OVER win AS n
      |  FROM e WINDOW win AS (PARTITION BY user_id ORDER BY t, v
      |    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
      |SELECT user_id, t, v,
      |  CASE WHEN n = 24 AND sd > 0 THEN round((v - mu) / sd, 6) END AS z,
      |  CAST(COALESCE(CASE WHEN n = 24 AND sd > 0
      |       THEN abs(round((v - mu) / sd, 6)) > 2.5 END, FALSE) AS INT) AS anomaly
      |FROM w""".stripMargin

  /** As-of enrichment: every event tagged with its user's last CLOSED
    * hourly mean (availability time = bin close), on the skew-safe
    * bucketed carry — checked against DuckDB's native ASOF JOIN. */
  def qAsofEnrich(spark: SparkSession, dir: String): DataFrame = {
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id").as("key"), tsUs.as("t"),
        col("event_id"), col("event_type"), col("value").as("v"))
    val hourly = ev
      .groupBy(col("key"), floor(col("t") / HOUR).as("_hb"))
      .agg(round(avg(col("v")), 6).as("v"))
      .select(col("key"), (col("_hb") * HOUR + HOUR).cast("long").as("t"), col("v"))
    MergeOps.asofJoin(ev, hourly, outCol = "asof_mean", bucketBy = dayBucket)
      .select(col("key").as("user_id"), col("t"), col("event_id"),
        col("event_type"), col("v"), col("asof_mean"))
  }

  val sqlAsofEnrich: String =
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS t, event_type, value AS v
      |  FROM events),
      |h0 AS (
      |  SELECT user_id, t // 3600000000 AS hb, round(avg(v), 6) AS rv
      |  FROM e GROUP BY 1, 2),
      |h AS (
      |  SELECT user_id, CAST(hb * 3600000000 + 3600000000 AS BIGINT) AS rt, rv
      |  FROM h0)
      |SELECT e.user_id, e.t, e.event_id, e.event_type, e.v,
      |  h.rv AS asof_mean
      |FROM e ASOF LEFT JOIN h
      |  ON e.user_id = h.user_id AND e.t >= h.rt""".stripMargin

  /** M4 downsample per (event_type, 6h pixel bin) — first/last/min/max
    * points with the deterministic (t, v) tiebreak. */
  def qM4Downsample(spark: SparkSession, dir: String): DataFrame =
    Rollup.m4(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_type").as("key"), tsUs.as("t"), col("value").as("v")),
      startUs = 1704067200000000L, stepUs = 6 * HOUR)
      .select(col("key").as("event_type"), col("bin_start"), col("n_points"),
        col("t_first"), col("t_last"), col("v_first"), col("v_last"),
        col("v_min"), col("v_max"))

  val sqlM4Downsample: String =
    """WITH e AS (SELECT event_type, epoch_us(ts) AS t, value AS v FROM events),
      |b AS (
      |  SELECT event_type,
      |    CAST((t - 1704067200000000) // 21600000000 * 21600000000
      |         + 1704067200000000 AS BIGINT) AS bin_start, t, v
      |  FROM e),
      |r AS (
      |  SELECT event_type, bin_start, t, v,
      |    row_number() OVER (PARTITION BY event_type, bin_start
      |      ORDER BY t ASC, v ASC) AS rf,
      |    row_number() OVER (PARTITION BY event_type, bin_start
      |      ORDER BY t DESC, v DESC) AS rl
      |  FROM b)
      |SELECT event_type, bin_start, count(*) AS n_points,
      |  min(t) AS t_first, max(t) AS t_last,
      |  max(CASE WHEN rf = 1 THEN v END) AS v_first,
      |  max(CASE WHEN rl = 1 THEN v END) AS v_last,
      |  min(v) AS v_min, max(v) AS v_max
      |FROM r GROUP BY 1, 2""".stripMargin

  /** Per-source quantile calibration: keep the top 30% of each source by
    * quality score (ranked on the 6-dp-rounded score, tie-break doc_id,
    * so ranks are engine-exact). */
  def qSourceQuantile(spark: SparkSession, dir: String): DataFrame =
    TextOps.sourceQuantileKeep(
      TextOps.qualityFeatures(docs(spark, dir))
        .select(col("doc_id"), col("source"), col("quality")),
      frac = 0.3)
      .select(col("doc_id"), col("source"), col("quality"),
        col("q_rank"), col("keep"))

  val sqlSourceQuantile: String = {
    val stops = TextOps.stopWords.map(w => s"'$w'").mkString(", ")
    s"""WITH f AS (
       |  SELECT doc_id, source,
       |    len(regexp_extract_all(text, '\\S+')) AS n_tokens,
       |    len(list_filter(list_transform(regexp_extract_all(text, '\\S+'), x -> lower(x)),
       |        x -> list_contains([$stops], x))) AS n_stop,
       |    len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
       |    len(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha,
       |    length(text) AS n_chars
       |  FROM documents),
       |r AS (
       |  SELECT doc_id, source, n_tokens,
       |    CASE WHEN n_tokens > 0 THEN n_stop * 1.0 / n_tokens ELSE 0.0 END AS stop_r,
       |    CASE WHEN n_chars > 0 THEN n_punct * 1.0 / n_chars ELSE 0.0 END AS punct_r,
       |    CASE WHEN n_chars > 0 THEN n_alpha * 1.0 / n_chars ELSE 0.0 END AS alpha_r
       |  FROM f),
       |q AS (
       |  SELECT doc_id, source,
       |    round(least(1.0, greatest(0.0,
       |      0.3 * least(n_tokens / 100.0, 1.0) + 0.3 * alpha_r
       |      + 0.2 * least(stop_r * 5.0, 1.0)
       |      + 0.2 * (1.0 - least(punct_r * 10.0, 1.0)))), 6) AS quality
       |  FROM r)
       |SELECT doc_id, source, quality,
       |  round(percent_rank() OVER (PARTITION BY source
       |    ORDER BY quality DESC, doc_id ASC), 6) AS q_rank,
       |  CAST(round(percent_rank() OVER (PARTITION BY source
       |    ORDER BY quality DESC, doc_id ASC), 6) <= 0.3 AS INT) AS keep
       |FROM q""".stripMargin
  }

  /** PromQL-style counter rate per user (per-second, reset-aware). */
  def qCounterRate(spark: SparkSession, dir: String): DataFrame =
    graft.events.EventOps.counterRate(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("user_id").as("key"), tsUs.as("t"), col("value").as("v")))
      .select(col("key").as("user_id"), col("t"), col("increase"), col("rate"))

  val sqlCounterRate: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS t, value AS v FROM events),
      |w AS (
      |  SELECT user_id, t, v,
      |    lag(v) OVER win AS pv, lag(t) OVER win AS pt
      |  FROM e WINDOW win AS (PARTITION BY user_id ORDER BY t, v))
      |SELECT user_id, t,
      |  CASE WHEN v >= pv THEN v - pv ELSE v END AS increase,
      |  round(CASE WHEN v >= pv THEN v - pv ELSE v END * 1000000 / (t - pt), 6)
      |    AS rate
      |FROM w WHERE pt IS NOT NULL AND t > pt""".stripMargin

  /** Deterministic 16-shard export manifest over documents. */
  def qShardManifest(spark: SparkSession, dir: String): DataFrame =
    graft.pack.Packing.shardManifest(
      docs(spark, dir).select(col("doc_id"),
        size(TextOps.wsTokens(col("text"))).cast("long").as("n_tokens")),
      nShards = 16)

  val sqlShardManifest: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    ('0x' || substr(md5('shard' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 16 AS shard,
      |    len(regexp_extract_all(text, '\S+')) AS n_tokens
      |  FROM documents)
      |SELECT shard, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
      |  md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)) AS ids_digest
      |FROM d GROUP BY 1""".stripMargin

  /** Hour-of-day seasonal baseline residuals per event_type (3σ flags). */
  def qSeasonalResidual(spark: SparkSession, dir: String): DataFrame =
    graft.events.EventOps.seasonalResidual(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_type").as("key"), tsUs.as("t"), col("value").as("v")))
      .select(col("key").as("event_type"), col("t"), col("v"),
        col("season_bin"), col("baseline"), col("residual"), col("anomaly"))

  val sqlSeasonalResidual: String =
    """WITH e AS (
      |  SELECT event_type, epoch_us(ts) AS t, value AS v FROM events
      |  WHERE value IS NOT NULL),
      |p AS (
      |  SELECT event_type, t, v,
      |    CAST((t // 3600000000) % 24 AS INT) AS season_bin FROM e),
      |b AS (
      |  SELECT event_type, season_bin, round(avg(v), 6) AS baseline,
      |    round(stddev_samp(v), 6) AS sd, count(*) AS n
      |  FROM p GROUP BY 1, 2)
      |SELECT p.event_type, p.t, p.v, p.season_bin, b.baseline,
      |  CASE WHEN b.n >= 2 AND b.sd > 0
      |       THEN round(p.v - b.baseline, 6) END AS residual,
      |  CAST(COALESCE(CASE WHEN b.n >= 2 AND b.sd > 0
      |       THEN abs(round(p.v - b.baseline, 6)) > b.sd * 3.0 END, FALSE) AS INT)
      |    AS anomaly
      |FROM p JOIN b USING (event_type, season_bin)""".stripMargin

  /** PSI value-distribution drift per event_type: first half of January
    * vs the rest (10 bins over [0, 400], edge-clamped). */
  def qPsiDrift(spark: SparkSession, dir: String): DataFrame =
    graft.events.EventOps.psiDrift(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_type").as("key"), tsUs.as("t"), col("value").as("v")),
      splitT = 1705363200000000L, lo = 0.0, hi = 400.0, nBins = 10)
      .select(col("key").as("event_type"), col("n_a"), col("n_b"),
        round(col("psi"), 6).as("psi"))

  val sqlPsiDrift: String =
    """WITH e AS (SELECT event_type, epoch_us(ts) AS t, value AS v FROM events
      |  WHERE value IS NOT NULL),
      |c AS (
      |  SELECT event_type,
      |    least(9, greatest(0, CAST(floor(v / 400.0 * 10) AS BIGINT))) AS bin,
      |    sum(CASE WHEN t < 1705363200000000 THEN 1 ELSE 0 END) AS ca,
      |    sum(CASE WHEN t >= 1705363200000000 THEN 1 ELSE 0 END) AS cb
      |  FROM e GROUP BY 1, 2),
      |tt AS (
      |  SELECT event_type, CAST(sum(ca) AS BIGINT) AS n_a,
      |    CAST(sum(cb) AS BIGINT) AS n_b
      |  FROM c GROUP BY 1),
      |terms AS (
      |  SELECT c.event_type, tt.n_a, tt.n_b,
      |    CAST(round(((c.ca + 0.5) / (tt.n_a + 5.0) - (c.cb + 0.5) / (tt.n_b + 5.0))
      |      * ln(((c.ca + 0.5) / (tt.n_a + 5.0)) / ((c.cb + 0.5) / (tt.n_b + 5.0)))
      |      * 1e6) AS BIGINT) AS term
      |  FROM c JOIN tt USING (event_type))
      |SELECT event_type, n_a, n_b, round(sum(term) / 1e6, 6) AS psi
      |FROM terms GROUP BY 1, 2, 3""".stripMargin

  /** Interval overlap join: user sessions (12h gap, closed-through-last
    * +1µs) × nightly per-user maintenance windows (02:00-03:00 each
    * January day) — "which sessions did maintenance hit, and for how
    * long". Bucketed range join, 6h buckets. */
  def qIntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val sess = graft.events.EventOps.sessionize(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("user_id").as("key"), tsUs.as("t"), col("value").as("v")),
      gap = 12L * 3600 * 1000000)
      .select(col("key"), col("t_start").as("a0"),
        (col("t_end") + 1L).as("a1"), col("n_events").cast("double").as("av"))
    val wins = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id").as("key")).distinct()
      .select(col("key"), explode(sequence(lit(0L), lit(29L))).as("_d"))
      .select(col("key"),
        (lit(1704067200000000L) + col("_d") * DAY + 2 * HOUR).as("b0"),
        (lit(1704067200000000L) + col("_d") * DAY + 3 * HOUR).as("b1"),
        col("_d").cast("double").as("bv"))
    SeriesOps.intervalOverlapJoin(sess, wins, bucketMicros = 6 * HOUR)
      .select(col("key").as("user_id"), col("a0"), col("a1"), col("av"),
        col("b0"), col("b1"), col("bv"), col("overlap_us"))
  }

  val sqlIntervalJoin: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS t, value AS v FROM events),
      |f AS (
      |  SELECT user_id, t, v,
      |    CASE WHEN lag(t) OVER w IS NULL
      |              OR t - lag(t) OVER w > 43200000000 THEN 1 ELSE 0 END AS flag
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, v)),
      |s AS (
      |  SELECT user_id, t,
      |    sum(flag) OVER (PARTITION BY user_id ORDER BY t, v
      |      ROWS UNBOUNDED PRECEDING) AS sess
      |  FROM f),
      |sess AS (
      |  SELECT user_id, min(t) AS a0, max(t) + 1 AS a1,
      |    CAST(count(*) AS DOUBLE) AS av
      |  FROM s GROUP BY user_id, sess),
      |m AS (
      |  SELECT u.user_id,
      |    1704067200000000 + d * 86400000000 + 7200000000 AS b0,
      |    1704067200000000 + d * 86400000000 + 10800000000 AS b1,
      |    CAST(d AS DOUBLE) AS bv
      |  FROM (SELECT DISTINCT user_id FROM e) u, generate_series(0, 29) g(d))
      |SELECT s.user_id, s.a0, s.a1, s.av, m.b0, m.b1, m.bv,
      |  least(s.a1, m.b1) - greatest(s.a0, m.b0) AS overlap_us
      |FROM sess s JOIN m ON s.user_id = m.user_id
      |  AND s.a0 < m.b1 AND m.b0 < s.a1""".stripMargin

  /** Weekly cohort retention triangle over January (origin = Jan 1). */
  def qCohortRetention(spark: SparkSession, dir: String): DataFrame =
    graft.events.EventOps.cohortRetention(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("user_id").as("key"), tsUs.as("t")),
      originUs = 1704067200000000L)

  val sqlCohortRetention: String =
    """WITH e AS (
      |  SELECT user_id,
      |    (epoch_us(ts) - 1704067200000000) // 604800000000 AS wk
      |  FROM events),
      |w AS (SELECT DISTINCT user_id, wk FROM e),
      |c AS (SELECT user_id, min(wk) AS cohort_wk FROM w GROUP BY 1),
      |a AS (
      |  SELECT c.cohort_wk, w.wk - c.cohort_wk AS k, count(*) AS n_users
      |  FROM w JOIN c USING (user_id) GROUP BY 1, 2),
      |s AS (SELECT cohort_wk, count(*) AS sz FROM c GROUP BY 1)
      |SELECT a.cohort_wk, a.k, a.n_users,
      |  round(a.n_users * 1.0 / s.sz, 6) AS retention
      |FROM a JOIN s USING (cohort_wk)""".stripMargin

  /** signup → click → purchase funnel per user (strictly-after steps). */
  def qFunnel(spark: SparkSession, dir: String): DataFrame =
    graft.events.EventOps.funnel(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("user_id").as("key"), tsUs.as("t"),
          col("event_type").as("step")),
      steps = Seq("signup", "click", "purchase"))
      .select(col("key").as("user_id"), col("t_1"), col("t_2"), col("t_3"),
        col("steps_reached"))

  val sqlFunnel: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_type FROM events),
      |u AS (SELECT DISTINCT user_id FROM e),
      |s1 AS (SELECT user_id, min(t) AS t_1 FROM e
      |       WHERE event_type = 'signup' GROUP BY 1),
      |s2 AS (SELECT e.user_id, min(e.t) AS t_2 FROM e JOIN s1 USING (user_id)
      |       WHERE e.event_type = 'click' AND e.t > s1.t_1 GROUP BY 1),
      |s3 AS (SELECT e.user_id, min(e.t) AS t_3 FROM e JOIN s2 USING (user_id)
      |       WHERE e.event_type = 'purchase' AND e.t > s2.t_2 GROUP BY 1)
      |SELECT u.user_id, s1.t_1, s2.t_2, s3.t_3,
      |  CAST(CAST(s1.t_1 IS NOT NULL AS INT) + CAST(s2.t_2 IS NOT NULL AS INT)
      |       + CAST(s3.t_3 IS NOT NULL AS INT) AS INT) AS steps_reached
      |FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
      |  LEFT JOIN s3 USING (user_id)""".stripMargin

  /** Irregular-interval EWMA per user (τ = 1h, 12h scan buckets) on the
    * ENGINE-EXACT grid variant ([[graft.regularize.Regularize.ewmaGrid]]):
    * decay factors pass through the dyadic 2⁻²⁰ exp grid, the in-bucket
    * forcing sum is exact longs, and cross-bucket carries snap to the
    * 1e-6 grid — so the DuckDB oracle below replays the identical
    * arithmetic (window sums of longs + a recursive CTE over per-key
    * bucket summaries) and the driver hash closes, where the float
    * [[graft.regularize.Regularize.ewma]] could only ever get a
    * rows-only check (round-4 verdict #5). */
  def qEwma(spark: SparkSession, dir: String): DataFrame =
    graft.regularize.Regularize.ewmaGrid(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("user_id").as("key"), tsUs.as("t"), col("value").as("v")),
      tauUs = HOUR.toDouble, bucketMicros = 12 * HOUR)
      .select(col("key").as("user_id"), col("t"), col("v"),
        round(col("ewma"), 6).as("ewma"))

  /** DuckDB replay of [[qEwma]]: identical quantized closed form — the
    * dyadic exp grid, exact long term sums per (key, bucket), per-bucket
    * net affine maps read off the last row, and a recursive CTE folding
    * the 1e-6-grid carry across each key's bucket sequence. Every float
    * op sits in a defined order over deterministic doubles, so the hash
    * matches bit-for-bit. */
  val sqlEwma: String =
    """WITH RECURSIVE
      |pts AS (SELECT user_id AS key, epoch_us(ts) AS t, value AS v
      |        FROM events WHERE value IS NOT NULL),
      |r AS (SELECT key, t, v, t // 43200000000 AS bkt FROM pts),
      |bs AS (SELECT key, bkt, min(t) AS tmin, max(t) AS tmax,
      |         row_number() OVER (PARTITION BY key ORDER BY bkt) AS bi
      |       FROM r GROUP BY key, bkt),
      |bs2 AS (SELECT key, bkt, tmin, bi,
      |          lag(tmax) OVER (PARTITION BY key ORDER BY bkt) AS anchor
      |        FROM bs),
      |rw AS (SELECT r.key, r.t, r.v, r.bkt, b.tmin, b.anchor, b.bi,
      |         coalesce(lag(r.t) OVER (PARTITION BY r.key, r.bkt
      |           ORDER BY r.t, r.v), b.anchor) AS prevt
      |       FROM r JOIN bs2 b ON r.key = b.key AND r.bkt = b.bkt),
      |st AS (SELECT key, t, v, bkt, tmin, anchor, bi,
      |         CASE WHEN prevt IS NULL THEN 0.0
      |              ELSE floor(exp((prevt - t) / 3600000000.0) * 1048576 + 0.5)
      |                   / 1048576 END AS a
      |       FROM rw),
      |st2 AS (SELECT *,
      |          floor(exp((t - tmin) / 3600000000.0) * 1048576 + 0.5)
      |            / 1048576 AS eup,
      |          floor(exp((tmin - t) / 3600000000.0) * 1048576 + 0.5)
      |            / 1048576 AS edn,
      |          CASE WHEN anchor IS NULL THEN 0.0
      |               ELSE floor(exp((anchor - t) / 3600000000.0) * 1048576 + 0.5)
      |                    / 1048576 END AS aa
      |        FROM st),
      |st3 AS (SELECT *,
      |          CAST(floor(eup * ((1.0 - a) * v) * 1048576 + 0.5) AS BIGINT)
      |            AS term
      |        FROM st2),
      |st4 AS (SELECT *, sum(term) OVER (PARTITION BY key, bkt
      |          ORDER BY t, v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |          AS s FROM st3),
      |st5 AS (SELECT *, edn * (CAST(s AS DOUBLE) / 1048576.0) AS bb FROM st4),
      |nets AS (SELECT key, bi, aa AS an, bb AS bn FROM
      |           (SELECT key, bi, aa, bb, row_number() OVER (
      |              PARTITION BY key, bkt ORDER BY t DESC, v DESC) AS rn
      |            FROM st5) WHERE rn = 1),
      |rec AS (
      |  SELECT key, bi, CAST(0 AS BIGINT) AS nin,
      |    CAST(floor((an * (CAST(0 AS DOUBLE) / 1000000.0) + bn)
      |               * 1000000.0 + 0.5) AS BIGINT) AS nout
      |  FROM nets WHERE bi = 1
      |  UNION ALL
      |  SELECT n.key, n.bi, x.nout AS nin,
      |    CAST(floor((n.an * (CAST(x.nout AS DOUBLE) / 1000000.0) + n.bn)
      |               * 1000000.0 + 0.5) AS BIGINT) AS nout
      |  FROM nets n JOIN rec x ON n.key = x.key AND n.bi = x.bi + 1)
      |SELECT st5.key AS user_id, st5.t, st5.v,
      |  round(st5.aa * (CAST(rec.nin AS DOUBLE) / 1000000.0) + st5.bb, 6)
      |    AS ewma
      |FROM st5 JOIN rec ON st5.key = rec.key AND st5.bi = rec.bi""".stripMargin

  /** Two-sided CUSUM changepoint scan per event_type (slack = σ/2,
    * alarm at 4σ) — the sequential control chart as two stacked window
    * passes over one per-key sort (cumsum − running-min closed form),
    * integer-exact on the 1e-6 grid. */
  def qCusum(spark: SparkSession, dir: String): DataFrame =
    graft.events.EventOps.cusum(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_type").as("key"), tsUs.as("t"), col("value").as("v")))
      .select(col("key").as("event_type"), col("t"), col("v"),
        col("cusum_pos"), col("cusum_neg"), col("changepoint"))

  val sqlCusum: String =
    """WITH e AS (SELECT event_type, epoch_us(ts) AS t, value AS v FROM events
      |  WHERE value IS NOT NULL),
      |s AS (SELECT event_type, round(avg(v), 6) AS mu,
      |        round(stddev_samp(v), 6) AS sd, count(*) AS n
      |      FROM e GROUP BY 1),
      |d AS (
      |  SELECT e.event_type, e.t, e.v, s.sd, s.n,
      |    CAST(round((e.v - s.mu - round(s.sd * 0.5, 6)) * 1e6) AS BIGINT) AS dp,
      |    CAST(round((s.mu - round(s.sd * 0.5, 6) - e.v) * 1e6) AS BIGINT) AS dn
      |  FROM e JOIN s USING (event_type)),
      |c AS (
      |  SELECT event_type, t, v, sd, n,
      |    sum(dp) OVER win AS sp, sum(dn) OVER win AS sn2
      |  FROM d
      |  WINDOW win AS (PARTITION BY event_type ORDER BY t, v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |m AS (
      |  SELECT event_type, t, v, sd, n,
      |    sp - least(min(sp) OVER win, 0) AS rp,
      |    sn2 - least(min(sn2) OVER win, 0) AS rn
      |  FROM c
      |  WINDOW win AS (PARTITION BY event_type ORDER BY t, v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT event_type, t, v,
      |  CASE WHEN n >= 2 AND sd > 0 THEN round(rp / 1e6, 6) END AS cusum_pos,
      |  CASE WHEN n >= 2 AND sd > 0 THEN round(rn / 1e6, 6) END AS cusum_neg,
      |  CAST(COALESCE(CASE WHEN n >= 2 AND sd > 0
      |    THEN rp / 1e6 > round(sd * 4.0, 6) OR rn / 1e6 > round(sd * 4.0, 6)
      |    END, FALSE) AS INT) AS changepoint
      |FROM m""".stripMargin

  /** Daily distinct-user KMV sketches per event_type, built hourly and
    * MERGED to daily (k = 32) — the oracle rebuilds the daily sketch
    * straight from raw rows, so a hash match proves the merge lossless
    * (the continuous-aggregate property for count-distinct tiers). */
  def qKmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    val k = 32
    val e = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_type"), tsUs.as("t"), col("user_id"))
      .withColumn("hour", floor(col("t") / HOUR))
    val hourly = graft.sketch.Kmv.sketch(e, Seq("event_type", "hour"), "user_id", k)
    val daily = graft.sketch.Kmv.merge(
      hourly.withColumn("day", floor(col("hour") / lit(24L))),
      Seq("event_type", "day"), k)
    daily.select(col("event_type"), col("day"),
      size(col("kmv")).as("sketch_n"),
      graft.sketch.Kmv.estimate(col("kmv"), k).as("est_distinct"))
  }

  val sqlKmvDistinct: String =
    """WITH e AS (
      |  SELECT DISTINCT event_type, epoch_us(ts) // 86400000000 AS day,
      |    ('0x' || substr(md5('kmv' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
      |      AS h
      |  FROM events),
      |r AS (
      |  SELECT event_type, day, h,
      |    row_number() OVER (PARTITION BY event_type, day ORDER BY h) AS rn
      |  FROM e),
      |g AS (
      |  SELECT event_type, day, count(*) AS sn, max(h) AS hk
      |  FROM r WHERE rn <= 32 GROUP BY 1, 2)
      |SELECT event_type, day, CAST(sn AS INT) AS sketch_n,
      |  CASE WHEN sn < 32 THEN CAST(sn AS DOUBLE)
      |       ELSE round(31.0 * CAST(1152921504606846976 AS DOUBLE) / hk, 6) END
      |    AS est_distinct
      |FROM g""".stripMargin

  /** Heartbeat downtime SLA report per user (12h heartbeat, calendar-day
    * attribution) on the BUCKETED gap scan (weekly buckets) — the
    * oracle replays dead-man's-switch gap detection + day splitting. */
  def qDowntime(spark: SparkSession, dir: String): DataFrame =
    graft.events.EventOps.downtime(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("user_id").as("key"), tsUs.as("t")),
      heartbeatUs = 12 * HOUR,
      bucketBy = Some(floor(col("t") / WEEK)))
      .select(col("key").as("user_id"), col("day"), col("down_us"),
        col("down_frac"))

  val sqlDowntime: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
      |g AS (SELECT user_id, t,
      |        lag(t) OVER (PARTITION BY user_id ORDER BY t) AS prev
      |      FROM e),
      |d AS (SELECT user_id, prev + 43200000000 AS d0, t AS d1 FROM g
      |      WHERE t - prev > 43200000000),
      |x AS (SELECT user_id, d0, d1,
      |        unnest(generate_series(d0 // 86400000000,
      |                               (d1 - 1) // 86400000000)) AS day
      |      FROM d)
      |SELECT user_id, day,
      |  CAST(sum(least(d1, (day + 1) * 86400000000)
      |      - greatest(d0, day * 86400000000)) AS BIGINT) AS down_us,
      |  round(sum(least(d1, (day + 1) * 86400000000)
      |      - greatest(d0, day * 86400000000)) / 86400000000.0, 6) AS down_frac
      |FROM x GROUP BY 1, 2""".stripMargin

  /** Interval union / activity coverage per user: each event opens a
    * 30-minute activity window; overlapping-or-touching windows merge
    * into maximal islands (plain many-key plan — keys scale with the
    * data; the bucketed two-handoff path is spec-equivalent and benched
    * in the skew section). The oracle is the classic gaps-and-islands
    * running-max SQL. */
  def qIntervalUnion(spark: SparkSession, dir: String): DataFrame =
    graft.core.SeriesOps.intervalUnion(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("user_id").as("key"), tsUs.as("t0"),
          (tsUs + 30L * 60L * 1000000L).as("t1")),
      bucketBy = None)
      .select(col("key").as("user_id"), col("u0"), col("u1"), col("n_merged"))

  val sqlIntervalUnion: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS t0,
      |             epoch_us(ts) + 1800000000 AS t1 FROM events),
      |f AS (SELECT user_id, t0, t1,
      |        CASE WHEN t0 > coalesce(max(t1) OVER
      |            (PARTITION BY user_id ORDER BY t0, t1
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |          -9223372036854775808) THEN 1 ELSE 0 END AS nw
      |      FROM e),
      |g AS (SELECT user_id, t0, t1,
      |        sum(nw) OVER (PARTITION BY user_id ORDER BY t0, t1
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      |      FROM f)
      |SELECT user_id, min(t0) AS u0, max(t1) AS u1, count(*) AS n_merged
      |FROM g GROUP BY user_id, grp""".stripMargin

  /** Daily per-user event-frequency estimates from Count-Min sketches
    * built hourly and MERGED to daily by linearity (d=4, w=256) — the
    * frequency complement of q110's KMV tier; the oracle rebuilds the
    * daily sketch straight from raw rows and replays every md5 cell, so
    * a hash match proves the cell-wise-sum merge lossless. Probes are
    * every fifth user; exact_n rides along to show the ≤ εN overshoot. */
  def qCmsFreq(spark: SparkSession, dir: String): DataFrame = {
    val (d, w) = (4, 256)
    val e = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_type"), tsUs.as("t"), col("user_id"))
      .withColumn("hour", floor(col("t") / HOUR))
    val hourly = graft.sketch.CountMin.sketch(
      e, Seq("event_type", "hour"), "user_id", d, w)
    val daily = graft.sketch.CountMin.merge(
      hourly.withColumn("day", floor(col("hour") / lit(24L))),
      Seq("event_type", "day"))
    val probes = e.withColumn("day", floor(col("t") / DAY))
      .filter(col("user_id") % 5 === 0)
      .groupBy(col("event_type"), col("day"), col("user_id"))
      .agg(count(lit(1)).as("exact_n"))
    graft.sketch.CountMin.lookup(
      daily, Seq("event_type", "day"), probes, "user_id", d, w)
      .join(probes, Seq("event_type", "day", "user_id"))
      .select(col("event_type"), col("day"), col("user_id"),
        col("exact_n"), col("est_n"))
  }

  val sqlCmsFreq: String =
    """WITH e AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |             user_id FROM events),
      |rr AS (SELECT unnest([0, 1, 2, 3]) AS r),
      |h AS (SELECT e.event_type, e.day, e.user_id, rr.r,
      |        ('0x' || substr(md5('cm' || CAST(rr.r AS VARCHAR) || ':'
      |           || CAST(e.user_id AS VARCHAR)), 1, 15))::BIGINT % 256 AS c
      |      FROM e CROSS JOIN rr),
      |sk AS (SELECT event_type, day, r, c, count(*) AS cnt
      |       FROM h GROUP BY 1, 2, 3, 4),
      |p AS (SELECT event_type, day, user_id, count(*) AS exact_n FROM e
      |      WHERE user_id % 5 = 0 GROUP BY 1, 2, 3),
      |ph AS (SELECT p.event_type, p.day, p.user_id, p.exact_n, rr.r,
      |        ('0x' || substr(md5('cm' || CAST(rr.r AS VARCHAR) || ':'
      |           || CAST(p.user_id AS VARCHAR)), 1, 15))::BIGINT % 256 AS c
      |       FROM p CROSS JOIN rr)
      |SELECT ph.event_type, ph.day, ph.user_id, min(ph.exact_n) AS exact_n,
      |  min(coalesce(sk.cnt, 0)) AS est_n
      |FROM ph LEFT JOIN sk
      |  ON ph.event_type IS NOT DISTINCT FROM sk.event_type
      |  AND ph.day = sk.day AND ph.r = sk.r AND ph.c = sk.c
      |GROUP BY 1, 2, 3""".stripMargin

  /** Daily click∩view distinct-user overlap from two KMV sketches over
    * the SAME hash space (θ-sketch intersection, k = 32) — the set
    * operation beyond q110's plain count-distinct. The oracle rebuilds
    * both sketches from raw rows and replays θ, the below-θ common
    * count, and the 2⁶⁰/θ scale-up bit-for-bit. */
  def qKmvIntersect(spark: SparkSession, dir: String): DataFrame = {
    val k = 32
    val e = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_type"), tsUs.as("t"), col("user_id"))
      .withColumn("day", floor(col("t") / DAY))
    def side(et: String) = graft.sketch.Kmv.sketch(
      e.filter(col("event_type") === et), Seq("day"), "user_id", k)
    graft.sketch.Kmv.intersectEstimate(side("click"), side("view"), Seq("day"), k)
      .select(col("day"), col("n_both"), col("est_common"))
  }

  val sqlKmvIntersect: String =
    """WITH e AS (
      |  SELECT DISTINCT event_type, epoch_us(ts) // 86400000000 AS day,
      |    ('0x' || substr(md5('kmv' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
      |      AS h
      |  FROM events WHERE event_type IN ('click', 'view')),
      |r AS (
      |  SELECT event_type, day, h,
      |    row_number() OVER (PARTITION BY event_type, day ORDER BY h) AS rn
      |  FROM e),
      |s AS (SELECT event_type, day, h FROM r WHERE rn <= 32),
      |th AS (SELECT event_type, day, count(*) AS n, max(h) AS hk
      |       FROM s GROUP BY 1, 2),
      |t2 AS (
      |  SELECT a.day,
      |    least(CASE WHEN a.n < 32 THEN 9223372036854775807 ELSE a.hk END,
      |          CASE WHEN b.n < 32 THEN 9223372036854775807 ELSE b.hk END)
      |      AS theta
      |  FROM th a JOIN th b ON a.day = b.day
      |    AND a.event_type = 'click' AND b.event_type = 'view'),
      |c AS (
      |  SELECT sa.day, count(*) AS nb
      |  FROM s sa
      |  JOIN s sb ON sa.day = sb.day AND sa.h = sb.h
      |    AND sa.event_type = 'click' AND sb.event_type = 'view'
      |  JOIN t2 ON t2.day = sa.day AND sa.h < t2.theta
      |  GROUP BY 1)
      |SELECT t2.day, coalesce(c.nb, 0) AS n_both,
      |  CASE WHEN t2.theta = 9223372036854775807
      |       THEN CAST(coalesce(c.nb, 0) AS DOUBLE)
      |       ELSE round(coalesce(c.nb, 0) * 1152921504606846976.0 / t2.theta, 6)
      |  END AS est_common
      |FROM t2 LEFT JOIN c USING (day)""".stripMargin

  /** Irregular-interval Holt level+trend per user (τ_level = 1h,
    * τ_trend = 3h, 12h scan buckets) on the ENGINE-EXACT grid variant
    * ([[graft.regularize.Regularize.holtGrid]]): u/w pass through the
    * dyadic exp grid and the cross-bucket (level, trend) carry snaps to
    * fixed grids at bucket boundaries, so the oracle below replays the
    * in-bucket matrix composition operation-for-operation in a
    * recursive CTE and the driver hash closes (round-4 verdict #5). */
  def qHoltTrend(spark: SparkSession, dir: String): DataFrame =
    graft.regularize.Regularize.holtGrid(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("user_id").as("key"), tsUs.as("t"), col("value").as("v")),
      tauLevelUs = HOUR.toDouble, tauTrendUs = 3.0 * HOUR,
      bucketMicros = 12 * HOUR)
      .select(col("key").as("user_id"), col("t"), col("v"),
        round(col("level"), 6).as("level"),
        // trend is per-µs by construction; report per-hour so the 6-dp
        // round keeps signal
        round(col("trend") * HOUR, 6).as("trend_per_hr"))

  /** DuckDB replay of [[qHoltTrend]]: the in-bucket prefix composition
    * (the holtScanUdf loop) as a recursive CTE over in-bucket row index
    * — each step's eight multiply-adds written in the UDF's exact
    * association order — then the per-key cross-bucket fold of the
    * grid-snapped (level, trend) carry as a second recursion over
    * bucket index. Level carries on the 1e-6 grid, trend on the
    * 1e-6-per-hour grid (3.6e15 per-µs scale). */
  val sqlHoltTrend: String =
    """WITH RECURSIVE
      |pts AS (SELECT user_id AS key, epoch_us(ts) AS t, value AS v
      |        FROM events WHERE value IS NOT NULL),
      |r AS (SELECT key, t, v, t // 43200000000 AS bkt FROM pts),
      |bs AS (SELECT key, bkt, max(t) AS tmax,
      |         row_number() OVER (PARTITION BY key ORDER BY bkt) AS bi
      |       FROM r GROUP BY key, bkt),
      |bs2 AS (SELECT key, bkt, bi,
      |          lag(tmax) OVER (PARTITION BY key ORDER BY bkt) AS anchor
      |        FROM bs),
      |rw AS (SELECT r.key, r.t, r.v, r.bkt, b.bi,
      |         coalesce(lag(r.t) OVER (PARTITION BY r.key, r.bkt
      |           ORDER BY r.t, r.v), b.anchor) AS prevt,
      |         row_number() OVER (PARTITION BY r.key, r.bkt
      |           ORDER BY r.t, r.v) AS ri
      |       FROM r JOIN bs2 b ON r.key = b.key AND r.bkt = b.bkt),
      |st AS (SELECT key, t, v, bkt, bi, ri, prevt,
      |         CAST(t - prevt AS DOUBLE) AS dt,
      |         floor(exp((prevt - t) / 3600000000.0) * 1048576 + 0.5)
      |           / 1048576 AS u,
      |         floor(exp((prevt - t) / 10800000000.0) * 1048576 + 0.5)
      |           / 1048576 AS w
      |       FROM rw),
      |sm AS (SELECT key, t, v, bkt, bi, ri,
      |         CASE WHEN prevt IS NULL THEN 0.0 WHEN dt = 0 THEN 1.0
      |              ELSE u END AS m11,
      |         CASE WHEN prevt IS NULL OR dt = 0 THEN 0.0
      |              ELSE u * dt END AS m12,
      |         CASE WHEN prevt IS NULL OR dt = 0 THEN 0.0
      |              ELSE ((1.0 - w) * (u - 1.0)) / dt END AS m21,
      |         CASE WHEN prevt IS NULL THEN 0.0 WHEN dt = 0 THEN 1.0
      |              ELSE (1.0 - w) * u + w END AS m22,
      |         CASE WHEN prevt IS NULL THEN v WHEN dt = 0 THEN 0.0
      |              ELSE (1.0 - u) * v END AS c1,
      |         CASE WHEN prevt IS NULL OR dt = 0 THEN 0.0
      |              ELSE (1.0 - w) * (1.0 - u) * v / dt END AS c2
      |       FROM st),
      |scan AS (
      |  SELECT key, bkt, bi, ri, t, v,
      |    m11 AS p11, m12 AS p12, m21 AS p21, m22 AS p22,
      |    c1 AS q1, c2 AS q2
      |  FROM sm WHERE ri = 1
      |  UNION ALL
      |  SELECT s.key, s.bkt, s.bi, s.ri, s.t, s.v,
      |    s.m11 * p.p11 + s.m12 * p.p21, s.m11 * p.p12 + s.m12 * p.p22,
      |    s.m21 * p.p11 + s.m22 * p.p21, s.m21 * p.p12 + s.m22 * p.p22,
      |    s.m11 * p.q1 + s.m12 * p.q2 + s.c1,
      |    s.m21 * p.q1 + s.m22 * p.q2 + s.c2
      |  FROM sm s JOIN scan p ON s.key = p.key AND s.bkt = p.bkt
      |    AND s.ri = p.ri + 1),
      |nets AS (SELECT key, bi, p11, p12, p21, p22, q1, q2 FROM
      |           (SELECT *, row_number() OVER (PARTITION BY key, bkt
      |              ORDER BY ri DESC) AS rn FROM scan) WHERE rn = 1),
      |rec AS (
      |  SELECT key, bi, CAST(0 AS BIGINT) AS nlin, CAST(0 AS BIGINT) AS nbin,
      |    CAST(floor((p11 * (CAST(0 AS DOUBLE) / 1000000.0)
      |                + p12 * (CAST(0 AS DOUBLE) / 3600000000000000.0)
      |                + q1) * 1000000.0 + 0.5) AS BIGINT) AS nlout,
      |    CAST(floor((p21 * (CAST(0 AS DOUBLE) / 1000000.0)
      |                + p22 * (CAST(0 AS DOUBLE) / 3600000000000000.0)
      |                + q2) * 3600000000000000.0 + 0.5) AS BIGINT) AS nbout
      |  FROM nets WHERE bi = 1
      |  UNION ALL
      |  SELECT n.key, n.bi, x.nlout AS nlin, x.nbout AS nbin,
      |    CAST(floor((n.p11 * (CAST(x.nlout AS DOUBLE) / 1000000.0)
      |                + n.p12 * (CAST(x.nbout AS DOUBLE) / 3600000000000000.0)
      |                + n.q1) * 1000000.0 + 0.5) AS BIGINT),
      |    CAST(floor((n.p21 * (CAST(x.nlout AS DOUBLE) / 1000000.0)
      |                + n.p22 * (CAST(x.nbout AS DOUBLE) / 3600000000000000.0)
      |                + n.q2) * 3600000000000000.0 + 0.5) AS BIGINT)
      |  FROM nets n JOIN rec x ON n.key = x.key AND n.bi = x.bi + 1)
      |SELECT scan.key AS user_id, scan.t, scan.v,
      |  round(scan.p11 * (CAST(rec.nlin AS DOUBLE) / 1000000.0)
      |        + scan.p12 * (CAST(rec.nbin AS DOUBLE) / 3600000000000000.0)
      |        + scan.q1, 6) AS level,
      |  round((scan.p21 * (CAST(rec.nlin AS DOUBLE) / 1000000.0)
      |         + scan.p22 * (CAST(rec.nbin AS DOUBLE) / 3600000000000000.0)
      |         + scan.q2) * 3600000000.0, 6) AS trend_per_hr
      |FROM scan JOIN rec ON scan.key = rec.key AND scan.bi = rec.bi"""
      .stripMargin

  /** Daily p50/p90/p99 from fixed-grid histogram sketches built hourly
    * and MERGED to daily by linearity ([0, 500) in 50 bins) — the
    * MERGEABLE quantile tier beside q96's exact-per-bin percentiles;
    * the oracle rebuilds the daily histogram from raw rows and replays
    * the cumulative-rank interpolation bit-for-bit. */
  def qHistQuantile(spark: SparkSession, dir: String): DataFrame = {
    val (lo, hi, nb) = (0.0, 500.0, 50)
    val e = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_type"), tsUs.as("t"), col("value"))
      .withColumn("hour", floor(col("t") / HOUR))
    val hourly = graft.sketch.GridHist.sketch(
      e, Seq("event_type", "hour"), "value", lo, hi, nb)
    val daily = graft.sketch.GridHist.merge(
      hourly.withColumn("day", floor(col("hour") / lit(24L))),
      Seq("event_type", "day"))
    graft.sketch.GridHist.quantiles(
      daily, Seq("event_type", "day"), Seq(0.5, 0.9, 0.99), lo, hi, nb)
      .select(col("event_type"), col("day"), col("q"), col("est"))
  }

  val sqlHistQuantile: String =
    """WITH e AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |    greatest(0, least(49, CAST(floor((value - 0.0) / 10.0) AS BIGINT)))
      |      AS bin
      |  FROM events WHERE value IS NOT NULL),
      |h AS (SELECT event_type, day, bin, count(*) AS cnt
      |      FROM e GROUP BY 1, 2, 3),
      |c AS (SELECT event_type, day, bin, cnt,
      |        sum(cnt) OVER (PARTITION BY event_type, day ORDER BY bin
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |        sum(cnt) OVER (PARTITION BY event_type, day) AS n
      |      FROM h),
      |x AS (SELECT c.*, q.q, q.q * c.n AS target
      |      FROM c CROSS JOIN (SELECT unnest([0.5::DOUBLE, 0.9::DOUBLE,
      |        0.99::DOUBLE]) AS q) q
      |      WHERE c.cum >= q.q * c.n)
      |SELECT event_type, day, q,
      |  round(min_by(0.0 + 10.0 * (bin + (target - (cum - cnt)) / cnt), bin),
      |        6) AS est
      |FROM x GROUP BY 1, 2, 3""".stripMargin

  /** Lagged autocorrelation per user over the hourly mean-value grid
    * (lags 1-3h) — bin means quantized to the 1e-3 grid so all six
    * sufficient statistics are long-exact; the oracle replays the same
    * grid, join and Pearson ratio. */
  def qAcf(spark: SparkSession, dir: String): DataFrame =
    graft.events.Correlation.autocorr(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("user_id").as("key"), tsUs.as("t"), col("value").as("v")),
      lags = Seq(1, 2, 3), binUs = HOUR, minPairs = 8)
      .select(col("key").as("user_id"), col("lag").as("lag_h"),
        col("n_pairs"), col("r"))

  val sqlAcf: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) // 3600000000 AS b, value
      |           FROM events WHERE value IS NOT NULL),
      |g AS (SELECT user_id, b,
      |        CAST(floor(avg(value) * 1000 + 0.5) AS BIGINT) AS x
      |      FROM e GROUP BY 1, 2),
      |p AS (SELECT g.user_id, l.lag_h, g.x, h.x AS y
      |      FROM g CROSS JOIN (SELECT unnest([1, 2, 3]) AS lag_h) l
      |      JOIN g h ON g.user_id IS NOT DISTINCT FROM h.user_id
      |        AND g.b + l.lag_h = h.b),
      |s AS (SELECT user_id, lag_h, count(*) AS n_pairs,
      |        sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
      |        sum(y * y) AS syy, sum(x * y) AS sxy
      |      FROM p GROUP BY 1, 2)
      |SELECT user_id, lag_h, n_pairs,
      |  CASE WHEN n_pairs >= 8
      |    AND CAST(n_pairs AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
      |    AND CAST(n_pairs AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy > 0
      |  THEN round((CAST(n_pairs AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
      |    / sqrt((CAST(n_pairs AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
      |         * (CAST(n_pairs AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
      |  END AS r
      |FROM s""".stripMargin

  /** Hourly click-vs-view cross-correlation at lags −2..2 (counts are
    * integers, so the statistics are exact with no quantization). */
  def qXcorr(spark: SparkSession, dir: String): DataFrame =
    graft.events.Correlation.crossCorr(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_type").as("key"), tsUs.as("t")),
      keyA = "click", keyB = "view",
      lags = Seq(-2, -1, 0, 1, 2), binUs = HOUR, minBins = 8)
      .select(col("lag").as("lag_h"), col("n_bins"), col("r"))

  val sqlXcorr: String =
    """WITH e AS (SELECT event_type, epoch_us(ts) // 3600000000 AS b
      |           FROM events WHERE event_type IN ('click', 'view')),
      |c AS (SELECT event_type, b, count(*) AS c FROM e GROUP BY 1, 2),
      |p AS (SELECT l.lag_h, a.c AS x, v.c AS y
      |      FROM (SELECT b, c FROM c WHERE event_type = 'click') a
      |      CROSS JOIN (SELECT unnest([-2, -1, 0, 1, 2]) AS lag_h) l
      |      JOIN (SELECT b, c FROM c WHERE event_type = 'view') v
      |        ON a.b + l.lag_h = v.b),
      |s AS (SELECT lag_h, count(*) AS n_bins,
      |        sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
      |        sum(y * y) AS syy, sum(x * y) AS sxy
      |      FROM p GROUP BY 1)
      |SELECT lag_h, n_bins,
      |  CASE WHEN n_bins >= 8
      |    AND CAST(n_bins AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
      |    AND CAST(n_bins AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy > 0
      |  THEN round((CAST(n_bins AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
      |    / sqrt((CAST(n_bins AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
      |         * (CAST(n_bins AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
      |  END AS r
      |FROM s""".stripMargin

  /** Theil–Sen robust weekly trend per user: exact interpolated median
    * of pairwise per-hour slopes quantized to the 1e-6 grid (floor-based
    * snap — see Correlation.theilSen on round()'s non-portable half-up
    * tie-break); the O(n²) blowup is bounded per (user, week) bucket by
    * construction. */
  def qTheilSen(spark: SparkSession, dir: String): DataFrame =
    graft.events.Correlation.theilSen(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("user_id").as("key"), tsUs.as("t"), col("value").as("v")),
      bucketUs = WEEK, perUs = HOUR)
      .select(col("key").as("user_id"), col("bucket").as("week"),
        col("n_pairs"), col("slope"))

  val sqlTheilSen: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) // 604800000000 AS week,
      |             epoch_us(ts) AS t, value AS v
      |           FROM events WHERE value IS NOT NULL),
      |p AS (SELECT a.user_id, a.week,
      |        CAST(floor((b.v - a.v) * 3600000000 * 1000000.0 / (b.t - a.t)
      |          + 0.5) AS BIGINT) AS s
      |      FROM e a JOIN e b ON a.user_id IS NOT DISTINCT FROM b.user_id
      |        AND a.week = b.week AND a.t < b.t)
      |SELECT user_id, week, count(*) AS n_pairs,
      |  quantile_cont(s, 0.5) / 1000000.0 AS slope
      |FROM p GROUP BY 1, 2""".stripMargin

  /** LTTB downsample per (event_type, 6h bucket), fixed-anchor parallel
    * variant — the perceptual companion to q99's M4; anchors quantized
    * to 6 dp from exact sums so the area argmax is engine-exact. */
  def qLttb(spark: SparkSession, dir: String): DataFrame =
    Rollup.lttb(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_type").as("key"), tsUs.as("t"), col("value").as("v")),
      startUs = 1704067200000000L, stepUs = 6 * HOUR)
      .select(col("key").as("event_type"), col("bin_start"), col("t"), col("v"))

  val sqlLttb: String =
    """WITH e AS (SELECT event_type, epoch_us(ts) AS t, value AS v
      |           FROM events WHERE value IS NOT NULL),
      |b AS (SELECT event_type,
      |        CAST((t - 1704067200000000) // 21600000000 * 21600000000
      |             + 1704067200000000 AS BIGINT) AS bin_start, t, v
      |      FROM e),
      |a AS (SELECT event_type, bin_start,
      |        CAST(sum(t) AS DOUBLE) / count(*) AS ax,
      |        floor(avg(v) * 1000000.0 + 0.5) / 1000000.0 AS ay
      |      FROM b GROUP BY 1, 2),
      |w AS (SELECT event_type, bin_start,
      |        lag(ax) OVER win AS pax, lag(ay) OVER win AS pay,
      |        lead(ax) OVER win AS nax, lead(ay) OVER win AS nay
      |      FROM a WINDOW win AS (PARTITION BY event_type ORDER BY bin_start)),
      |j AS (SELECT b.event_type, b.bin_start, b.t, b.v, w.pax, w.nax,
      |        abs((w.pax - w.nax) * (b.v - w.pay)
      |          - (w.pax - b.t) * (w.nay - w.pay)) AS area
      |      FROM b JOIN w ON b.event_type IS NOT DISTINCT FROM w.event_type
      |        AND b.bin_start = w.bin_start),
      |r AS (SELECT *,
      |        row_number() OVER (PARTITION BY event_type, bin_start
      |          ORDER BY area DESC, t ASC, v ASC) AS ra,
      |        row_number() OVER (PARTITION BY event_type, bin_start
      |          ORDER BY t ASC, v ASC) AS rf,
      |        row_number() OVER (PARTITION BY event_type, bin_start
      |          ORDER BY t DESC, v DESC) AS rl
      |      FROM j)
      |SELECT event_type, bin_start, t, v FROM r
      |WHERE CASE WHEN pax IS NULL THEN rf = 1
      |           WHEN nax IS NULL THEN rl = 1
      |           ELSE ra = 1 END""".stripMargin

  /** Daily SAX words per user (8×3h PAA segments, 4-symbol absolute
    * alphabet over [0,500), '_' for empty segments) — identical words
    * are motif candidates. */
  def qSax(spark: SparkSession, dir: String): DataFrame =
    Rollup.saxWords(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("user_id").as("key"), tsUs.as("t"), col("value").as("v")),
      wordUs = DAY, segUs = 3 * HOUR, alphabet = 4, lo = 0.0, hi = 500.0)
      .select(col("key").as("user_id"), col("word_start"), col("word"),
        col("n_segs"))

  val sqlSax: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS t, value AS v
      |           FROM events WHERE value IS NOT NULL),
      |p AS (SELECT user_id,
      |        CAST(t // 86400000000 * 86400000000 AS BIGINT) AS word_start,
      |        CAST((t // 10800000000) % 8 AS INT) AS seg,
      |        floor(avg(v) * 1000000.0 + 0.5) / 1000000.0 AS paa
      |      FROM e GROUP BY 1, 2, 3),
      |s AS (SELECT user_id, word_start, seg,
      |        chr(97 + CAST(least(3, greatest(0, floor(paa / 125.0))) AS INT))
      |          AS sym
      |      FROM p),
      |g AS (SELECT DISTINCT user_id, word_start FROM s),
      |x AS (SELECT g.user_id, g.word_start, i.seg,
      |        coalesce(s.sym, '_') AS sym
      |      FROM g CROSS JOIN
      |        (SELECT unnest([0, 1, 2, 3, 4, 5, 6, 7]) AS seg) i
      |      LEFT JOIN s ON s.user_id IS NOT DISTINCT FROM g.user_id
      |        AND s.word_start = g.word_start AND s.seg = i.seg)
      |SELECT user_id, word_start,
      |  string_agg(sym, '' ORDER BY seg) AS word,
      |  count(*) FILTER (WHERE sym <> '_') AS n_segs
      |FROM x GROUP BY 1, 2""".stripMargin

  /** SAX discord per user: the calendar day whose SAX word is rarest
    * for that user (HOT-SAX report shape) — q121's symbolization put to
    * its anomaly-flagging use; exact integer counts, earliest-day
    * tie-break. */
  def qSaxDiscord(spark: SparkSession, dir: String): DataFrame =
    Rollup.saxDiscord(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("user_id").as("key"), tsUs.as("t"), col("value").as("v")),
      wordUs = DAY, segUs = 3 * HOUR, alphabet = 4, lo = 0.0, hi = 500.0)
      .select(col("key").as("user_id"), col("discord_start"), col("word"),
        col("n_occ"), col("n_words"))

  val sqlSaxDiscord: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS t, value AS v
      |           FROM events WHERE value IS NOT NULL),
      |p AS (SELECT user_id,
      |        CAST(t // 86400000000 * 86400000000 AS BIGINT) AS word_start,
      |        CAST((t // 10800000000) % 8 AS INT) AS seg,
      |        floor(avg(v) * 1000000.0 + 0.5) / 1000000.0 AS paa
      |      FROM e GROUP BY 1, 2, 3),
      |s AS (SELECT user_id, word_start, seg,
      |        chr(97 + CAST(least(3, greatest(0, floor(paa / 125.0))) AS INT))
      |          AS sym
      |      FROM p),
      |g AS (SELECT DISTINCT user_id, word_start FROM s),
      |x AS (SELECT g.user_id, g.word_start, i.seg,
      |        coalesce(s.sym, '_') AS sym
      |      FROM g CROSS JOIN
      |        (SELECT unnest([0, 1, 2, 3, 4, 5, 6, 7]) AS seg) i
      |      LEFT JOIN s ON s.user_id IS NOT DISTINCT FROM g.user_id
      |        AND s.word_start = g.word_start AND s.seg = i.seg),
      |w AS (SELECT user_id, word_start,
      |        string_agg(sym, '' ORDER BY seg) AS word
      |      FROM x GROUP BY 1, 2),
      |c AS (SELECT user_id, word, count(*) AS n_occ FROM w GROUP BY 1, 2),
      |j AS (SELECT w.user_id, w.word_start, w.word, c.n_occ
      |      FROM w JOIN c USING (user_id, word))
      |SELECT user_id, word_start AS discord_start, word, n_occ, n_words
      |FROM (SELECT j.*,
      |        row_number() OVER (PARTITION BY user_id
      |          ORDER BY n_occ, word_start) AS rn,
      |        count(*) OVER (PARTITION BY user_id) AS n_words
      |      FROM j) WHERE rn = 1""".stripMargin

  /** Top-3 largest inter-event gaps per user — the backfill-targeting
    * report; exact long arithmetic end to end. */
  def qTopGaps(spark: SparkSession, dir: String): DataFrame =
    EventOps.topGaps(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("user_id").as("key"), tsUs.as("t")),
      k = 3)
      .select(col("key").as("user_id"), col("gap_rank"),
        col("t_prev"), col("t"), col("gap"))

  val sqlTopGaps: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
      |g AS (SELECT user_id, t,
      |        lag(t) OVER (PARTITION BY user_id ORDER BY t) AS t_prev
      |      FROM e),
      |h AS (SELECT user_id, t_prev, t, t - t_prev AS gap
      |      FROM g WHERE t_prev IS NOT NULL),
      |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
      |        ORDER BY gap DESC, t ASC) AS gap_rank
      |      FROM h)
      |SELECT user_id, gap_rank, t_prev, t, gap FROM r WHERE gap_rank <= 3""".stripMargin

  /** Staleness-bounded sampling: the hourly previous-value grid of q03,
    * but a carried measurement expires after 6h (the PromQL lookback
    * rule) — grid points in a gap longer than the bound read null
    * instead of the last pre-gap value. Oracle = the q03 ASOF join plus
    * the age predicate. */
  def qStaleSample(spark: SparkSession, dir: String): DataFrame = {
    val pts = points(spark, dir)
    val (tmin, tmax) = eventBounds(spark, dir)
    Regularize.samplePreviousStale(
      pts, Regularize.gridSeq(pts, tmin, tmax, HOUR), nullD,
      maxAgeUs = 6 * HOUR)
  }

  val sqlStaleSample: String =
    sqlPrefix() +
      s""", grid AS (
         |  SELECT key, gt FROM (SELECT DISTINCT key FROM pts),
         |    unnest(generate_series((SELECT tmin FROM b), (SELECT tmax FROM b), $HOUR)) g(gt))
         |SELECT g.key AS key, g.gt AS t,
         |  CASE WHEN g.gt - p.t <= ${6 * HOUR} THEN p.v END AS v
         |FROM grid g ASOF LEFT JOIN pts p ON g.key = p.key AND g.gt >= p.t""".stripMargin

  /** Per-(user, state) dwell-time statistics: how long each user STAYS
    * in a state per entry — run-length analytics over the compacted
    * state series (q63 sums total time-in-state; this reports the runs
    * themselves: count, total, max, mean). The final run of each user
    * is unterminated and excluded, like the open last segment
    * everywhere else. */
  def qStateDwell(spark: SparkSession, dir: String): DataFrame =
    graft.categorical.CategoricalOps.dwellStats(statePoints(spark, dir))

  val sqlStateDwell: String =
    sqlStatePts +
      """,
        |l AS (SELECT key, t, sv,
        |        CASE WHEN sv IS DISTINCT FROM lag(sv) OVER w THEN 1 ELSE 0
        |        END AS nw
        |      FROM spts WINDOW w AS (PARTITION BY key ORDER BY t)),
        |r AS (SELECT key, t, sv,
        |        sum(nw) OVER (PARTITION BY key ORDER BY t
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
        |      FROM l),
        |p AS (SELECT key, run, min(sv) AS sv, min(t) AS r0
        |      FROM r GROUP BY 1, 2),
        |q AS (SELECT key, sv, r0,
        |        lead(r0) OVER (PARTITION BY key ORDER BY r0) AS r1 FROM p)
        |SELECT key, sv, count(*) AS n_runs, CAST(sum(r1 - r0) AS BIGINT) AS total_us,
        |  max(r1 - r0) AS max_run_us,
        |  CAST(sum(r1 - r0) AS DOUBLE) / count(*) AS mean_run_us
        |FROM q WHERE r1 IS NOT NULL GROUP BY 1, 2""".stripMargin

  /** Robust median/MAD outlier scan per (user, week): Hampel's rule on
    * weekly buckets — every point scored |v − med| / MAD against its
    * own bucket, flags at 3.5 MADs. The 1e-3 long quantization keeps
    * both exact medians (halves/quarters) bit-identical cross-engine. */
  def qMadAnomaly(spark: SparkSession, dir: String): DataFrame =
    EventOps.madAnomaly(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("user_id").as("key"), tsUs.as("t"), col("value").as("v")),
      bucketUs = WEEK, nMad = 3.5, minN = 4)
      .select(col("key").as("user_id"), col("bucket").as("week"),
        col("t"), col("v"), col("score"), col("anomaly"))

  val sqlMadAnomaly: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS t, value AS v,
      |             epoch_us(ts) // 604800000000 AS week,
      |             CAST(floor(value * 1000 + 0.5) AS BIGINT) AS x
      |           FROM events WHERE value IS NOT NULL),
      |m AS (SELECT user_id, week, quantile_cont(x, 0.5) AS med,
      |        count(*) AS n
      |      FROM e GROUP BY 1, 2),
      |d AS (SELECT e.user_id, e.week, e.t, e.v, m.n,
      |        abs(e.x - m.med) AS dev
      |      FROM e JOIN m ON e.user_id IS NOT DISTINCT FROM m.user_id
      |        AND e.week = m.week),
      |md AS (SELECT user_id, week, quantile_cont(dev, 0.5) AS mad
      |       FROM d GROUP BY 1, 2)
      |SELECT d.user_id, d.week, d.t, d.v,
      |  CASE WHEN d.n >= 4 AND md.mad > 0
      |    THEN floor(d.dev / md.mad * 1000000 + 0.5) / 1000000
      |  END AS score,
      |  CAST(coalesce(d.n >= 4 AND md.mad > 0 AND d.dev / md.mad > 3.5,
      |    FALSE) AS INT) AS anomaly
      |FROM d JOIN md ON d.user_id IS NOT DISTINCT FROM md.user_id
      |  AND d.week = md.week""".stripMargin

  /** Two-sided level-shift (step-change) detector per user: mean of the
    * 12 points before vs the 12 from here on, flag when the jump
    * exceeds 25.0 — integer window SUMS end to end, so not even the
    * flag needs a rounding step. */
  def qLevelShift(spark: SparkSession, dir: String): DataFrame =
    EventOps.levelShift(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("user_id").as("key"), tsUs.as("t"), col("value").as("v")),
      w = 12, threshold = 25.0)
      .select(col("key").as("user_id"), col("t"), col("v"),
        col("pre_mean"), col("post_mean"), col("shift"), col("level_shift"))

  val sqlLevelShift: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS t, value AS v,
      |             CAST(floor(value * 1000 + 0.5) AS BIGINT) AS x
      |           FROM events WHERE value IS NOT NULL),
      |w AS (SELECT user_id, t, v,
      |        sum(x) OVER pre AS spre, count(*) OVER pre AS npre,
      |        sum(x) OVER post AS spost, count(*) OVER post AS npost
      |      FROM e
      |      WINDOW pre AS (PARTITION BY user_id ORDER BY t, v
      |          ROWS BETWEEN 12 PRECEDING AND 1 PRECEDING),
      |        post AS (PARTITION BY user_id ORDER BY t, v
      |          ROWS BETWEEN CURRENT ROW AND 11 FOLLOWING))
      |SELECT user_id, t, v,
      |  CASE WHEN npre = 12 AND npost = 12
      |    THEN round(spre / 12000.0, 6) END AS pre_mean,
      |  CASE WHEN npre = 12 AND npost = 12
      |    THEN round(spost / 12000.0, 6) END AS post_mean,
      |  CASE WHEN npre = 12 AND npost = 12
      |    THEN round((spost - spre) / 12000.0, 6) END AS shift,
      |  CAST(coalesce(npre = 12 AND npost = 12
      |    AND abs(spost - spre) > 300000, FALSE) AS INT) AS level_shift
      |FROM w""".stripMargin

  /** Banded DTW distance between every pair of event-type hourly series
    * (Sakoe–Chiba band 16). The DP is integer-exact end to end (1e-3
    * grid bin means, long L1 costs), so the oracle below replays it as
    * a recursive CTE marching the anti-diagonal wavefront — cells on
    * diagonal d depend only on diagonals d-1/d-2, so each iteration
    * carries two diagonals and the in-row left-to-right dependency
    * never blocks (the q130/q66 recursive-CTE pattern, round-4 verdict
    * #6). */
  def qDtw(spark: SparkSession, dir: String): DataFrame =
    graft.events.Correlation.dtwPairs(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_type").as("key"), tsUs.as("t"),
          col("value").as("v")),
      binUs = HOUR, band = 16)

  /** DuckDB replay of [[qDtw]]: exact integer DP over the banded cell
    * set. `rec` seeds the virtual (0,0)=0 corner and each iteration
    * (a) re-emits the newest diagonal once (so the NEXT diagonal can
    * read it as its up/left predecessors and the one after as its
    * diagonal predecessor) and (b) computes the next diagonal as
    * cost + min over the up-to-three predecessor contributions. A pair
    * whose (n_a, n_b) corner is unreachable inside the band keeps a
    * null dtw via the final left join — the banded DP's documented
    * narrow-band case. */
  val sqlDtw: String =
    """WITH RECURSIVE
      |e AS (SELECT event_type AS key, epoch_us(ts) AS t, value AS v
      |      FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
      |g AS (SELECT key, t // 3600000000 AS b,
      |        CAST(floor((CAST(sum(CAST(floor(v * 1000 + 0.5) AS BIGINT))
      |                         AS DOUBLE)
      |                    / CAST(count(*) AS DOUBLE)) + 0.5) AS BIGINT) AS x
      |      FROM e GROUP BY key, b),
      |idx AS (SELECT key, x,
      |          CAST(row_number() OVER (PARTITION BY key ORDER BY b)
      |            AS BIGINT) AS i,
      |          count(*) OVER (PARTITION BY key) AS n
      |        FROM g),
      |ks AS (SELECT DISTINCT key, n FROM idx),
      |pairs AS (SELECT a.key AS ka, b.key AS kb, a.n AS n_a, b.n AS n_b
      |          FROM ks a JOIN ks b ON a.key < b.key),
      |cells AS (
      |  SELECT p.ka, p.kb, xa.i AS i, xb.i AS j, abs(xa.x - xb.x) AS c
      |  FROM pairs p
      |  JOIN idx xa ON xa.key = p.ka
      |  JOIN idx xb ON xb.key = p.kb
      |  WHERE xb.i >= greatest(1, ((xa.i * p.n_b) // p.n_a) - 16)
      |    AND xb.i <= least(p.n_b, ((xa.i * p.n_b) // p.n_a) + 16)),
      |rec AS (
      |  SELECT ka, kb, CAST(1 AS BIGINT) AS cd, CAST(0 AS BIGINT) AS i,
      |         CAST(0 AS BIGINT) AS j, CAST(0 AS BIGINT) AS v
      |  FROM pairs
      |  UNION ALL
      |  (SELECT r.ka, r.kb, r.cd + 1, r.i, r.j, r.v
      |   FROM rec r WHERE r.i + r.j = r.cd
      |   UNION ALL
      |   SELECT c.ka, c.kb, r.cd + 1, c.i, c.j, c.c + min(r.v)
      |   FROM rec r JOIN cells c ON c.ka = r.ka AND c.kb = r.kb
      |     AND c.i + c.j = r.cd + 1
      |     AND ((c.i = r.i + 1 AND c.j = r.j) OR (c.i = r.i AND c.j = r.j + 1)
      |          OR (c.i = r.i + 1 AND c.j = r.j + 1))
      |   GROUP BY c.ka, c.kb, r.cd, c.i, c.j, c.c)),
      |fin AS (SELECT ka, kb, i, j, min(v) AS v FROM rec GROUP BY ka, kb, i, j)
      |SELECT p.ka AS key_a, p.kb AS key_b, CAST(p.n_a AS INT) AS n_a,
      |  CAST(p.n_b AS INT) AS n_b,
      |  f.v / 1000.0 AS dtw,
      |  f.v / 1000.0 / (p.n_a + p.n_b) AS dtw_per_step
      |FROM pairs p LEFT JOIN fin f
      |  ON f.ka = p.ka AND f.kb = p.kb AND f.i = p.n_a AND f.j = p.n_b"""
      .stripMargin

  /** Hourly rate-burst report per event type: a bin bursts when its
    * count exceeds 2× its own trailing-24h per-hour average; the flag
    * compares exact integer cross-products, the RANGE frame makes empty
    * hours free. */
  def qBurstRate(spark: SparkSession, dir: String): DataFrame =
    EventOps.burstRate(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_type").as("key"), tsUs.as("t")),
      baseHours = 24, factor = 2)
      .select(col("key").as("event_type"), col("hour"), col("n"),
        col("base"), col("ratio"), col("burst"))

  val sqlBurstRate: String =
    """WITH e AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hour
      |           FROM events),
      |c AS (SELECT event_type, hour, count(*) AS n FROM e GROUP BY 1, 2),
      |w AS (SELECT event_type, hour, n,
      |        CAST(coalesce(sum(n) OVER (PARTITION BY event_type ORDER BY hour
      |          RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS base,
      |        min(hour) OVER (PARTITION BY event_type) AS h0
      |      FROM c)
      |SELECT event_type, hour, n, base,
      |  CASE WHEN hour >= h0 + 24 AND base > 0
      |    THEN round(n * 24 / CAST(base AS DOUBLE), 6) END AS ratio,
      |  CAST(coalesce(hour >= h0 + 24 AND base > 0 AND n * 24 > base * 2,
      |    FALSE) AS INT) AS burst
      |FROM w""".stripMargin

  /** Exact OLS trend per (user, week): slope/intercept/r² from six
    * integer-exact sufficient statistics (x = seconds into the week,
    * y = milli-value) — the parametric fit beside q119's Theil–Sen
    * median slope. */
  def qOlsTrend(spark: SparkSession, dir: String): DataFrame =
    EventOps.olsTrend(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("user_id").as("key"), tsUs.as("t"), col("value").as("v")),
      bucketUs = WEEK, minN = 3)
      .select(col("key").as("user_id"), col("bucket").as("week"), col("n"),
        col("slope_per_hr"), col("intercept"), col("r2"))

  val sqlOlsTrend: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) // 604800000000 AS week,
      |             (epoch_us(ts) - epoch_us(ts) // 604800000000
      |               * 604800000000) // 1000000 AS x,
      |             CAST(floor(value * 1000 + 0.5) AS BIGINT) AS y
      |           FROM events WHERE value IS NOT NULL),
      |s AS (SELECT user_id, week, count(*) AS n, sum(x) AS sx,
      |        sum(y) AS sy, sum(x * x) AS sxx, sum(y * y) AS syy,
      |        sum(x * y) AS sxy
      |      FROM e GROUP BY 1, 2),
      |d AS (SELECT *,
      |        CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx AS dxx,
      |        CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy AS dyy,
      |        CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy AS dxy
      |      FROM s)
      |SELECT user_id, week, n,
      |  CASE WHEN n >= 3 AND dxx > 0 AND dyy > 0
      |    THEN round(dxy / dxx * 3600 / 1000.0, 6) END AS slope_per_hr,
      |  CASE WHEN n >= 3 AND dxx > 0 AND dyy > 0
      |    THEN round((sy / 1000.0 - dxy / dxx / 1000.0 * sx) / n, 6)
      |  END AS intercept,
      |  CASE WHEN n >= 3 AND dxx > 0 AND dyy > 0
      |    THEN round(dxy * dxy / (dxx * dyy), 6) END AS r2
      |FROM d""".stripMargin

  /** Debounce with a 2h cooldown per user: the greedy chain of kept
    * timestamps (first event, then the first ≥ 2h after the last kept
    * one). The oracle replays the chain with a recursive CTE — one kept
    * frontier row per user per iteration. */
  def qDebounce(spark: SparkSession, dir: String): DataFrame =
    EventOps.debounce(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("user_id").as("key"), tsUs.as("t")),
      cooldownUs = 2 * HOUR)
      .select(col("key").as("user_id"), col("t"))

  val sqlDebounce: String =
    s"""WITH RECURSIVE e AS (
       |  SELECT DISTINCT user_id, epoch_us(ts) AS t FROM events),
       |k AS (
       |  SELECT user_id, min(t) AS t FROM e GROUP BY 1
       |  UNION ALL
       |  SELECT e.user_id, min(e.t) AS t
       |  FROM k JOIN e ON e.user_id = k.user_id
       |    AND e.t >= k.t + ${2 * HOUR}
       |  GROUP BY 1)
       |SELECT user_id, t FROM k""".stripMargin

  /** Seasonal-naive MASE backtest per event type on the hourly grid with
    * a 24h season: does yesterday-same-hour beat the previous existing
    * bin as a forecast? Both error sums are exact 1e-3 longs; the three
    * reported doubles are one division each. */
  def qSeasonalMase(spark: SparkSession, dir: String): DataFrame =
    graft.events.Correlation.seasonalNaive(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_type").as("key"), tsUs.as("t"),
          col("value").as("v")),
      season = 24, binUs = HOUR, minPairs = 8)
      .select(col("key").as("event_type"), col("n_seasonal"),
        col("n_naive"), col("mae_seasonal"), col("mae_naive"), col("mase"))

  val sqlSeasonalMase: String =
    """WITH e AS (SELECT event_type, epoch_us(ts) // 3600000000 AS b,
      |             value AS v
      |           FROM events WHERE value IS NOT NULL),
      |g AS (SELECT event_type, b,
      |        CAST(floor(avg(v) * 1000 + 0.5) AS BIGINT) AS x
      |      FROM e GROUP BY 1, 2),
      |s AS (SELECT g.event_type, count(*) AS n_seasonal,
      |        sum(abs(g.x - r.x)) AS es
      |      FROM g JOIN g r
      |        ON g.event_type IS NOT DISTINCT FROM r.event_type
      |        AND g.b - 24 = r.b
      |      GROUP BY 1),
      |nv AS (SELECT event_type, count(*) AS n_naive, sum(abs(x - p)) AS en
      |       FROM (SELECT event_type, x,
      |               lag(x) OVER (PARTITION BY event_type ORDER BY b) AS p
      |             FROM g)
      |       WHERE p IS NOT NULL GROUP BY 1)
      |SELECT coalesce(s.event_type, nv.event_type) AS event_type,
      |  coalesce(s.n_seasonal, 0) AS n_seasonal,
      |  coalesce(nv.n_naive, 0) AS n_naive,
      |  CASE WHEN coalesce(s.n_seasonal, 0) >= 8
      |    AND coalesce(nv.n_naive, 0) >= 8 AND nv.en > 0
      |    THEN round(s.es / (1000.0 * s.n_seasonal), 6) END AS mae_seasonal,
      |  CASE WHEN coalesce(s.n_seasonal, 0) >= 8
      |    AND coalesce(nv.n_naive, 0) >= 8 AND nv.en > 0
      |    THEN round(nv.en / (1000.0 * nv.n_naive), 6) END AS mae_naive,
      |  CASE WHEN coalesce(s.n_seasonal, 0) >= 8
      |    AND coalesce(nv.n_naive, 0) >= 8 AND nv.en > 0
      |    THEN round((CAST(s.es AS DOUBLE) / s.n_seasonal)
      |      / (CAST(nv.en AS DOUBLE) / nv.n_naive), 6) END AS mase
      |FROM s FULL OUTER JOIN nv
      |  ON s.event_type IS NOT DISTINCT FROM nv.event_type""".stripMargin

  /** Calendar occupancy heatmap per event type: event count and share
    * per (weekday, UTC hour) cell — Monday=0 via the
    * epoch-day-0-is-Thursday shift, the distributionByDayOfWeek
    * convention. */
  def qCalendarHeatmap(spark: SparkSession, dir: String): DataFrame =
    Rollup.calendarHeatmap(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_type").as("key"), tsUs.as("t")))
      .select(col("key").as("event_type"), col("weekday"), col("hour"),
        col("n"), col("share"))

  val sqlCalendarHeatmap: String =
    """WITH e AS (SELECT event_type, epoch_us(ts) AS t FROM events),
      |c AS (SELECT event_type,
      |        CAST((t // 86400000000 + 3) % 7 AS INT) AS weekday,
      |        CAST((t // 3600000000) % 24 AS INT) AS hour,
      |        count(*) AS n
      |      FROM e GROUP BY 1, 2, 3),
      |tt AS (SELECT event_type, sum(n) AS tot FROM c GROUP BY 1)
      |SELECT c.event_type, c.weekday, c.hour, c.n,
      |  round(c.n / CAST(tt.tot AS DOUBLE), 6) AS share
      |FROM c JOIN tt
      |  ON c.event_type IS NOT DISTINCT FROM tt.event_type""".stripMargin

  /** Deadband compression with a 20.0-wide band per user: keep a point
    * only when the (1e-3-quantized) value moved ≥ 20 away from the last
    * KEPT value. The oracle replays the greedy chain with a recursive
    * CTE, one frontier row per user per iteration, arg_min carrying the
    * kept value forward. */
  def qDeadband(spark: SparkSession, dir: String): DataFrame =
    EventOps.deadband(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("user_id").as("key"), tsUs.as("t"),
          col("value").as("v")),
      delta = 20.0)
      .select(col("key").as("user_id"), col("t"), col("v"))

  val sqlDeadband: String =
    """WITH RECURSIVE e AS (
      |  SELECT user_id, epoch_us(ts) AS t, max(value) AS v,
      |    CAST(floor(max(value) * 1000 + 0.5) AS BIGINT) AS x
      |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
      |k AS (
      |  SELECT user_id, min(t) AS t, arg_min(v, t) AS v, arg_min(x, t) AS x
      |  FROM e GROUP BY 1
      |  UNION ALL
      |  SELECT e.user_id, min(e.t) AS t, arg_min(e.v, e.t) AS v,
      |    arg_min(e.x, e.t) AS x
      |  FROM k JOIN e ON e.user_id = k.user_id AND e.t > k.t
      |    AND abs(e.x - k.x) >= 20000
      |  GROUP BY 1)
      |SELECT user_id, t, v FROM k""".stripMargin

  /** Lead/lag detection between click and view hourly rates: the lag in
    * [-6h, 6h] with the strongest |cross-correlation| (ties to the
    * smallest lag) — one max_by aggregate over the q118 CCF sweep. */
  def qBestLag(spark: SparkSession, dir: String): DataFrame =
    graft.events.Correlation.bestLag(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_type").as("key"), tsUs.as("t")),
      keyA = "click", keyB = "view", maxLag = 6, binUs = HOUR, minBins = 8)
      .select(col("lag").as("lag_h"), col("n_bins"), col("r"))

  val sqlBestLag: String =
    """WITH e AS (SELECT event_type, epoch_us(ts) // 3600000000 AS b
      |           FROM events WHERE event_type IN ('click', 'view')),
      |c AS (SELECT event_type, b, count(*) AS c FROM e GROUP BY 1, 2),
      |p AS (SELECT l.lag_h, a.c AS x, v.c AS y
      |      FROM (SELECT b, c FROM c WHERE event_type = 'click') a
      |      CROSS JOIN (SELECT unnest([-6, -5, -4, -3, -2, -1, 0, 1, 2,
      |        3, 4, 5, 6]) AS lag_h) l
      |      JOIN (SELECT b, c FROM c WHERE event_type = 'view') v
      |        ON a.b + l.lag_h = v.b),
      |s AS (SELECT lag_h, count(*) AS n_bins,
      |        sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
      |        sum(y * y) AS syy, sum(x * y) AS sxy
      |      FROM p GROUP BY 1),
      |r AS (SELECT lag_h, n_bins,
      |        CASE WHEN n_bins >= 8
      |          AND CAST(n_bins AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
      |          AND CAST(n_bins AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy > 0
      |        THEN round((CAST(n_bins AS DOUBLE) * sxy
      |            - CAST(sx AS DOUBLE) * sy)
      |          / sqrt((CAST(n_bins AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
      |               * (CAST(n_bins AS DOUBLE) * syy
      |                 - CAST(sy AS DOUBLE) * sy)), 6)
      |        END AS r
      |      FROM s)
      |SELECT lag_h, n_bins, r FROM r WHERE r IS NOT NULL
      |ORDER BY abs(r) DESC, lag_h ASC LIMIT 1""".stripMargin

  /** Count-trimmed weekly mean per user: drop the 2 lowest and 2 highest
    * values (by (v, t) — deterministic), average the rest — rank
    * trimming, not percentile winsorizing, because interpolated
    * percentile boundaries are not bit-portable across engines. */
  def qTrimmedMean(spark: SparkSession, dir: String): DataFrame =
    EventOps.trimmedMean(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("user_id").as("key"), tsUs.as("t"),
          col("value").as("v")),
      bucketUs = WEEK, trim = 2)
      .select(col("key").as("user_id"), col("bucket").as("week"),
        col("n"), col("n_used"), col("trimmed_mean"))

  val sqlTrimmedMean: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS t,
      |             epoch_us(ts) // 604800000000 AS week,
      |             CAST(floor(value * 1000 + 0.5) AS BIGINT) AS x
      |           FROM events WHERE value IS NOT NULL),
      |w AS (SELECT user_id, week, x,
      |        row_number() OVER (PARTITION BY user_id, week
      |          ORDER BY x, t) AS rk,
      |        count(*) OVER (PARTITION BY user_id, week) AS n
      |      FROM e),
      |a AS (SELECT user_id, week, max(n) AS n,
      |        count(*) FILTER (WHERE rk > 2 AND rk <= n - 2) AS n_used,
      |        sum(CASE WHEN rk > 2 AND rk <= n - 2 THEN x ELSE 0 END) AS sx
      |      FROM w GROUP BY 1, 2)
      |SELECT user_id, week, n, n_used,
      |  CASE WHEN n_used > 0 THEN round(sx / (1000.0 * n_used), 6)
      |  END AS trimmed_mean
      |FROM a""".stripMargin

  /** Ingestion-completeness scorecard per (user, day): hourly-bin
    * coverage share and the longest silent stretch including the day's
    * edges — the per-source SLA report, exact long µs except the one
    * coverage division. */
  def qCompleteness(spark: SparkSession, dir: String): DataFrame =
    EventOps.completeness(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("user_id").as("key"), tsUs.as("t")),
      dayUs = DAY, binUs = HOUR)
      .select(col("key").as("user_id"), col("day"), col("n"),
        col("bins_present"), col("coverage"), col("max_gap_us"))

  val sqlCompleteness: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS t,
      |             epoch_us(ts) // 86400000000 AS day
      |           FROM events),
      |g AS (SELECT user_id, day, t,
      |        t - coalesce(lag(t) OVER (PARTITION BY user_id, day
      |          ORDER BY t), day * 86400000000) AS gap
      |      FROM e),
      |a AS (SELECT user_id, day, count(*) AS n,
      |        count(DISTINCT t // 3600000000) AS bins_present,
      |        max(gap) AS maxinner, max(t) AS lastt
      |      FROM g GROUP BY 1, 2)
      |SELECT user_id, day, n, bins_present,
      |  round(bins_present / 24.0, 6) AS coverage,
      |  greatest(maxinner, (day + 1) * 86400000000 - lastt) AS max_gap_us
      |FROM a""".stripMargin

  /** Composed burst-incident report: q128's hourly burst flags coalesced
    * into maximal consecutive-hour incident intervals (gaps-and-islands
    * on the hour index) with per-incident totals and peak ratio — the
    * alerting rollup a monitoring stack pages on, and the composition
    * proof that the battery's operators chain. */
  def qBurstIncidents(spark: SparkSession, dir: String): DataFrame = {
    val bursts = EventOps.burstRate(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_type").as("key"), tsUs.as("t")),
      baseHours = 24, factor = 2)
      .filter(col("burst") === 1)
    val w = Window.partitionBy(col("key")).orderBy(col("hour"))
    bursts
      .withColumn("_isl", col("hour") - row_number().over(w))
      .groupBy(col("key"), col("_isl"))
      .agg(min("hour").as("start_hour"), max("hour").as("end_hour"),
        count(lit(1)).as("n_hours"), sum("n").as("events"),
        max("ratio").as("peak_ratio"))
      .select(col("key").as("event_type"), col("start_hour"),
        col("end_hour"), col("n_hours"), col("events"), col("peak_ratio"))
  }

  val sqlBurstIncidents: String =
    """WITH e AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hour
      |           FROM events),
      |c AS (SELECT event_type, hour, count(*) AS n FROM e GROUP BY 1, 2),
      |w AS (SELECT event_type, hour, n,
      |        coalesce(sum(n) OVER (PARTITION BY event_type ORDER BY hour
      |          RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING), 0) AS base,
      |        min(hour) OVER (PARTITION BY event_type) AS h0
      |      FROM c),
      |b AS (SELECT event_type, hour, n,
      |        round(n * 24 / CAST(base AS DOUBLE), 6) AS ratio
      |      FROM w
      |      WHERE hour >= h0 + 24 AND base > 0 AND n * 24 > base * 2),
      |i AS (SELECT *, hour - row_number() OVER (PARTITION BY event_type
      |        ORDER BY hour) AS isl
      |      FROM b)
      |SELECT event_type, min(hour) AS start_hour, max(hour) AS end_hour,
      |  count(*) AS n_hours, CAST(sum(n) AS BIGINT) AS events, max(ratio) AS peak_ratio
      |FROM i GROUP BY event_type, isl""".stripMargin

  /** Daily AUC tier per user: left-Riemann (previous-interp) and
    * trapezoid integrals in value·seconds over each day's own points —
    * exact 1e-3-long terms summed in DECIMAL(38,0) (DuckDB: hugeint),
    * one double division at the end. */
  def qAuc(spark: SparkSession, dir: String): DataFrame =
    EventOps.auc(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("user_id").as("key"), tsUs.as("t"),
          col("value").as("v")),
      dayUs = DAY)
      .select(col("key").as("user_id"), col("day"), col("n"),
        col("auc_prev"), col("auc_linear"))

  val sqlAuc: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS t,
      |             epoch_us(ts) // 86400000000 AS day,
      |             CAST(floor(value * 1000 + 0.5) AS BIGINT) AS x
      |           FROM events WHERE value IS NOT NULL),
      |p AS (SELECT user_id, day, t, x,
      |        lead(t) OVER w - t AS dur, lead(x) OVER w AS x1
      |      FROM e
      |      WINDOW w AS (PARTITION BY user_id, day ORDER BY t, x)),
      |a AS (SELECT user_id, day, count(*) AS n,
      |        sum(CAST(dur AS HUGEINT) * x) AS sp,
      |        sum(CAST(dur AS HUGEINT) * (x + x1)) AS sl
      |      FROM p GROUP BY 1, 2)
      |SELECT user_id, day, n,
      |  CASE WHEN n > 1
      |    THEN floor(CAST(sp AS DOUBLE) / 1.0e9 * 1000000 + 0.5) / 1000000
      |  END AS auc_prev,
      |  CASE WHEN n > 1
      |    THEN floor(CAST(sl AS DOUBLE) / 2.0e9 * 1000000 + 0.5) / 1000000
      |  END AS auc_linear
      |FROM a""".stripMargin

  /** Western Electric SPC rules per (user, week): beyond-3σ points,
    * 2-of-3 beyond 2σ same side, 9 consecutive same side — side exact
    * in longs, σ comparisons the fixed-double-expression discipline. */
  def qSpcRules(spark: SparkSession, dir: String): DataFrame =
    EventOps.spcRules(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("user_id").as("key"), tsUs.as("t"),
          col("value").as("v")),
      bucketUs = WEEK, minN = 8)
      .select(col("key").as("user_id"), col("bucket").as("week"),
        col("t"), col("v"), col("side"), col("r1"), col("r2"), col("r4"))

  val sqlSpcRules: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS t, value AS v,
      |             epoch_us(ts) // 604800000000 AS week,
      |             CAST(floor(value * 1000 + 0.5) AS BIGINT) AS x
      |           FROM events WHERE value IS NOT NULL),
      |s AS (SELECT user_id, week, count(*) AS n, sum(x) AS sx,
      |        sum(x * x) AS sxx
      |      FROM e GROUP BY 1, 2),
      |j AS (SELECT e.user_id, e.week, e.t, e.v, e.x, s.n, s.sx, s.sxx,
      |        CAST(sign(s.n * e.x - s.sx) AS INT) AS side,
      |        abs(e.x - CAST(s.sx AS DOUBLE) / s.n) AS dev,
      |        sqrt((CAST(s.sxx AS DOUBLE)
      |          - CAST(s.sx AS DOUBLE) * s.sx / s.n) / s.n) AS sigma
      |      FROM e JOIN s ON e.user_id IS NOT DISTINCT FROM s.user_id
      |        AND e.week = s.week),
      |b AS (SELECT *,
      |        CAST(side = 1 AND dev > sigma * 2 AS INT) AS b2p,
      |        CAST(side = -1 AND dev > sigma * 2 AS INT) AS b2n,
      |        CAST(dev > sigma * 3 AS INT) AS r1f
      |      FROM j),
      |wn AS (SELECT *,
      |        sum(b2p) OVER w3 AS c2p, sum(b2n) OVER w3 AS c2n,
      |        sum(CAST(side = 1 AS INT)) OVER w9 AS c9p,
      |        sum(CAST(side = -1 AS INT)) OVER w9 AS c9n
      |      FROM b
      |      WINDOW w3 AS (PARTITION BY user_id, week ORDER BY t, x
      |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
      |        w9 AS (PARTITION BY user_id, week ORDER BY t, x
      |          ROWS BETWEEN 8 PRECEDING AND CURRENT ROW))
      |SELECT user_id, week, t, v,
      |  CASE WHEN n >= 8 THEN side END AS side,
      |  CAST(coalesce(n >= 8 AND r1f = 1, FALSE) AS INT) AS r1,
      |  CAST(coalesce(n >= 8 AND ((b2p = 1 AND c2p >= 2)
      |    OR (b2n = 1 AND c2n >= 2)), FALSE) AS INT) AS r2,
      |  CAST(coalesce(n >= 8 AND ((side = 1 AND c9p = 9)
      |    OR (side = -1 AND c9n = 9)), FALSE) AS INT) AS r4
      |FROM wn""".stripMargin

  /** Peak detection per user: strictly above the 6 points before, at
    * least the 6 after (plateaus resolve to their first point), both
    * frames full; local_range is height above the ±6 window minimum. */
  def qPeaks(spark: SparkSession, dir: String): DataFrame =
    EventOps.peaks(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("user_id").as("key"), tsUs.as("t"),
          col("value").as("v")),
      w = 6)
      .select(col("key").as("user_id"), col("t"), col("v"),
        col("local_range"))

  val sqlPeaks: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS t, value AS v,
      |             CAST(floor(value * 1000 + 0.5) AS BIGINT) AS x
      |           FROM events WHERE value IS NOT NULL),
      |w AS (SELECT user_id, t, v, x,
      |        count(*) OVER pre AS npre, count(*) OVER post AS npost,
      |        max(x) OVER pre AS mpre, max(x) OVER post AS mpost,
      |        min(x) OVER wboth AS mboth
      |      FROM e
      |      WINDOW pre AS (PARTITION BY user_id ORDER BY t, x
      |          ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING),
      |        post AS (PARTITION BY user_id ORDER BY t, x
      |          ROWS BETWEEN 1 FOLLOWING AND 6 FOLLOWING),
      |        wboth AS (PARTITION BY user_id ORDER BY t, x
      |          ROWS BETWEEN 6 PRECEDING AND 6 FOLLOWING))
      |SELECT user_id, t, v, round((x - mboth) / 1000.0, 6) AS local_range
      |FROM w
      |WHERE npre = 6 AND npost = 6 AND x > mpre AND x >= mpost""".stripMargin

  /** Running-record scan per user: new all-time highs/lows with the
    * margin past the previous record; the first point is both records
    * by convention. */
  def qRecords(spark: SparkSession, dir: String): DataFrame =
    EventOps.records(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("user_id").as("key"), tsUs.as("t"),
          col("value").as("v")))
      .select(col("key").as("user_id"), col("t"), col("v"),
        col("record_high"), col("record_low"), col("margin"))

  val sqlRecords: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS t, value AS v,
      |             CAST(floor(value * 1000 + 0.5) AS BIGINT) AS x
      |           FROM events WHERE value IS NOT NULL),
      |w AS (SELECT user_id, t, v, x,
      |        max(x) OVER pre AS hi, min(x) OVER pre AS lo
      |      FROM e
      |      WINDOW pre AS (PARTITION BY user_id ORDER BY t, x
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      |SELECT user_id, t, v,
      |  CAST(coalesce(x > hi, TRUE) AS INT) AS record_high,
      |  CAST(coalesce(x < lo, TRUE) AS INT) AS record_low,
      |  CASE WHEN coalesce(x > hi, TRUE) AND hi IS NOT NULL
      |      THEN round((x - hi) / 1000.0, 6)
      |    WHEN coalesce(x < lo, TRUE) AND lo IS NOT NULL
      |      THEN round((lo - x) / 1000.0, 6)
      |  END AS margin
      |FROM w
      |WHERE coalesce(x > hi, TRUE) OR coalesce(x < lo, TRUE)""".stripMargin

  /** Activity-overlap matrix across event types: exact Jaccard of
    * hourly active-bin sets for every co-active pair — the equi-join-
    * on-bin pair generator, never an all-pairs cross join. */
  def qActivityOverlap(spark: SparkSession, dir: String): DataFrame =
    graft.events.Correlation.activityOverlap(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_type").as("key"), tsUs.as("t")),
      binUs = HOUR)

  val sqlActivityOverlap: String =
    """WITH b AS (SELECT DISTINCT event_type,
      |             epoch_us(ts) // 3600000000 AS bin
      |           FROM events WHERE event_type IS NOT NULL),
      |tot AS (SELECT event_type, count(*) AS n FROM b GROUP BY 1),
      |i AS (SELECT l.event_type AS key_a, r.event_type AS key_b,
      |        count(*) AS inter
      |      FROM b l JOIN b r ON l.bin = r.bin
      |        AND l.event_type < r.event_type
      |      GROUP BY 1, 2)
      |SELECT i.key_a, i.key_b, ta.n AS n_a, tb.n AS n_b, i.inter,
      |  round(i.inter / CAST(ta.n + tb.n - i.inter AS DOUBLE), 6)
      |    AS jaccard
      |FROM i JOIN tot ta ON i.key_a = ta.event_type
      |JOIN tot tb ON i.key_b = tb.event_type""".stripMargin

  /** Schedule conformance per (user, week) against a nominal 1h
    * reporting period: on-time (gap ≤ 1.5h, tested as 2·gap ≤ 3h in
    * exact longs), late (≤ 3h), missed (beyond), plus the on-time
    * share. */
  def qScheduleConformance(spark: SparkSession, dir: String): DataFrame =
    EventOps.scheduleConformance(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("user_id").as("key"), tsUs.as("t")),
      periodUs = HOUR, bucketUs = WEEK)
      .select(col("key").as("user_id"), col("bucket").as("week"),
        col("n_gaps"), col("n_on_time"), col("n_late"), col("n_missed"),
        col("conformance"))

  val sqlScheduleConformance: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
      |g AS (SELECT user_id, t,
      |        t - lag(t) OVER (PARTITION BY user_id ORDER BY t) AS gap,
      |        t // 604800000000 AS week
      |      FROM e),
      |a AS (SELECT user_id, week, gap FROM g WHERE gap IS NOT NULL)
      |SELECT user_id, week, count(*) AS n_gaps,
      |  count(*) FILTER (WHERE gap * 2 <= 10800000000) AS n_on_time,
      |  count(*) FILTER (WHERE gap * 2 > 10800000000
      |    AND gap <= 10800000000) AS n_late,
      |  count(*) FILTER (WHERE gap > 10800000000) AS n_missed,
      |  round(count(*) FILTER (WHERE gap * 2 <= 10800000000)
      |    / CAST(count(*) AS DOUBLE), 6) AS conformance
      |FROM a GROUP BY 1, 2""".stripMargin

  /** Daily event-type leaderboard with rank churn vs the previous
    * appearing day: count ranks tie-break by name, delta positive =
    * moved up. */
  def qLeaderboard(spark: SparkSession, dir: String): DataFrame =
    EventOps.leaderboard(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_type").as("key"), tsUs.as("t")),
      dayUs = DAY)
      .select(col("key").as("event_type"), col("day"), col("n"),
        col("rank"), col("prev_rank"), col("delta"))

  val sqlLeaderboard: String =
    """WITH c AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |             count(*) AS n
      |           FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
      |r AS (SELECT event_type, day, n,
      |        row_number() OVER (PARTITION BY day
      |          ORDER BY n DESC, event_type) AS rank
      |      FROM c)
      |SELECT event_type, day, n, rank,
      |  lag(rank) OVER (PARTITION BY event_type ORDER BY day)
      |    AS prev_rank,
      |  lag(rank) OVER (PARTITION BY event_type ORDER BY day) - rank
      |    AS delta
      |FROM r""".stripMargin

  /** Trailing 7-day distinct active users per (event_type, day) — the
    * exact WAU tier; days with no data for the type emit nothing. */
  def qTrailingActives(spark: SparkSession, dir: String): DataFrame =
    EventOps.trailingDistinct(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_type").as("key"), tsUs.as("t"),
          col("user_id")),
      actorCol = "user_id", windowDays = 7, dayUs = DAY)
      .select(col("key").as("event_type"), col("day"), col("active"))

  val sqlTrailingActives: String =
    """WITH b AS (SELECT DISTINCT event_type,
      |             epoch_us(ts) // 86400000000 AS day, user_id
      |           FROM events
      |           WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
      |p AS (SELECT DISTINCT event_type, day FROM b),
      |x AS (SELECT b.event_type, b.day + g.i AS day, b.user_id
      |      FROM b CROSS JOIN (SELECT unnest(range(7)) AS i) g)
      |SELECT x.event_type, x.day, count(DISTINCT x.user_id) AS active
      |FROM x SEMI JOIN p ON x.event_type = p.event_type
      |  AND x.day = p.day
      |GROUP BY 1, 2""".stripMargin

  /** Daily OHLC bars per user — pure selection (open/close by time,
    * high/low by value), the one tier needing no rounding discipline at
    * all. */
  def qOhlc(spark: SparkSession, dir: String): DataFrame =
    Rollup.ohlc(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("user_id").as("key"), tsUs.as("t"),
          col("value").as("v")),
      bucketUs = DAY)
      .select(col("key").as("user_id"), col("bucket").as("day"),
        col("open"), col("high"), col("low"), col("close"), col("n"))

  val sqlOhlc: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS t, max(value) AS v
      |           FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
      |d AS (SELECT user_id, t // 86400000000 AS day, t, v FROM e)
      |SELECT user_id, day,
      |  arg_min(v, t) AS open, max(v) AS high, min(v) AS low,
      |  arg_max(v, t) AS close, count(*) AS n
      |FROM d GROUP BY 1, 2""".stripMargin

  /** Hour-of-day seasonal index per event type: each hour's mean value
    * over the type's overall mean, floor-snapped. */
  def qSeasonalIndex(spark: SparkSession, dir: String): DataFrame =
    Rollup.seasonalIndex(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_type").as("key"), tsUs.as("t"),
          col("value").as("v")))
      .select(col("key").as("event_type"), col("hour"), col("n"),
        col("hour_mean"), col("seasonal_index"))

  val sqlSeasonalIndex: String =
    """WITH e AS (SELECT event_type,
      |             CAST((epoch_us(ts) // 3600000000) % 24 AS INT) AS hour,
      |             CAST(floor(value * 1000 + 0.5) AS BIGINT) AS x
      |           FROM events WHERE value IS NOT NULL),
      |h AS (SELECT event_type, hour, count(*) AS n, sum(x) AS sh
      |      FROM e GROUP BY 1, 2),
      |t AS (SELECT event_type, sum(n) AS nt, sum(sh) AS st
      |      FROM h GROUP BY 1)
      |SELECT h.event_type, h.hour, h.n,
      |  floor(CAST(h.sh AS DOUBLE) / h.n / 1000.0 * 1000000 + 0.5)
      |    / 1000000 AS hour_mean,
      |  CASE WHEN t.st <> 0
      |    THEN floor((CAST(h.sh AS DOUBLE) / h.n)
      |      / (CAST(t.st AS DOUBLE) / t.nt) * 1000000 + 0.5) / 1000000
      |  END AS seasonal_index
      |FROM h JOIN t ON h.event_type IS NOT DISTINCT FROM t.event_type"""
      .stripMargin

  /** Composed session statistics per (user, week of session start):
    * session counts, mean duration in seconds, mean events per session
    * — q93's sessionization rolled into a weekly tier, floor-snapped
    * means over exact sums. */
  def qSessionStats(spark: SparkSession, dir: String): DataFrame = {
    val sessions = EventOps.sessionize(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("user_id").as("key"), tsUs.as("t"),
          col("value").as("v")),
      gap = 12L * 3600 * 1000000,
      bucketBy = None)
    sessions
      .withColumn("week", floor(col("t_start") / WEEK).cast("long"))
      .groupBy(col("key"), col("week"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("events"),
        sum(col("t_end") - col("t_start")).as("_durUs"))
      .select(col("key").as("user_id"), col("week"), col("n_sessions"),
        col("events"),
        (floor(col("_durUs").cast("double") / col("n_sessions") / 1.0e6
          * 1e6 + 0.5) / 1e6).as("mean_dur_s"),
        (floor(col("events").cast("double") / col("n_sessions") * 1e6
          + 0.5) / 1e6).as("mean_events"))
  }

  val sqlSessionStats: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS t, value AS v FROM events),
      |f AS (
      |  SELECT user_id, t, v,
      |    CASE WHEN lag(t) OVER w IS NULL
      |              OR t - lag(t) OVER w > 43200000000 THEN 1 ELSE 0 END AS flag
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, v)),
      |s AS (
      |  SELECT user_id, t,
      |    CAST(sum(flag) OVER (PARTITION BY user_id ORDER BY t, v
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
      |  FROM f),
      |g AS (SELECT user_id, session_idx, min(t) AS t_start,
      |        max(t) AS t_end, count(*) AS n_events
      |      FROM s GROUP BY 1, 2),
      |a AS (SELECT user_id, t_start // 604800000000 AS week,
      |        count(*) AS n_sessions, CAST(sum(n_events) AS BIGINT) AS events,
      |        sum(t_end - t_start) AS dur
      |      FROM g GROUP BY 1, 2)
      |SELECT user_id, week, n_sessions, events,
      |  floor(CAST(dur AS DOUBLE) / n_sessions / 1.0e6 * 1000000 + 0.5)
      |    / 1000000 AS mean_dur_s,
      |  floor(CAST(events AS DOUBLE) / n_sessions * 1000000 + 0.5)
      |    / 1000000 AS mean_events
      |FROM a""".stripMargin

  /** Maximum drawdown per user: deepest drop from a running value peak,
    * with the peak/trough times (earliest-tie convention on both). */
  def qDrawdown(spark: SparkSession, dir: String): DataFrame =
    EventOps.maxDrawdown(
      spark.read.parquet(s"$dir/events.parquet")
        .groupBy(col("user_id").as("key"), tsUs.as("t"))
        .agg(max("value").as("v")))
      .select(col("key").as("user_id"), col("n"), col("max_dd"),
        col("peak_t"), col("trough_t"))

  val sqlDrawdown: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS t, max(value) AS v
      |           FROM events GROUP BY 1, 2),
      |q AS (SELECT user_id, t,
      |        CAST(floor(v * 1000 + 0.5) AS BIGINT) AS x
      |      FROM e WHERE v IS NOT NULL),
      |r AS (SELECT user_id, t, x,
      |        max(x) OVER w AS px,
      |        max(x) OVER w - x AS dd
      |      FROM q
      |      WINDOW w AS (PARTITION BY user_id ORDER BY t
      |        ROWS UNBOUNDED PRECEDING)),
      |m AS (SELECT user_id, count(*) AS n, max(dd) AS mdd FROM r GROUP BY 1),
      |tr AS (SELECT r.user_id, m.n, m.mdd, min(r.t) AS trough_t,
      |         arg_min(r.px, r.t) AS ppx
      |       FROM r JOIN m ON r.user_id = m.user_id AND r.dd = m.mdd
      |       GROUP BY 1, 2, 3),
      |pk AS (SELECT tr.user_id, tr.n, tr.mdd, tr.trough_t,
      |         min(r.t) AS peak_t
      |       FROM tr JOIN r ON r.user_id = tr.user_id
      |         AND r.t <= tr.trough_t AND r.x = tr.ppx
      |       GROUP BY 1, 2, 3, 4)
      |SELECT user_id, n, round(mdd / 1000.0, 6) AS max_dd, peak_t,
      |  trough_t
      |FROM pk""".stripMargin

  /** Gini concentration of event volume across users within each event
    * type — the hot-domain concentration screen. */
  def qGini(spark: SparkSession, dir: String): DataFrame =
    graft.stats.StatsOps.gini(
      spark.read.parquet(s"$dir/events.parquet")
        .filter(col("event_type").isNotNull && col("user_id").isNotNull)
        .groupBy(col("event_type").as("key"), col("user_id"))
        .agg(count(lit(1)).as("_n")),
      col("_n"))
      .select(col("key").as("event_type"), col("n_units"), col("total"),
        col("gini"))

  val sqlGini: String =
    """WITH c AS (SELECT event_type, user_id, count(*) AS x
      |           FROM events
      |           WHERE event_type IS NOT NULL AND user_id IS NOT NULL
      |           GROUP BY 1, 2),
      |r AS (SELECT event_type, x,
      |        row_number() OVER (PARTITION BY event_type ORDER BY x)
      |          AS i
      |      FROM c)
      |SELECT event_type, count(*) AS n_units, CAST(sum(x) AS BIGINT) AS total,
      |  CASE WHEN sum(x) > 0 THEN
      |    round((2 * sum(i * x) - (count(*) + 1) * sum(x))
      |      / CAST(count(*) * sum(x) AS DOUBLE), 6)
      |  END AS gini
      |FROM r GROUP BY 1""".stripMargin

  /** Benford leading-digit screen of event values per type: per-digit
    * counts/shares plus the χ² statistic vs the Benford expectation. */
  def qBenford(spark: SparkSession, dir: String): DataFrame =
    graft.stats.StatsOps.benford(
      spark.read.parquet(s"$dir/events.parquet")
        .filter(col("event_type").isNotNull && col("value").isNotNull)
        .select(col("event_type").as("key"),
          floor(col("value") * 1000 + 0.5).cast("long").as("_xq")),
      col("_xq"))
      .select(col("key").as("event_type"), col("digit"), col("n"),
        col("share"), col("exp_p"), col("chi2"))

  val sqlBenford: String =
    """WITH p AS (SELECT event_type,
      |             CAST(floor(value * 1000 + 0.5) AS BIGINT) AS x
      |           FROM events
      |           WHERE event_type IS NOT NULL AND value IS NOT NULL),
      |d AS (SELECT event_type,
      |        CAST(substring(CAST(x AS VARCHAR), 1, 1) AS INT) AS digit
      |      FROM p WHERE x > 0),
      |c AS (SELECT event_type, digit, count(*) AS n FROM d GROUP BY 1, 2),
      |t AS (SELECT event_type, sum(n) AS tot FROM c GROUP BY 1),
      |bp AS (SELECT unnest([1,2,3,4,5,6,7,8,9]) AS digit,
      |         unnest([0.301029995663981, 0.176091259055681,
      |                 0.124938736608300, 0.096910013008056,
      |                 0.079181246047625, 0.066946789630613,
      |                 0.057991946977687, 0.051152522447381,
      |                 0.045757490560675]) AS exp_p),
      |g AS (SELECT t.event_type, bp.digit, coalesce(c.n, 0) AS n, t.tot,
      |        bp.exp_p, CAST(t.tot AS DOUBLE) * bp.exp_p AS e
      |      FROM t CROSS JOIN bp
      |      LEFT JOIN c ON c.event_type = t.event_type
      |        AND c.digit = bp.digit),
      |u AS (SELECT *, CAST(floor((CAST(n AS DOUBLE) - e)
      |        * (CAST(n AS DOUBLE) - e) / e * 1e6 + 0.5) AS BIGINT)
      |        AS term FROM g),
      |x AS (SELECT event_type, sum(term) AS chi_u FROM u GROUP BY 1)
      |SELECT u.event_type, u.digit, u.n,
      |  round(u.n / CAST(u.tot AS DOUBLE), 6) AS share, u.exp_p,
      |  x.chi_u / 1e6 AS chi2
      |FROM u JOIN x ON u.event_type = x.event_type""".stripMargin

  /** Kaplan-Meier survival of inter-event waiting times (day ticks) per
    * event type, right-censoring each user's still-open wait at the
    * corpus horizon; the survival product is a left fold, so the oracle
    * replays it bit-exactly with a recursive CTE. */
  def qKaplanMeier(spark: SparkSession, dir: String): DataFrame =
    EventOps.kaplanMeier(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_type").as("key"), col("user_id").as("actor"),
          tsUs.as("t")),
      unitUs = DAY)
      .select(col("key").as("event_type"), col("d"), col("n_risk"),
        col("n_event"), col("survival"))

  val sqlKaplanMeier: String =
    """WITH RECURSIVE
      |e AS (SELECT DISTINCT event_type, user_id, epoch_us(ts) AS t
      |      FROM events),
      |hz AS (SELECT max(epoch_us(ts)) AS h FROM events),
      |g AS (SELECT event_type,
      |        t - lag(t) OVER (PARTITION BY event_type, user_id
      |          ORDER BY t) AS gap
      |      FROM e),
      |obs AS (
      |  SELECT event_type, gap // 86400000000 AS d, 1 AS ev
      |  FROM g WHERE gap IS NOT NULL
      |  UNION ALL
      |  SELECT l.event_type, (hz.h - l.last_t) // 86400000000 AS d, 0 AS ev
      |  FROM (SELECT event_type, user_id, max(t) AS last_t
      |        FROM e GROUP BY 1, 2) l, hz),
      |byd AS (SELECT event_type, d, count(*) AS c,
      |          count(*) FILTER (WHERE ev = 1) AS ne
      |        FROM obs GROUP BY 1, 2),
      |st0 AS (SELECT event_type, d, ne,
      |          sum(c) OVER (PARTITION BY event_type)
      |            - coalesce(sum(c) OVER (PARTITION BY event_type
      |                ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
      |                AND 1 PRECEDING), 0) AS nr
      |        FROM byd),
      |st AS (SELECT event_type, d, nr, ne,
      |         CAST(nr - ne AS DOUBLE) / CAST(nr AS DOUBLE) AS f,
      |         row_number() OVER (PARTITION BY event_type ORDER BY d) AS i
      |       FROM st0 WHERE ne > 0),
      |km AS (
      |  SELECT event_type, d, nr, ne, i, f AS s FROM st WHERE i = 1
      |  UNION ALL
      |  SELECT st.event_type, st.d, st.nr, st.ne, st.i, km.s * st.f
      |  FROM st JOIN km ON st.event_type = km.event_type
      |    AND st.i = km.i + 1)
      |SELECT event_type, d, CAST(nr AS BIGINT) AS n_risk,
      |  CAST(ne AS BIGINT) AS n_event, round(s, 6) AS survival
      |FROM km""".stripMargin

  /** Trailing 7-day distinct actives per (event_type, day) from MERGED
    * daily KMV sketches (k = 32) — the mergeable-sketch scale path for
    * the exact q145 tier: the window union re-mins daily sketches, and
    * the oracle rebuilds each window straight from raw rows, proving
    * the union lossless. */
  def qRollingKmv(spark: SparkSession, dir: String): DataFrame = {
    val k = 32
    val e = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_type"), tsUs.as("t"), col("user_id"))
      .withColumn("day", floor(col("t") / DAY).cast("long"))
    val daily = graft.sketch.Kmv.sketch(e, Seq("event_type", "day"),
      "user_id", k)
    val present = daily.select(col("event_type"), col("day"))
    val expanded = daily
      .select(col("event_type"),
        explode(sequence(col("day"), col("day") + 6)).as("_d2"),
        col("kmv"))
      .select(col("event_type"), col("_d2").as("day"), col("kmv"))
    graft.sketch.Kmv.merge(expanded, Seq("event_type", "day"), k)
      .join(present, Seq("event_type", "day"), "left_semi")
      .select(col("event_type"), col("day"),
        size(col("kmv")).as("sketch_n"),
        graft.sketch.Kmv.estimate(col("kmv"), k).as("est_active"))
  }

  val sqlRollingKmv: String =
    """WITH e AS (
      |  SELECT DISTINCT event_type, epoch_us(ts) // 86400000000 AS day,
      |    ('0x' || substr(md5('kmv' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
      |      AS h
      |  FROM events),
      |p AS (SELECT DISTINCT event_type, day FROM e),
      |x AS (SELECT DISTINCT e.event_type, e.day + g.i AS day, e.h
      |      FROM e CROSS JOIN (SELECT unnest(range(7)) AS i) g),
      |r AS (SELECT x.event_type, x.day, x.h,
      |        row_number() OVER (PARTITION BY x.event_type, x.day
      |          ORDER BY x.h) AS rn
      |      FROM x SEMI JOIN p ON x.event_type = p.event_type
      |        AND x.day = p.day),
      |g2 AS (SELECT event_type, day, count(*) AS sn, max(h) AS hk
      |       FROM r WHERE rn <= 32 GROUP BY 1, 2)
      |SELECT event_type, day, CAST(sn AS INT) AS sketch_n,
      |  CASE WHEN sn < 32 THEN CAST(sn AS DOUBLE)
      |       ELSE round(31.0 * CAST(1152921504606846976 AS DOUBLE) / hk, 6)
      |  END AS est_active
      |FROM g2""".stripMargin

  /** Saturating credit ledger per user: each event deposits
    * (value − 50) credit units against a 500-unit capacity with a hard
    * floor at 0 — the two-barrier Lindley scan, distributed via the
    * clamp-affine monoid; exact integer arithmetic end to end. */
  def qSaturating(spark: SparkSession, dir: String): DataFrame =
    EventOps.saturatingSum(
      spark.read.parquet(s"$dir/events.parquet")
        .filter(col("value").isNotNull)
        .groupBy(col("user_id").as("key"), tsUs.as("t"))
        .agg(sum(floor(col("value") * 1000 + 0.5).cast("long") - 50000L)
          .as("a")),
      cap = 500000L, bucketMicros = WEEK)
      .select(col("key").as("user_id"), col("t"),
        (col("a") / 1000.0).as("delta"),
        (col("level") / 1000.0).as("credit"), col("clipped"))

  val sqlSaturating: String =
    """WITH RECURSIVE
      |e AS (SELECT user_id, epoch_us(ts) AS t,
      |        CAST(floor(value * 1000 + 0.5) AS BIGINT) - 50000 AS a0
      |      FROM events WHERE value IS NOT NULL),
      |g AS (SELECT user_id, t, CAST(sum(a0) AS BIGINT) AS a
      |      FROM e GROUP BY 1, 2),
      |s AS (SELECT user_id, t, a,
      |        row_number() OVER (PARTITION BY user_id ORDER BY t) AS i
      |      FROM g),
      |rec AS (
      |  SELECT user_id, t, a, i,
      |    least(500000, greatest(0, a)) AS level,
      |    CASE WHEN a > least(500000, greatest(0, a)) THEN 1
      |         WHEN a < least(500000, greatest(0, a)) THEN -1
      |         ELSE 0 END AS clipped
      |  FROM s WHERE i = 1
      |  UNION ALL
      |  SELECT s.user_id, s.t, s.a, s.i,
      |    least(500000, greatest(0, rec.level + s.a)),
      |    CASE WHEN rec.level + s.a
      |           > least(500000, greatest(0, rec.level + s.a)) THEN 1
      |         WHEN rec.level + s.a
      |           < least(500000, greatest(0, rec.level + s.a)) THEN -1
      |         ELSE 0 END
      |  FROM s JOIN rec ON s.user_id = rec.user_id AND s.i = rec.i + 1)
      |SELECT user_id, t, a / 1000.0 AS delta, level / 1000.0 AS credit,
      |  clipped
      |FROM rec""".stripMargin

  /** Duration-weighted Pearson correlation of the click and view series
    * on their as-of-merged segment grid (skew-safe constant-key merge,
    * the q19 alignment) — 1e-2 value grid, whole-second weights, exact
    * long moments. */
  def qTwPearson(spark: SparkSession, dir: String): DataFrame = {
    val pts = points(spark, dir)
    val a = pts.filter(col("key") === "click")
      .withColumn("key", constKey("pair", col("key")))
    val b = pts.filter(col("key") === "view")
      .withColumn("key", constKey("pair", col("key")))
    graft.events.Correlation.twPearson(a, b, dayBucket)
      .select(col("key"), col("n_segments"), col("w_secs"), col("r"))
  }

  val sqlTwPearson: String =
    """WITH pts AS (
      |  SELECT event_type AS key, epoch_us(ts) AS t, max(value) AS v
      |  FROM events WHERE event_type IN ('click', 'view') GROUP BY 1, 2),
      |u AS (
      |  SELECT t, CASE WHEN key = 'click' THEN v END AS va,
      |         CASE WHEN key = 'view' THEN v END AS vb,
      |         CASE WHEN key = 'click' THEN 0 ELSE 1 END AS side
      |  FROM pts),
      |f AS (SELECT t, side,
      |        last_value(va IGNORE NULLS) OVER (ORDER BY t, side
      |          ROWS UNBOUNDED PRECEDING) AS la,
      |        last_value(vb IGNORE NULLS) OVER (ORDER BY t, side
      |          ROWS UNBOUNDED PRECEDING) AS lb,
      |        row_number() OVER (PARTITION BY t ORDER BY side DESC) AS rn
      |      FROM u),
      |al AS (SELECT t, la, lb, lead(t) OVER (ORDER BY t) AS nt
      |       FROM f WHERE rn = 1),
      |q AS (SELECT CAST(floor(la * 100 + 0.5) AS BIGINT) AS xa,
      |        CAST(floor(lb * 100 + 0.5) AS BIGINT) AS xb,
      |        (nt - t) // 1000000 AS ws
      |      FROM al
      |      WHERE nt IS NOT NULL AND la IS NOT NULL AND lb IS NOT NULL),
      |s AS (SELECT count(*) AS n_segments, sum(ws) AS w,
      |        sum(ws * xa) AS sx, sum(ws * xb) AS sy,
      |        sum(ws * xa * xa) AS sxx, sum(ws * xb * xb) AS syy,
      |        sum(ws * xa * xb) AS sxy
      |      FROM q)
      |SELECT 'pair' AS key, n_segments, CAST(w AS BIGINT) AS w_secs,
      |  CASE WHEN w > 0
      |    AND CAST(w AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
      |    AND CAST(w AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy > 0
      |  THEN round((CAST(w AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
      |    / sqrt((CAST(w AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
      |         * (CAST(w AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
      |  END AS r
      |FROM s""".stripMargin

  /** Duration-weighted SPEARMAN of the click/view pair on the same
    * as-of-merged grid as q155: per-second midranks in exact half-unit
    * longs, decimal(38)/HUGEINT moments, one final IEEE ratio. */
  def qTwSpearman(spark: SparkSession, dir: String): DataFrame = {
    val pts = points(spark, dir)
    val a = pts.filter(col("key") === "click")
      .withColumn("key", constKey("pair", col("key")))
    val b = pts.filter(col("key") === "view")
      .withColumn("key", constKey("pair", col("key")))
    graft.events.Correlation.twSpearman(a, b, dayBucket)
      .select(col("key"), col("n_segments"), col("w_secs"), col("rho"))
  }

  val sqlTwSpearman: String =
    """WITH pts AS (
      |  SELECT event_type AS key, epoch_us(ts) AS t, max(value) AS v
      |  FROM events WHERE event_type IN ('click', 'view') GROUP BY 1, 2),
      |u AS (
      |  SELECT t, CASE WHEN key = 'click' THEN v END AS va,
      |         CASE WHEN key = 'view' THEN v END AS vb,
      |         CASE WHEN key = 'click' THEN 0 ELSE 1 END AS side
      |  FROM pts),
      |f AS (SELECT t, side,
      |        last_value(va IGNORE NULLS) OVER (ORDER BY t, side
      |          ROWS UNBOUNDED PRECEDING) AS la,
      |        last_value(vb IGNORE NULLS) OVER (ORDER BY t, side
      |          ROWS UNBOUNDED PRECEDING) AS lb,
      |        row_number() OVER (PARTITION BY t ORDER BY side DESC) AS rn
      |      FROM u),
      |al AS (SELECT t, la, lb, lead(t) OVER (ORDER BY t) AS nt
      |       FROM f WHERE rn = 1),
      |q AS (SELECT CAST(floor(la * 100 + 0.5) AS BIGINT) AS xa,
      |        CAST(floor(lb * 100 + 0.5) AS BIGINT) AS xb,
      |        (nt - t) // 1000000 AS ws
      |      FROM al
      |      WHERE nt IS NOT NULL AND la IS NOT NULL AND lb IS NOT NULL),
      |wa AS (SELECT xa, sum(ws) AS w FROM q GROUP BY 1),
      |ra AS (SELECT xa,
      |         2 * (sum(w) OVER (ORDER BY xa ROWS UNBOUNDED PRECEDING)
      |              - w) + w + 1 AS r
      |       FROM wa),
      |wb AS (SELECT xb, sum(ws) AS w FROM q GROUP BY 1),
      |rb AS (SELECT xb,
      |         2 * (sum(w) OVER (ORDER BY xb ROWS UNBOUNDED PRECEDING)
      |              - w) + w + 1 AS r
      |       FROM wb),
      |j AS (SELECT CAST(q.ws AS HUGEINT) AS ws,
      |        CAST(ra.r AS HUGEINT) AS da, CAST(rb.r AS HUGEINT) AS db
      |      FROM q JOIN ra ON q.xa = ra.xa JOIN rb ON q.xb = rb.xb),
      |s AS (SELECT count(*) AS n_segments, sum(ws) AS w,
      |        sum(ws * da) AS sx, sum(ws * db) AS sy,
      |        sum(ws * da * da) AS sxx, sum(ws * db * db) AS syy,
      |        sum(ws * da * db) AS sxy
      |      FROM j)
      |SELECT 'pair' AS key, n_segments, CAST(w AS BIGINT) AS w_secs,
      |  CASE WHEN w > 0 AND w * sxx - sx * sx > 0
      |    AND w * syy - sy * sy > 0
      |  THEN round(CAST(w * sxy - sx * sy AS DOUBLE)
      |    / sqrt(CAST(w * sxx - sx * sx AS DOUBLE)
      |         * CAST(w * syy - sy * sy AS DOUBLE)), 6)
      |  END AS rho
      |FROM s""".stripMargin

  /** Daily modal value per event type: most frequent 1e-3-grid value,
    * smallest-value tie-break, with its share of the day. */
  def qModeTier(spark: SparkSession, dir: String): DataFrame =
    Rollup.modeTier(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_type").as("key"), tsUs.as("t"),
          col("value").as("v")),
      bucketUs = DAY)
      .select(col("key").as("event_type"), col("bucket").as("day"),
        col("mode_v"), col("n_mode"), col("n_total"), col("n_distinct"),
        col("share"))

  val sqlModeTier: String =
    """WITH e AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |             CAST(floor(value * 1000 + 0.5) AS BIGINT) AS xq
      |           FROM events WHERE value IS NOT NULL),
      |c AS (SELECT event_type, day, xq, count(*) AS c
      |      FROM e GROUP BY 1, 2, 3),
      |r AS (SELECT event_type, day, xq, c,
      |        sum(c) OVER (PARTITION BY event_type, day) AS n_total,
      |        count(*) OVER (PARTITION BY event_type, day) AS n_distinct,
      |        row_number() OVER (PARTITION BY event_type, day
      |          ORDER BY c DESC, xq ASC) AS rn
      |      FROM c)
      |SELECT event_type, day, xq / 1000.0 AS mode_v, c AS n_mode,
      |  CAST(n_total AS BIGINT) AS n_total, n_distinct,
      |  round(c / CAST(n_total AS DOUBLE), 6) AS share
      |FROM r WHERE rn = 1""".stripMargin

  /** Gini–Simpson diversity of the duration-weighted coarse-state
    * distribution per event type (q05's histogram fed to Simpson 1949):
    * how many states each series effectively lives in. */
  def qSimpson(spark: SparkSession, dir: String): DataFrame = {
    val pts = points(spark, dir)
    val (tmin, tmax) = eventBounds(spark, dir)
    val segs = SeriesOps.segmentsInRange(pts, lit(tmin), lit(tmax), nullD)
    AggOps.simpsonDiversity(
      AggOps.distribution(
        segs.withColumn("v", floor(col("v") / 50).cast("double")),
        normalized = false))
      .select(col("key").as("event_type"), col("n_states"), col("w_secs"),
        col("simpson"), col("effective_states"))
  }

  val sqlSimpson: String =
    sqlPrefix() +
      """, d AS (
        | SELECT key, CAST(floor(v / 50) AS DOUBLE) AS state,
        |   CAST(sum(t1 - t0) AS BIGINT) AS weight_us
        | FROM segs WHERE t1 > t0 AND v IS NOT NULL GROUP BY 1, 2),
        |a AS (SELECT key, count(*) AS n_states,
        |        sum(weight_us // 1000000) AS w,
        |        sum((weight_us // 1000000) * (weight_us // 1000000)) AS sq
        |      FROM d GROUP BY 1)
        |SELECT key AS event_type, n_states, CAST(w AS BIGINT) AS w_secs,
        |  CASE WHEN w > 0 THEN
        |    round(1.0 - sq / (CAST(w AS DOUBLE) * w), 6) END AS simpson,
        |  CASE WHEN sq > 0 THEN
        |    round(CAST(w AS DOUBLE) * w / sq, 6) END AS effective_states
        |FROM a""".stripMargin

  /** Trailing 6-hour maximum per event-type series on the O(n)
    * two-block plan; the oracle is the naive RANGE window — agreement
    * proves the decomposition. */
  def qSlidingMax(spark: SparkSession, dir: String): DataFrame =
    EventOps.slidingMax(points(spark, dir), windowUs = 6 * HOUR)
      .select(col("key").as("event_type"), col("t"), col("v"),
        col("win_max"))

  val sqlSlidingMax: String =
    """WITH pts AS (
      |  SELECT event_type, epoch_us(ts) AS t, max(value) AS v
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, t, v,
      |  max(CAST(floor(v * 1000 + 0.5) AS BIGINT)) OVER (
      |    PARTITION BY event_type ORDER BY t
      |    RANGE BETWEEN 21599999999 PRECEDING AND CURRENT ROW) / 1000.0
      |    AS win_max
      |FROM pts""".stripMargin

  /** Event-type co-occurrence lift within 12h user sessions: how much
    * more often two types share a session than independence predicts —
    * integer counts end to end, one division. */
  def qSessionLift(spark: SparkSession, dir: String): DataFrame = {
    // one groupBy replaces distinct + self-join + two rescans: each
    // session collapses to its sorted distinct type set, so the session
    // count, the per-type counts, and the a<b pair counts all derive
    // from ONE exchange via HOF explosions (type sets are tiny — the
    // pair expansion is |set|², never |rows|²)
    val sess = EventOps.sessionAssign(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("user_id").as("key"), tsUs.as("t"),
          col("value").as("v"), col("event_type")),
      gap = 12L * HOUR, bucketBy = None)
      .groupBy(col("key"), col("session_idx"))
      .agg(sort_array(collect_set(col("event_type"))).as("_types"))
    val nTotal = sess.agg(count(lit(1)).as("_n"))
    val singles = sess.select(explode(col("_types")).as("event_type"))
      .groupBy(col("event_type")).agg(count(lit(1)).as("_na"))
    val pairs = sess
      .select(explode(expr(
        """flatten(transform(_types, (a, i) ->
             transform(slice(_types, i + 2, size(_types)), b ->
               struct(a AS type_a, b AS type_b))))""")).as("_p"))
      .groupBy(col("_p")("type_a").as("type_a"),
        col("_p")("type_b").as("type_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(singles.select(col("event_type").as("type_a"),
        col("_na").as("n_a"))), Seq("type_a"))
      .join(broadcast(singles.select(col("event_type").as("type_b"),
        col("_na").as("n_b"))), Seq("type_b"))
      .crossJoin(broadcast(nTotal))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("n_ab"),
        round((col("_n") * col("n_ab")) /
          (col("n_a") * col("n_b")).cast("double"), 6).as("lift"))
  }

  val sqlSessionLift: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS t, value AS v,
      |             event_type
      |           FROM events),
      |f AS (
      |  SELECT user_id, t, v, event_type,
      |    CASE WHEN lag(t) OVER w IS NULL
      |              OR t - lag(t) OVER w > 43200000000 THEN 1 ELSE 0 END
      |      AS flag
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, v)),
      |s AS (
      |  SELECT DISTINCT user_id,
      |    CAST(sum(flag) OVER (PARTITION BY user_id ORDER BY t, v
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess, event_type
      |  FROM f),
      |n AS (SELECT count(*) AS n_total
      |      FROM (SELECT DISTINCT user_id, sess FROM s)),
      |g AS (SELECT event_type, count(*) AS na FROM s GROUP BY 1),
      |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
      |        count(*) AS n_ab
      |      FROM s a JOIN s b ON a.user_id = b.user_id
      |        AND a.sess = b.sess AND a.event_type < b.event_type
      |      GROUP BY 1, 2)
      |SELECT p.type_b, p.type_a, ga.na AS n_a, gb.na AS n_b, p.n_ab,
      |  round((n.n_total * p.n_ab) / CAST(ga.na * gb.na AS DOUBLE), 6)
      |    AS lift
      |FROM p JOIN g ga ON p.type_a = ga.event_type
      |JOIN g gb ON p.type_b = gb.event_type
      |CROSS JOIN n""".stripMargin

  /** Fleet-relative hourly normalization per user: the user's hourly
    * mean against the cross-user median of hourly means that hour —
    * exact integer means (1e-3 grid, floor division), exact two-middle
    * median, one final ratio. */
  def qFleetNorm(spark: SparkSession, dir: String): DataFrame = {
    val hourly = spark.read.parquet(s"$dir/events.parquet")
      .filter(col("value").isNotNull)
      .groupBy(col("user_id"), floor(tsUs / HOUR).cast("long").as("hour"))
      .agg(sum(floor(col("value") * 1000 + 0.5).cast("long")).as("_sx"),
        count(lit(1)).as("_c"))
      .select(col("user_id"), col("hour"), expr("_sx div _c").as("_m"))
    val w = Window.partitionBy(col("hour"))
      .orderBy(col("_m").asc, col("user_id").asc)
    val ranked = hourly
      .withColumn("_rn", row_number().over(w))
      .withColumn("_cnt", count(lit(1)).over(Window.partitionBy(col("hour"))))
    val medians = ranked
      .groupBy(col("hour").as("_h"))
      .agg(max(col("_cnt")).as("n_users"),
        max(when(col("_rn") === expr("(_cnt + 1) div 2"), col("_m")))
          .as("_lo"),
        max(when(col("_rn") === expr("_cnt div 2 + 1"), col("_m")))
          .as("_hi"))
    hourly
      .join(medians, col("hour") === col("_h"))
      .select(col("user_id"), col("hour"),
        (col("_m") / 1000.0).as("user_mean"),
        ((col("_lo") + col("_hi")) / 2000.0).as("fleet_median"),
        col("n_users"),
        when(col("_lo") + col("_hi") > 0,
          round((lit(2) * col("_m")).cast("double") /
            (col("_lo") + col("_hi")), 6)).as("rel"))
  }

  val sqlFleetNorm: String =
    """WITH h AS (
      |  SELECT user_id, epoch_us(ts) // 3600000000 AS hour,
      |    sum(CAST(floor(value * 1000 + 0.5) AS BIGINT))
      |      // count(*) AS m
      |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
      |r AS (SELECT user_id, hour, m,
      |        row_number() OVER (PARTITION BY hour ORDER BY m, user_id)
      |          AS rn,
      |        count(*) OVER (PARTITION BY hour) AS cnt
      |      FROM h),
      |md AS (SELECT hour, max(cnt) AS n_users,
      |         max(CASE WHEN rn = (cnt + 1) // 2 THEN m END) AS lo,
      |         max(CASE WHEN rn = cnt // 2 + 1 THEN m END) AS hi
      |       FROM r GROUP BY 1)
      |SELECT h.user_id, h.hour, h.m / 1000.0 AS user_mean,
      |  (md.lo + md.hi) / 2000.0 AS fleet_median,
      |  CAST(md.n_users AS BIGINT) AS n_users,
      |  CASE WHEN md.lo + md.hi > 0 THEN
      |    round(CAST(2 * h.m AS DOUBLE) / (md.lo + md.hi), 6) END AS rel
      |FROM h JOIN md ON h.hour = md.hour""".stripMargin

  /** Alert-flapping suppression at the 150.0 threshold: every state
    * crossing with its trailing-6h crossing count on the O(n) as-of-
    * prefix plan; the oracle is the naive RANGE count — agreement
    * proves the prefix-difference identity. */
  def qFlapSuppress(spark: SparkSession, dir: String): DataFrame =
    EventOps.flapSuppress(points(spark, dir), lit(150.0),
      windowUs = 6 * HOUR, maxFlips = 4)

  val sqlFlapSuppress: String =
    """WITH pts AS (
      |  SELECT event_type AS key, epoch_us(ts) AS t, max(value) AS v
      |  FROM events GROUP BY 1, 2),
      |s AS (SELECT key, t, CAST(v >= 150.0 AS INT) AS st,
      |        lag(CAST(v >= 150.0 AS INT))
      |          OVER (PARTITION BY key ORDER BY t) AS pst
      |      FROM pts),
      |c AS (SELECT key, t, st FROM s WHERE pst IS NOT NULL AND st <> pst)
      |SELECT key, t, CAST(st AS BIGINT) AS state,
      |  count(*) OVER w AS n_cross,
      |  CAST(count(*) OVER w > 4 AS BIGINT) AS suppressed
      |FROM c WINDOW w AS (PARTITION BY key ORDER BY t
      |  RANGE BETWEEN 21599999999 PRECEDING AND CURRENT ROW)""".stripMargin

  /** Histogram-rarity anomaly score: each point's self-information in
    * bits against its key's own 25-wide value-bin histogram — exact
    * integer counts, one final log₂. */
  def qRarity(spark: SparkSession, dir: String): DataFrame =
    graft.stats.StatsOps.rarity(points(spark, dir), floor(col("v") / 25))

  val sqlRarity: String =
    """WITH pts AS (
      |  SELECT event_type AS key, epoch_us(ts) AS t, max(value) AS v
      |  FROM events GROUP BY 1, 2),
      |bn AS (SELECT key, t, v, CAST(floor(v / 25) AS BIGINT) AS bin
      |       FROM pts),
      |c AS (SELECT key, bin, count(*) AS n_bin FROM bn GROUP BY 1, 2),
      |tt AS (SELECT key, count(*) AS n_key FROM bn GROUP BY 1)
      |SELECT bn.key, bn.t, bn.v, bn.bin, c.n_bin, tt.n_key,
      |  round(-log2(c.n_bin / CAST(tt.n_key AS DOUBLE)), 6) AS surprise
      |FROM bn JOIN c ON bn.key = c.key AND bn.bin = c.bin
      |JOIN tt ON bn.key = tt.key""".stripMargin

  /** Hourly linear sampling with a 4-hour interpolation bound: probes
    * strictly inside a wider bracketing gap answer null instead of
    * drawing a line across the outage. */
  def qBoundedSample(spark: SparkSession, dir: String): DataFrame = {
    val pts = points(spark, dir)
    val (tmin, tmax) = eventBounds(spark, dir)
    Regularize.sampleLinearBounded(
      pts, Regularize.gridSeq(pts, tmin, tmax, HOUR), nullD,
      maxGapUs = 4 * HOUR)
      .withColumn("v", round(col("v"), 6))
  }

  val sqlBoundedSample: String =
    sqlPrefix() +
      s""", grid AS (
         |  SELECT key, gt FROM (SELECT DISTINCT key FROM pts),
         |    unnest(generate_series((SELECT tmin FROM b), (SELECT tmax FROM b), $HOUR)) g(gt))
         |SELECT g.key AS key, g.gt AS t,
         |  round(CASE WHEN p.t IS NULL THEN NULL
         |             WHEN n.t IS NULL THEN p.v
         |             WHEN g.gt <> p.t AND n.t - p.t > ${4 * HOUR} THEN NULL
         |             ELSE p.v + (g.gt - p.t) / (n.t - p.t) * (n.v - p.v) END, 6) AS v
         |FROM grid g
         |ASOF LEFT JOIN pts p ON g.key = p.key AND g.gt >= p.t
         |ASOF LEFT JOIN pts n ON g.key = n.key AND g.gt < n.t""".stripMargin

  /** Hourly gap-fill with the audit trail: exact hit → 4h-bounded
    * linear → hour-of-day seasonal mean → null, each row labeled with
    * the tier that answered. */
  def qImputeSeasonal(spark: SparkSession, dir: String): DataFrame = {
    val pts = points(spark, dir)
    val (tmin, tmax) = eventBounds(spark, dir)
    Regularize.imputeSeasonal(
      pts, Regularize.gridSeq(pts, tmin, tmax, HOUR), maxGapUs = 4 * HOUR)
  }

  val sqlImputeSeasonal: String =
    sqlPrefix() +
      s""", grid AS (
         |  SELECT key, gt FROM (SELECT DISTINCT key FROM pts),
         |    unnest(generate_series((SELECT tmin FROM b), (SELECT tmax FROM b), $HOUR)) g(gt)),
         |lin AS (
         |  SELECT g.key AS key, g.gt AS t, p.t AS pt,
         |    round(CASE WHEN p.t IS NULL THEN NULL
         |               WHEN n.t IS NULL THEN p.v
         |               WHEN g.gt <> p.t AND n.t - p.t > ${4 * HOUR} THEN NULL
         |               ELSE p.v + (g.gt - p.t) / (n.t - p.t) * (n.v - p.v)
         |          END, 6) AS lv
         |  FROM grid g
         |  ASOF LEFT JOIN pts p ON g.key = p.key AND g.gt >= p.t
         |  ASOF LEFT JOIN pts n ON g.key = n.key AND g.gt < n.t),
         |seas AS (
         |  SELECT key, (t % $DAY) // $HOUR AS sbin,
         |    round(sum(CAST(floor(v * 1000 + 0.5) AS BIGINT))
         |            / 1000.0 / count(*), 6) AS sv
         |  FROM pts WHERE v IS NOT NULL GROUP BY 1, 2)
         |SELECT lin.key, lin.t, coalesce(lin.lv, seas.sv) AS v,
         |  CASE WHEN lin.lv IS NOT NULL AND lin.t = lin.pt THEN 'exact'
         |       WHEN lin.lv IS NOT NULL THEN 'linear'
         |       WHEN seas.sv IS NOT NULL THEN 'seasonal' END AS src
         |FROM lin LEFT JOIN seas ON lin.key = seas.key
         |  AND (lin.t % $DAY) // $HOUR = seas.sbin""".stripMargin

  /** Quantile-map every event type's values onto the 'view' series'
    * distribution (exact integer midrank CDF matching; 'view' itself
    * maps to identity). */
  def qQuantileMap(spark: SparkSession, dir: String): DataFrame =
    graft.stats.StatsOps.quantileMap(points(spark, dir), refKey = "view")

  val sqlQuantileMap: String =
    """WITH pts AS (
      |  SELECT event_type AS key, epoch_us(ts) AS t, max(value) AS v
      |  FROM events GROUP BY 1, 2),
      |px AS (SELECT key, t, v,
      |         CAST(floor(v * 1000 + 0.5) AS BIGINT) AS x FROM pts),
      |h AS (SELECT key, x, count(*) AS w FROM px GROUP BY 1, 2),
      |c AS (SELECT key, x, w,
      |        sum(w) OVER (PARTITION BY key ORDER BY x
      |          ROWS UNBOUNDED PRECEDING) AS c
      |      FROM h),
      |n AS (SELECT key, count(*) AS n FROM px GROUP BY 1),
      |r AS (SELECT x AS rx, c AS rc FROM c WHERE key = 'view'),
      |rn AS (SELECT n AS nref FROM n WHERE key = 'view'),
      |sp AS (SELECT c.key, c.x,
      |         -((2 * c.c - c.w + 1) * rn.nref) AS nppos
      |       FROM c JOIN n ON c.key = n.key CROSS JOIN rn),
      |rd AS (SELECT n.key, r.rx, -(2 * r.rc * n.n) AS ndpos
      |       FROM n CROSS JOIN r),
      |m AS (SELECT sp.key, sp.x, rd.rx
      |      FROM sp ASOF JOIN rd
      |        ON sp.key = rd.key AND sp.nppos >= rd.ndpos)
      |SELECT px.key, px.t, px.v, m.rx / 1000.0 AS v_norm
      |FROM px JOIN m ON px.key = m.key AND px.x = m.x""".stripMargin

  /** Single-breakpoint segmented regression per event type: the split
    * minimizing left+right OLS residual sums, evaluated at every
    * candidate from HUGEINT prefix sums (minSeg = 5). */
  def qSegmentedTrend(spark: SparkSession, dir: String): DataFrame =
    graft.events.Correlation.segmentedTrend(points(spark, dir), minSeg = 5)

  private def rssSqlOf(n: String, sx: String, sy: String, sxx: String,
      syy: String, sxy: String): String = {
    val a = s"($n * ($sxx) - ($sx) * ($sx))"
    val b = s"($n * ($sxy) - ($sx) * ($sy))"
    val c = s"($n * ($syy) - ($sy) * ($sy))"
    s"""CASE WHEN $a > 0
       | THEN (CAST($c AS DOUBLE)
       |        - CAST($b AS DOUBLE) * CAST($b AS DOUBLE)
       |          / CAST($a AS DOUBLE)) / CAST($n AS DOUBLE)
       | ELSE CAST($c AS DOUBLE) / CAST($n AS DOUBLE) END""".stripMargin
  }

  val sqlSegmentedTrend: String = {
    val h = "CAST(i AS HUGEINT)"
    val hr = "CAST(n - i AS HUGEINT)"
    val hn = "CAST(n AS HUGEINT)"
    s"""WITH pts AS (
       |  SELECT event_type AS key, epoch_us(ts) AS t, max(value) AS v
       |  FROM events GROUP BY 1, 2),
       |b AS (SELECT key, t,
       |        (t - min(t) OVER (PARTITION BY key)) // 1000000 AS x,
       |        CAST(floor(v * 1000 + 0.5) AS BIGINT) AS y,
       |        row_number() OVER (PARTITION BY key ORDER BY t) AS i,
       |        count(*) OVER (PARTITION BY key) AS n
       |      FROM pts),
       |p AS (SELECT key, t, i, n,
       |        sum(CAST(x AS HUGEINT)) OVER w AS px,
       |        sum(CAST(y AS HUGEINT)) OVER w AS py,
       |        sum(CAST(x AS HUGEINT) * x) OVER w AS pxx,
       |        sum(CAST(y AS HUGEINT) * y) OVER w AS pyy,
       |        sum(CAST(x AS HUGEINT) * y) OVER w AS pxy,
       |        sum(CAST(x AS HUGEINT)) OVER a AS tx,
       |        sum(CAST(y AS HUGEINT)) OVER a AS ty,
       |        sum(CAST(x AS HUGEINT) * x) OVER a AS txx,
       |        sum(CAST(y AS HUGEINT) * y) OVER a AS tyy,
       |        sum(CAST(x AS HUGEINT) * y) OVER a AS txy
       |      FROM b
       |      WINDOW w AS (PARTITION BY key ORDER BY t
       |        ROWS UNBOUNDED PRECEDING), a AS (PARTITION BY key)),
       |s AS (SELECT key, t, n,
       |        ${rssSqlOf(h, "px", "py", "pxx", "pyy", "pxy")} AS rl,
       |        ${rssSqlOf(hr, "tx - px", "ty - py", "txx - pxx",
                  "tyy - pyy", "txy - pxy")} AS rr,
       |        ${rssSqlOf(hn, "tx", "ty", "txx", "tyy", "txy")} AS r0
       |      FROM p WHERE i >= 5 AND n - i >= 5)
       |SELECT key, n, t AS break_t,
       |  CAST(floor(r0) AS BIGINT) AS rss_full,
       |  CAST(floor(rl + rr) AS BIGINT) AS rss_split,
       |  CAST(floor(r0) AS BIGINT) - CAST(floor(rl + rr) AS BIGINT)
       |    AS gain
       |FROM s
       |QUALIFY row_number() OVER (PARTITION BY key
       |  ORDER BY rl + rr, t) = 1""".stripMargin
  }

  /** Winsorize each event type's values at the exact p01/p99 empirical
    * quantiles and robust-scale by median/IQR (type-1 inverse CDF on
    * integer cross-multiplied tests). */
  def qWinsorize(spark: SparkSession, dir: String): DataFrame =
    graft.stats.StatsOps.winsorizeScale(points(spark, dir))

  val sqlWinsorize: String =
    """WITH pts AS (
      |  SELECT event_type AS key, epoch_us(ts) AS t, max(value) AS v
      |  FROM events GROUP BY 1, 2),
      |px AS (SELECT key, t, v,
      |         CAST(floor(v * 1000 + 0.5) AS BIGINT) AS x FROM pts),
      |h AS (SELECT key, x, count(*) AS w FROM px GROUP BY 1, 2),
      |c AS (SELECT key, x,
      |        sum(w) OVER (PARTITION BY key ORDER BY x
      |          ROWS UNBOUNDED PRECEDING) AS c,
      |        sum(w) OVER (PARTITION BY key) AS n
      |      FROM h),
      |thr AS (SELECT key,
      |          min(CASE WHEN c * 100 >= 1 * n THEN x END) AS lo,
      |          min(CASE WHEN c * 100 >= 99 * n THEN x END) AS hi,
      |          min(CASE WHEN c * 2 >= n THEN x END) AS med,
      |          min(CASE WHEN c * 4 >= n THEN x END) AS q1,
      |          min(CASE WHEN c * 4 >= 3 * n THEN x END) AS q3
      |        FROM c GROUP BY 1)
      |SELECT px.key, px.t, px.v,
      |  least(greatest(px.x, thr.lo), thr.hi) / 1000.0 AS v_clip,
      |  CASE WHEN thr.q3 > thr.q1 THEN
      |    round(CAST(least(greatest(px.x, thr.lo), thr.hi) - thr.med
      |            AS DOUBLE) / (thr.q3 - thr.q1), 6) END AS v_robust
      |FROM px JOIN thr ON px.key = thr.key""".stripMargin

  /** Mann–Kendall drift screen per event type over hourly bin means:
    * exact-integer S and tie-corrected variance, continuity-corrected
    * Z, trend called at |Z| > 1.96. */
  def qMannKendall(spark: SparkSession, dir: String): DataFrame =
    graft.events.Correlation.mannKendall(points(spark, dir))

  val sqlMannKendall: String =
    """WITH pts AS (
      |  SELECT event_type AS key, epoch_us(ts) AS t, max(value) AS v
      |  FROM events GROUP BY 1, 2),
      |bm AS (SELECT key, t // 3600000000 AS b,
      |         sum(CAST(floor(v * 1000 + 0.5) AS BIGINT)) // count(*)
      |           AS x
      |       FROM pts GROUP BY 1, 2),
      |st AS (SELECT a.key,
      |         CAST(sum(CAST(sign(bb.x - a.x) AS BIGINT)) AS BIGINT) AS s
      |       FROM bm a JOIN bm bb ON a.key = bb.key AND a.b < bb.b
      |       GROUP BY 1),
      |nt AS (SELECT key, count(*) AS n_bins FROM bm GROUP BY 1),
      |tt AS (SELECT key,
      |         sum(t * (t - 1) * (2 * t + 5)) AS tc,
      |         CAST(sum(CASE WHEN t > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_tied_groups
      |       FROM (SELECT key, x, count(*) AS t FROM bm GROUP BY 1, 2)
      |       GROUP BY 1),
      |j AS (SELECT st.key, nt.n_bins, st.s, tt.n_tied_groups,
      |        nt.n_bins * (nt.n_bins - 1) * (2 * nt.n_bins + 5) - tt.tc
      |          AS vnum
      |      FROM st JOIN nt ON st.key = nt.key
      |      JOIN tt ON st.key = tt.key),
      |z AS (SELECT key, n_bins, s, n_tied_groups,
      |        CASE WHEN n_bins >= 8 AND vnum > 0 THEN
      |          round(CASE WHEN s > 0
      |                  THEN CAST(s - 1 AS DOUBLE)
      |                       / sqrt(CAST(vnum AS DOUBLE) / 18.0)
      |                WHEN s < 0
      |                  THEN CAST(s + 1 AS DOUBLE)
      |                       / sqrt(CAST(vnum AS DOUBLE) / 18.0)
      |                ELSE 0.0 END, 6)
      |        END AS z
      |      FROM j)
      |SELECT key, n_bins, s, n_tied_groups, z,
      |  CASE WHEN z IS NULL THEN NULL
      |       WHEN z > 1.96 THEN 'increasing'
      |       WHEN z < -1.96 THEN 'decreasing'
      |       ELSE 'no_trend' END AS trend
      |FROM z""".stripMargin

  /** Seasonal Mann–Kendall (Hirsch–Slack) per event type: q173's trend
    * screen deseasonalized by hour-of-day — only same-season bin pairs
    * compare, S and Var sum across the 24 seasons; exact integers end
    * to end. */
  def qSeasonalMk(spark: SparkSession, dir: String): DataFrame =
    graft.events.Correlation.seasonalMannKendall(points(spark, dir))

  val sqlSeasonalMk: String =
    """WITH pts AS (
      |  SELECT event_type AS key, epoch_us(ts) AS t, max(value) AS v
      |  FROM events GROUP BY 1, 2),
      |bm AS (SELECT key, t // 3600000000 AS b,
      |         (t // 3600000000) % 24 AS h,
      |         sum(CAST(floor(v * 1000 + 0.5) AS BIGINT)) // count(*)
      |           AS x
      |       FROM pts GROUP BY 1, 2, 3),
      |st AS (SELECT a.key,
      |         CAST(sum(CAST(sign(bb.x - a.x) AS BIGINT)) AS BIGINT) AS s
      |       FROM bm a JOIN bm bb ON a.key = bb.key AND a.h = bb.h
      |         AND a.b < bb.b
      |       GROUP BY 1),
      |ns AS (SELECT key, h, count(*) AS n FROM bm GROUP BY 1, 2),
      |ts_ AS (SELECT key, h, sum(t * (t - 1) * (2 * t + 5)) AS tc
      |        FROM (SELECT key, h, x, count(*) AS t FROM bm GROUP BY 1, 2, 3)
      |        GROUP BY 1, 2),
      |vt AS (SELECT ns.key, CAST(sum(ns.n) AS BIGINT) AS n_bins,
      |         count(*) AS n_seasons,
      |         CAST(sum(ns.n * (ns.n - 1) * (2 * ns.n + 5)
      |                  - coalesce(ts_.tc, 0)) AS BIGINT) AS vnum
      |       FROM ns LEFT JOIN ts_ ON ns.key = ts_.key AND ns.h = ts_.h
      |       GROUP BY 1),
      |z AS (SELECT st.key, vt.n_bins, vt.n_seasons, st.s,
      |        CASE WHEN vt.n_bins >= 24 AND vt.vnum > 0 THEN
      |          round(CASE WHEN st.s > 0
      |                  THEN CAST(st.s - 1 AS DOUBLE)
      |                       / sqrt(CAST(vt.vnum AS DOUBLE) / 18.0)
      |                WHEN st.s < 0
      |                  THEN CAST(st.s + 1 AS DOUBLE)
      |                       / sqrt(CAST(vt.vnum AS DOUBLE) / 18.0)
      |                ELSE 0.0 END, 6)
      |        END AS z
      |      FROM st JOIN vt ON st.key = vt.key)
      |SELECT key, n_bins, n_seasons, s, z,
      |  CASE WHEN z IS NULL THEN NULL
      |       WHEN z > 1.96 THEN 'increasing'
      |       WHEN z < -1.96 THEN 'decreasing'
      |       ELSE 'no_trend' END AS trend
      |FROM z""".stripMargin

  /** Siegel repeated-median slope per event type: the 50%-breakdown
    * robust trend beside q119's Theil–Sen — double-median of pairwise
    * slopes on the 1e-6/hour grid, lower-median rank selection, exact
    * end to end. */
  def qSiegelSlope(spark: SparkSession, dir: String): DataFrame =
    graft.events.Correlation.siegelSlope(points(spark, dir))

  val sqlSiegelSlope: String =
    """WITH pts AS (
      |  SELECT event_type AS key, epoch_us(ts) AS t, max(value) AS v
      |  FROM events GROUP BY 1, 2),
      |bm AS (SELECT key, t // 3600000000 AS b,
      |         sum(CAST(floor(v * 1000 + 0.5) AS BIGINT)) // count(*)
      |           AS x
      |       FROM pts GROUP BY 1, 2),
      |pr AS (SELECT a.key, a.b,
      |         CAST(floor(CAST((bb.x - a.x) * 1000 AS DOUBLE)
      |                    / CAST(bb.b - a.b AS DOUBLE)) AS BIGINT) AS s
      |       FROM bm a JOIN bm bb ON a.key = bb.key AND a.b <> bb.b),
      |im AS (SELECT key, b, s AS med FROM (
      |         SELECT key, b, s,
      |           row_number() OVER (PARTITION BY key, b ORDER BY s) AS rn,
      |           count(*) OVER (PARTITION BY key, b) AS cnt
      |         FROM pr)
      |       WHERE rn = (cnt + 1) // 2)
      |SELECT key, CAST(cnt AS BIGINT) AS n_bins,
      |  round(med / 1000000.0, 6) AS slope_per_hr
      |FROM (
      |  SELECT key, med,
      |    row_number() OVER (PARTITION BY key ORDER BY med, b) AS rn,
      |    count(*) OVER (PARTITION BY key) AS cnt
      |  FROM im)
      |WHERE rn = (cnt + 1) // 2 AND cnt >= 8""".stripMargin

  /** Permutation entropy (order-3 Bandt–Pompe) per event type over the
    * hourly bin-mean sequence: fixed-order six-term entropy on exact
    * pattern counts. */
  def qPermEntropy(spark: SparkSession, dir: String): DataFrame =
    graft.events.Correlation.permutationEntropy(points(spark, dir))

  val sqlPermEntropy: String = {
    def t(c0: Int) =
      s"""CASE WHEN n$c0 > 0 THEN -(CAST(n$c0 AS DOUBLE) / n_triples
         |  * log2(CAST(n$c0 AS DOUBLE) / n_triples)) ELSE 0.0 END"""
        .stripMargin.replace("\n", " ")
    def nC(c0: Int) =
      s"coalesce(sum(CASE WHEN code = $c0 THEN n END), 0) AS n$c0"
    s"""WITH pts AS (
       |  SELECT event_type AS key, epoch_us(ts) AS t, max(value) AS v
       |  FROM events GROUP BY 1, 2),
       |bm AS (SELECT key, t // 3600000000 AS b,
       |         sum(CAST(floor(v * 1000 + 0.5) AS BIGINT)) // count(*)
       |           AS x
       |       FROM pts GROUP BY 1, 2),
       |tri AS (SELECT key, x, lead(x, 1) OVER wb AS y,
       |          lead(x, 2) OVER wb AS z
       |        FROM bm WINDOW wb AS (PARTITION BY key ORDER BY b)),
       |p AS (SELECT key,
       |        9 * (CAST(y < x AS INT) + CAST(z < x AS INT))
       |        + 3 * (CAST(x <= y AS INT) + CAST(z < y AS INT))
       |        + CAST(x <= z AS INT) + CAST(y <= z AS INT) AS code
       |      FROM tri WHERE z IS NOT NULL),
       |c AS (SELECT key, code, count(*) AS n FROM p GROUP BY 1, 2),
       |a AS (SELECT key, CAST(sum(n) AS BIGINT) AS n_triples, count(*) AS n_patterns,
       |        ${nC(5)}, ${nC(7)}, ${nC(11)}, ${nC(15)}, ${nC(19)},
       |        ${nC(21)}
       |      FROM c GROUP BY 1),
       |tc AS (SELECT key, code AS top_code FROM c
       |       QUALIFY row_number() OVER (PARTITION BY key
       |         ORDER BY n DESC, code) = 1)
       |SELECT a.key, a.n_triples, a.n_patterns, tc.top_code,
       |  CASE WHEN a.n_triples >= 10 THEN
       |    round((((((${t(5)} + ${t(7)}) + ${t(11)}) + ${t(15)})
       |      + ${t(19)}) + ${t(21)}) / 2.584962500721156, 6)
       |  END AS h_norm
       |FROM a JOIN tc ON a.key = tc.key""".stripMargin
  }

  /** Haar scale-energy fingerprint per event type: detail energy at
    * 2/4/8/16-hour block scales over the hourly bin totals, exact long
    * squares, one share division. */
  def qHaarEnergy(spark: SparkSession, dir: String): DataFrame =
    graft.events.Correlation.haarEnergy(points(spark, dir))

  val sqlHaarEnergy: String = {
    def lvl(k: Int): String = {
      val b = 1L << k
      s"""SELECT key, CAST($k AS INT) AS level,
         |  max(spn) // $b AS n_blocks, CAST(sum(d * d) AS BIGINT) AS energy
         |FROM (SELECT key, i // $b AS blk,
         |        sum(CASE WHEN i % $b < ${b / 2} THEN s ELSE -s END) AS d,
         |        max(span) AS spn
         |      FROM base WHERE i < (span // $b) * $b GROUP BY 1, 2)
         |GROUP BY 1""".stripMargin
    }
    s"""WITH pts AS (
       |  SELECT event_type AS key, epoch_us(ts) AS t, max(value) AS v
       |  FROM events GROUP BY 1, 2),
       |bm AS (SELECT key, t // 3600000000 AS b,
       |         sum(CAST(floor(v * 1000 + 0.5) AS BIGINT)) AS s
       |       FROM pts GROUP BY 1, 2),
       |base AS (SELECT key, b - min(b) OVER (PARTITION BY key) AS i, s,
       |           max(b) OVER (PARTITION BY key)
       |             - min(b) OVER (PARTITION BY key) + 1 AS span
       |         FROM bm),
       |u AS (${(1 to 4).map(lvl).mkString("\n| UNION ALL\n|")}),
       |tot AS (SELECT key AS tk, sum(energy) AS te FROM u GROUP BY 1)
       |SELECT u.key, u.level, u.n_blocks, u.energy,
       |  CASE WHEN te > 0
       |    THEN round(CAST(u.energy AS DOUBLE) / te, 6) END AS share
       |FROM u JOIN tot ON u.key = tot.tk""".stripMargin
  }

  /** Contemporaneous Pearson matrix across all event-type pairs on the
    * hourly grid (exact integer bin means, lexicographic pair order). */
  def qCorrMatrix(spark: SparkSession, dir: String): DataFrame =
    graft.events.Correlation.corrMatrix(points(spark, dir))

  val sqlCorrMatrix: String =
    """WITH pts AS (
      |  SELECT event_type AS key, epoch_us(ts) AS t, max(value) AS v
      |  FROM events GROUP BY 1, 2),
      |bm AS (SELECT key, t // 3600000000 AS b,
      |         sum(CAST(floor(v * 1000 + 0.5) AS BIGINT)) // count(*)
      |           AS x
      |       FROM pts GROUP BY 1, 2),
      |s AS (SELECT a.key AS key_a, bb.key AS key_b, count(*) AS n_bins,
      |        sum(a.x) AS sx, sum(bb.x) AS sy, sum(a.x * a.x) AS sxx,
      |        sum(bb.x * bb.x) AS syy, sum(a.x * bb.x) AS sxy
      |      FROM bm a JOIN bm bb ON a.b = bb.b AND a.key < bb.key
      |      GROUP BY 1, 2)
      |SELECT key_a, key_b, n_bins,
      |  CASE WHEN n_bins >= 8
      |    AND CAST(n_bins AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
      |    AND CAST(n_bins AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy > 0
      |  THEN round((CAST(n_bins AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
      |    / sqrt((CAST(n_bins AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
      |         * (CAST(n_bins AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
      |  END AS r
      |FROM s""".stripMargin

  /** Dominant activity cycle per user: argmax of the hourly-bin ACF
    * over lags 1..24 with the 1.96/√n white-noise gate. */
  def qDominantPeriod(spark: SparkSession, dir: String): DataFrame =
    graft.events.Correlation.dominantPeriod(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("user_id").as("key"), tsUs.as("t"),
          col("value").as("v")),
      maxLag = 24)

  val sqlDominantPeriod: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) // 3600000000 AS b, value
      |           FROM events WHERE value IS NOT NULL),
      |g AS (SELECT user_id, b,
      |        CAST(floor(avg(value) * 1000 + 0.5) AS BIGINT) AS x
      |      FROM e GROUP BY 1, 2),
      |p AS (SELECT g.user_id, l.lag_h, g.x, h.x AS y
      |      FROM g CROSS JOIN (SELECT CAST(unnest(generate_series(1, 24))
      |        AS INT) AS lag_h) l
      |      JOIN g h ON g.user_id IS NOT DISTINCT FROM h.user_id
      |        AND g.b + l.lag_h = h.b),
      |s AS (SELECT user_id, lag_h, count(*) AS n_pairs,
      |        sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
      |        sum(y * y) AS syy, sum(x * y) AS sxy
      |      FROM p GROUP BY 1, 2),
      |rr AS (SELECT user_id, lag_h, n_pairs,
      |  CASE WHEN n_pairs >= 8
      |    AND CAST(n_pairs AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
      |    AND CAST(n_pairs AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy > 0
      |  THEN round((CAST(n_pairs AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
      |    / sqrt((CAST(n_pairs AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
      |         * (CAST(n_pairs AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
      |  END AS r
      |  FROM s)
      |SELECT user_id AS key, lag_h AS best_lag, n_pairs, r,
      |  CAST(abs(r) * sqrt(CAST(n_pairs AS DOUBLE)) > 1.96 AS BIGINT)
      |    AS significant
      |FROM rr WHERE r IS NOT NULL
      |QUALIFY row_number() OVER (PARTITION BY user_id
      |  ORDER BY r DESC, lag_h) = 1""".stripMargin

  /** Goh–Barabási burstiness + memory per user over whole-second
    * activity gaps — exact decimal/HUGEINT moments, two fixed IEEE
    * expressions. */
  def qBurstiness(spark: SparkSession, dir: String): DataFrame =
    graft.events.Correlation.burstiness(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("user_id").as("key"), tsUs.as("t")))

  val sqlBurstiness: String =
    """WITH pts AS (
      |  SELECT DISTINCT user_id AS key, epoch_us(ts) AS t FROM events),
      |g0 AS (SELECT key, t, lag(t) OVER (PARTITION BY key ORDER BY t)
      |         AS pt FROM pts),
      |g AS (SELECT key, CAST((t - pt) // 1000000 AS HUGEINT) AS g,
      |        CAST(lead((t - pt) // 1000000)
      |          OVER (PARTITION BY key ORDER BY t) AS HUGEINT) AS ng
      |      FROM g0 WHERE pt IS NOT NULL),
      |a AS (SELECT key, count(*) AS n_gaps, sum(g) AS sx,
      |        sum(g * g) AS sxx, count(ng) AS np,
      |        sum(CASE WHEN ng IS NOT NULL THEN g END) AS px,
      |        sum(ng) AS py,
      |        sum(CASE WHEN ng IS NOT NULL THEN g * g END) AS pxx,
      |        sum(ng * ng) AS pyy, sum(g * ng) AS pxy
      |      FROM g GROUP BY 1)
      |SELECT key, n_gaps,
      |  round(CAST(sx AS DOUBLE) / n_gaps, 6) AS mean_gap_s,
      |  CASE WHEN sx > 0 THEN
      |    round((sqrt(CAST(n_gaps * sxx - sx * sx AS DOUBLE))
      |             - CAST(sx AS DOUBLE))
      |          / (sqrt(CAST(n_gaps * sxx - sx * sx AS DOUBLE))
      |             + CAST(sx AS DOUBLE)), 6) END AS burstiness,
      |  CASE WHEN np >= 8 AND np * pxx - px * px > 0
      |    AND np * pyy - py * py > 0 THEN
      |    round(CAST(np * pxy - px * py AS DOUBLE)
      |      / sqrt(CAST(np * pxx - px * px AS DOUBLE)
      |           * CAST(np * pyy - py * py AS DOUBLE)), 6) END AS memory
      |FROM a""".stripMargin

  /** p95 Value-at-Risk + expected shortfall per event type: exact
    * rational-quantile threshold and the tail-conditional mean. */
  def qTailRisk(spark: SparkSession, dir: String): DataFrame =
    graft.stats.StatsOps.tailRisk(points(spark, dir))

  val sqlTailRisk: String =
    """WITH pts AS (
      |  SELECT event_type AS key, epoch_us(ts) AS t, max(value) AS v
      |  FROM events GROUP BY 1, 2),
      |px AS (SELECT key, CAST(floor(v * 1000 + 0.5) AS BIGINT) AS x
      |       FROM pts),
      |c AS (SELECT key, x,
      |        sum(w) OVER (PARTITION BY key ORDER BY x
      |          ROWS UNBOUNDED PRECEDING) AS c,
      |        sum(w) OVER (PARTITION BY key) AS n
      |      FROM (SELECT key, x, count(*) AS w FROM px GROUP BY 1, 2)),
      |thr AS (SELECT key,
      |          min(CASE WHEN c * 20 >= n * 19 THEN x END) AS vp,
      |          CAST(max(n) AS BIGINT) AS n
      |        FROM c GROUP BY 1)
      |SELECT px.key, thr.n, thr.vp / 1000.0 AS var_p,
      |  count(*) AS n_tail,
      |  round(sum(px.x) / 1000.0 / count(*), 6) AS es
      |FROM px JOIN thr ON px.key = thr.key AND px.x >= thr.vp
      |GROUP BY 1, 2, 3""".stripMargin

  /** Net user-activity intervals: 30-min session coverage MINUS 2-hour
    * incident blackouts (events with value ≥ 180) — the interval-set
    * difference sweep over the two coalesced unions. */
  def qIntervalDiff(spark: SparkSession, dir: String): DataFrame = {
    val e = spark.read.parquet(s"$dir/events.parquet")
    val a = e.select(col("user_id").as("key"), tsUs.as("t0"),
      (tsUs + 30L * 60L * 1000000L).as("t1"))
    val b = e.filter(col("value") >= 180)
      .select(col("user_id").as("key"), tsUs.as("t0"),
        (tsUs + 2L * HOUR).as("t1"))
    // plain path: 1,500 user keys spread the sort on their own — the
    // bucketed handoffs are for hot single-key inputs and only added
    // stages here (6.8 s -> ~1 s at sf0.1)
    SeriesOps.intervalDifference(a, b, bucketBy = None)
      .select(col("key").as("user_id"), col("d0"), col("d1"),
        (col("d1") - col("d0")).as("net_us"))
  }

  val sqlIntervalDiff: String =
    """WITH ea AS (SELECT user_id, epoch_us(ts) AS t0,
      |              epoch_us(ts) + 1800000000 AS t1 FROM events),
      |eb AS (SELECT user_id, epoch_us(ts) AS t0,
      |         epoch_us(ts) + 7200000000 AS t1 FROM events
      |       WHERE value >= 180),
      |fa AS (SELECT user_id, t0, t1,
      |         CASE WHEN t0 > coalesce(max(t1) OVER
      |             (PARTITION BY user_id ORDER BY t0, t1
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |           -9223372036854775808) THEN 1 ELSE 0 END AS nw
      |       FROM ea),
      |ga AS (SELECT user_id, t0, t1,
      |         sum(nw) OVER (PARTITION BY user_id ORDER BY t0, t1
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      |       FROM fa),
      |ua AS (SELECT user_id, min(t0) AS u0, max(t1) AS u1
      |       FROM ga GROUP BY user_id, grp),
      |fb AS (SELECT user_id, t0, t1,
      |         CASE WHEN t0 > coalesce(max(t1) OVER
      |             (PARTITION BY user_id ORDER BY t0, t1
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |           -9223372036854775808) THEN 1 ELSE 0 END AS nw
      |       FROM eb),
      |gb AS (SELECT user_id, t0, t1,
      |         sum(nw) OVER (PARTITION BY user_id ORDER BY t0, t1
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      |       FROM fb),
      |ub AS (SELECT user_id, min(t0) AS u0, max(t1) AS u1
      |       FROM gb GROUP BY user_id, grp),
      |d AS (SELECT user_id, u0 AS t, 1 AS da, 0 AS db FROM ua
      |      UNION ALL SELECT user_id, u1, -1, 0 FROM ua
      |      UNION ALL SELECT user_id, u0, 0, 1 FROM ub
      |      UNION ALL SELECT user_id, u1, 0, -1 FROM ub),
      |g2 AS (SELECT user_id, t, sum(da) AS da, sum(db) AS db
      |       FROM d GROUP BY 1, 2),
      |s AS (SELECT user_id, t,
      |        sum(da) OVER w AS ra, sum(db) OVER w AS rb,
      |        lead(t) OVER (PARTITION BY user_id ORDER BY t) AS nt
      |      FROM g2 WINDOW w AS (PARTITION BY user_id ORDER BY t
      |        ROWS UNBOUNDED PRECEDING))
      |SELECT user_id, t AS d0, nt AS d1, nt - t AS net_us
      |FROM s WHERE ra > 0 AND rb = 0 AND nt IS NOT NULL""".stripMargin

  /** Event-triggered average around high-value triggers (≥ 170): the
    * mean series profile at hourly offsets −3h..+3h relative to each
    * trigger — one as-of window samples every (trigger, offset) probe. */
  def qEventAvg(spark: SparkSession, dir: String): DataFrame = {
    val trig = spark.read.parquet(s"$dir/events.parquet")
      .filter(col("value") >= 170)
      .select(col("event_type").as("key"), tsUs.as("t")).distinct()
    EventOps.eventTriggeredAverage(points(spark, dir), trig,
      (-3L to 3L).map(_ * HOUR))
  }

  val sqlEventAvg: String =
    """WITH pts AS (
      |  SELECT event_type AS key, epoch_us(ts) AS t, max(value) AS v
      |  FROM events GROUP BY 1, 2),
      |trig AS (SELECT DISTINCT event_type AS key, epoch_us(ts) AS t
      |         FROM events WHERE value >= 170),
      |off AS (SELECT unnest(generate_series(-3, 3)) * 3600000000 AS off_us),
      |pr AS (SELECT trig.key, trig.t + off.off_us AS pt, off.off_us
      |       FROM trig CROSS JOIN off)
      |SELECT pr.key AS key, pr.off_us, count(*) AS n_events,
      |  count(p.v) AS n_sampled,
      |  round(sum(CAST(floor(p.v * 1000 + 0.5) AS BIGINT))
      |          / 1000.0 / count(p.v), 6) AS mean_v
      |FROM pr ASOF LEFT JOIN pts p ON pr.key = p.key AND pr.pt >= p.t
      |GROUP BY 1, 2""".stripMargin

  /** SRE multi-window burn rate over the event stream: each event is a
    * request, bad = value ≥ 170, budget 10%; alert when both the 1h and
    * 6h trailing windows burn at ≥ 2× — O(n) prefix-difference counts,
    * the oracle replays the naive RANGE frames. */
  def qBurnRate(spark: SparkSession, dir: String): DataFrame =
    EventOps.burnRate(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_type").as("key"), tsUs.as("t"),
          col("value").as("v")),
      isBad = col("v") >= 170, budget = 0.1,
      shortUs = HOUR, longUs = 6 * HOUR, burnThreshold = 2.0)

  val sqlBurnRate: String =
    """WITH byt AS (
      |  SELECT event_type AS key, epoch_us(ts) AS t, count(*) AS n,
      |         sum(CAST(value >= 170 AS BIGINT)) AS b
      |  FROM events GROUP BY 1, 2),
      |w AS (SELECT key, t,
      |        sum(n) OVER ws AS tot_s, sum(b) OVER ws AS bad_s,
      |        sum(n) OVER wl AS tot_l, sum(b) OVER wl AS bad_l
      |      FROM byt
      |      WINDOW ws AS (PARTITION BY key ORDER BY t
      |        RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW),
      |      wl AS (PARTITION BY key ORDER BY t
      |        RANGE BETWEEN 21599999999 PRECEDING AND CURRENT ROW))
      |SELECT key, t, CAST(tot_s AS BIGINT) AS tot_s, CAST(bad_s AS BIGINT) AS bad_s,
      |  round(CAST(bad_s AS DOUBLE) / tot_s / 0.1, 6) AS burn_s,
      |  CAST(tot_l AS BIGINT) AS tot_l, CAST(bad_l AS BIGINT) AS bad_l,
      |  round(CAST(bad_l AS DOUBLE) / tot_l / 0.1, 6) AS burn_l,
      |  CAST(round(CAST(bad_s AS DOUBLE) / tot_s / 0.1, 6) >= 2.0
      |   AND round(CAST(bad_l AS DOUBLE) / tot_l / 0.1, 6) >= 2.0
      |   AS BIGINT) AS alert
      |FROM w""".stripMargin

  /** Kleinberg 2-state burst marking over each USER's activity gaps
    * (γ = 1, s = 2, week buckets): the integer min-plus Viterbi — the
    * one scan-family member exact enough for a DuckDB oracle, which
    * replays both DP directions as recursive CTEs (keyed by user so the
    * oracle recursion depth is the per-user chain, not the corpus). */
  def qBursts(spark: SparkSession, dir: String): DataFrame =
    graft.events.Burst.kleinbergBursts(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("user_id").as("key"), tsUs.as("t")),
      gamma = 1.0, bucketMicros = WEEK)

  val sqlBursts: String =
    """WITH RECURSIVE pts AS (
      |  SELECT DISTINCT user_id AS key, epoch_us(ts) AS t FROM events),
      |st AS (SELECT key, count(*) - 1 AS m, max(t) - min(t) AS span
      |       FROM pts GROUP BY 1
      |       HAVING count(*) - 1 >= 1 AND max(t) - min(t) > 0),
      |g0 AS (SELECT key, t,
      |         lag(t) OVER (PARTITION BY key ORDER BY t) AS t0
      |       FROM pts),
      |g AS (SELECT g0.key,
      |        row_number() OVER (PARTITION BY g0.key ORDER BY g0.t) AS i,
      |        g0.t0, g0.t AS t1, g0.t - g0.t0 AS x,
      |        CAST((CAST(1048576 AS HUGEINT) * (g0.t - g0.t0) * st.m)
      |             // st.span AS BIGINT) - 726817 AS r,
      |        CAST(floor(ln(CAST(st.m AS DOUBLE)) * 1048576 + 0.5)
      |             AS BIGINT) AS up,
      |        st.m
      |      FROM g0 JOIN st ON g0.key = st.key WHERE g0.t0 IS NOT NULL),
      |f AS (
      |  SELECT key, CAST(0 AS BIGINT) AS i, CAST(0 AS BIGINT) AS f0,
      |         CAST(2305843009213693951 AS BIGINT) AS f1
      |  FROM st
      |  UNION ALL
      |  SELECT g.key, g.i, least(f.f0, f.f1),
      |         least(g.up + g.r + f.f0, g.r + f.f1)
      |  FROM f JOIN g ON g.key = f.key AND g.i = f.i + 1),
      |h AS (
      |  SELECT key, m + 1 AS i, CAST(0 AS BIGINT) AS h0,
      |         CAST(0 AS BIGINT) AS h1
      |  FROM st
      |  UNION ALL
      |  SELECT g.key, g.i, least(h.h0, g.up + g.r + h.h1),
      |         least(h.h0, g.r + h.h1)
      |  FROM h JOIN g ON g.key = h.key AND g.i = h.i - 1)
      |SELECT g.key, g.t0, g.t1, g.x AS gap_us,
      |  CAST(f.f1 + h.h1 < f.f0 + h.h0 AS BIGINT) AS burst
      |FROM g
      |JOIN f ON f.key = g.key AND f.i = g.i
      |JOIN h ON h.key = g.key AND h.i = g.i + 1""".stripMargin

  /** Centered 5-point rolling-median despike per event-type series
    * ([[graft.events.EventOps.rollingMedian]]): Tukey's median filter
    * on the 1e-3 integer grid with a lower-median pick, plus a
    * |v − med| > 50 spike flag — both integer-exact, so the oracle is
    * the same sorted-window element pick in DuckDB. */
  def qRollingMedian(spark: SparkSession, dir: String): DataFrame =
    EventOps.rollingMedian(points(spark, dir), halfWidth = 2,
      spikeThreshold = 50.0)
      .select(col("key").as("event_type"), col("t"), col("v"),
        col("med_v"), col("is_spike"))

  val sqlRollingMedian: String =
    """WITH pts AS (
      |  SELECT event_type, epoch_us(ts) AS t, max(value) AS v
      |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
      |q AS (SELECT event_type, t, v,
      |        CAST(floor(v * 1000 + 0.5) AS BIGINT) AS xq
      |      FROM pts),
      |w AS (SELECT event_type, t, v, xq,
      |        list_sort(list(xq) OVER (
      |          PARTITION BY event_type ORDER BY t
      |          ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)) AS arr
      |      FROM q)
      |SELECT event_type, t, v,
      |  arr[CAST((len(arr) + 1) // 2 AS INT)] / 1000.0 AS med_v,
      |  CAST(abs(xq - arr[CAST((len(arr) + 1) // 2 AS INT)]) > 50000
      |    AS BIGINT) AS is_spike
      |FROM w""".stripMargin

  /** Overlapping 64-token / stride-48 chunker over documents
    * ([[graft.text.TextOps.chunkOverlap]]): every chunk verified by its
    * md5 digest — the oracle re-slices the same \S+ token list in
    * DuckDB and re-hashes. */
  def qChunkOverlap(spark: SparkSession, dir: String): DataFrame =
    TextOps.chunkOverlap(docs(spark, dir), window = 64, stride = 48)

  val sqlChunkOverlap: String =
    """WITH d AS (
      |  SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
      |  FROM documents),
      |n AS (SELECT doc_id, toks, len(toks) AS n FROM d WHERE len(toks) > 0),
      |c AS (SELECT doc_id, toks,
      |        unnest(range(0, ((n - 1) // 48) + 1)) AS chunk_idx
      |      FROM n)
      |SELECT doc_id, chunk_idx,
      |  len(toks[chunk_idx * 48 + 1 : chunk_idx * 48 + 64]) AS n_tokens,
      |  md5(array_to_string(toks[chunk_idx * 48 + 1 : chunk_idx * 48 + 64],
      |    ' ')) AS chunk_md5
      |FROM c""".stripMargin

  /** Dictionary+RLE state-codec round-trip ([[graft.chunk.StateRle]] via
    * [[ChunkOps.writeStateChunks]]/[[readStateChunks]]): the low-cardinality
    * companion of the Gorilla tier (q13), on the UNcompacted floored state
    * series — exactly the shape where runs pay. Oracle = the input itself. */
  def qRleRoundtrip(spark: SparkSession, dir: String): DataFrame =
    ChunkOps.readStateChunks(
      ChunkOps.writeStateChunks(
        points(spark, dir)
          .withColumn("v", (floor(col("v") / 50) + lit(0.0)).cast("double")),
        DAY))

  val sqlRleRoundtrip: String =
    """WITH pts AS (
      |  SELECT event_type AS key, epoch_us(ts) AS t,
      |         CAST(floor(max(value) / 50) AS DOUBLE) AS v
      |  FROM events GROUP BY 1, 2)
      |SELECT key, t, v FROM pts""".stripMargin

  /** Per-chunk storage manifest of the state codec: point/run/dictionary
    * counts and the EXACT encoded byte length. The Spark side is the
    * codec's own output (blob length + header self-report); the oracle
    * recomputes every column from the format spec — LEB128 varint widths
    * over zigzag timestamps and run records — so a hash match proves the
    * blob format itself, not merely that decode inverts encode. */
  def qCodecManifest(spark: SparkSession, dir: String): DataFrame =
    ChunkOps.writeStateChunks(
      points(spark, dir)
        .withColumn("v", (floor(col("v") / 50) + lit(0.0)).cast("double")),
      DAY)
      .select(col("key"), col("bucket"), col("n_points"), col("n_runs"),
        col("dict_size"),
        (col("n_points") * 16).as("raw_bytes"),
        length(col("blob")).cast("long").as("rle_bytes"))

  /** LEB128 byte width of an unsigned varint as a SQL CASE — mirrors
    * [[graft.chunk.StateRle.varintLen]]; all quantities here are < 2^56
    * so the 9-byte arm is the closed tail. */
  private def vlenSql(e: String): String =
    s"(CASE WHEN ($e) < 128 THEN 1 WHEN ($e) < 16384 THEN 2" +
      s" WHEN ($e) < 2097152 THEN 3 WHEN ($e) < 268435456 THEN 4" +
      s" WHEN ($e) < 34359738368 THEN 5 WHEN ($e) < 4398046511104 THEN 6" +
      s" WHEN ($e) < 562949953421312 THEN 7" +
      s" WHEN ($e) < 72057594037927936 THEN 8 ELSE 9 END)"

  /** zigzag of a signed BIGINT expression. */
  private def zzSql(e: String): String =
    s"(CASE WHEN ($e) >= 0 THEN 2 * ($e) ELSE -2 * ($e) - 1 END)"

  val sqlCodecManifest: String =
    s"""WITH pts AS (
       |  SELECT event_type AS key, epoch_us(ts) AS t,
       |         CAST(floor(max(value) / 50) AS DOUBLE) AS v
       |  FROM events GROUP BY 1, 2),
       |ord AS (
       |  SELECT key, t // $DAY AS bucket, t, v,
       |         row_number() OVER w AS rn,
       |         lag(t) OVER w AS pt, lag(t, 2) OVER w AS ppt,
       |         (lag(t) OVER w IS NULL
       |          OR v IS DISTINCT FROM lag(v) OVER w) AS brk
       |  FROM pts WINDOW w AS (PARTITION BY key, t // $DAY ORDER BY t)),
       |marked AS (
       |  SELECT key, bucket, t, v,
       |         sum(CASE WHEN brk THEN 1 ELSE 0 END)
       |           OVER (PARTITION BY key, bucket ORDER BY t) AS run_id
       |  FROM ord),
       |runs AS (
       |  SELECT key, bucket, run_id, min(t) AS rt, count(*) AS run_len,
       |         any_value(v) AS v
       |  FROM marked GROUP BY 1, 2, 3),
       |dict AS (
       |  SELECT key, bucket, v, min(rt) AS ft
       |  FROM runs WHERE v IS NOT NULL GROUP BY 1, 2, 3),
       |didx AS (
       |  SELECT key, bucket, v,
       |         rank() OVER (PARTITION BY key, bucket ORDER BY ft) AS idx
       |  FROM dict),
       |rb AS (
       |  SELECT r.key, r.bucket, count(*) AS n_runs,
       |         sum(${vlenSql("coalesce(d.idx, 0)")}
       |             + ${vlenSql("r.run_len")}) AS bytes
       |  FROM runs r LEFT JOIN didx d
       |    ON d.key = r.key AND d.bucket = r.bucket AND d.v = r.v
       |  GROUP BY 1, 2),
       |dods AS (
       |  SELECT key, bucket, t,
       |         CASE WHEN rn = 2 THEN t - pt
       |              ELSE (t - pt) - (pt - ppt) END AS dod
       |  FROM ord WHERE rn >= 2),
       |dbrk AS (
       |  SELECT key, bucket, t, dod,
       |         (dod IS DISTINCT FROM lag(dod)
       |            OVER (PARTITION BY key, bucket ORDER BY t)) AS brk
       |  FROM dods),
       |druns AS (
       |  SELECT key, bucket, any_value(dod) AS dod, count(*) AS run_len
       |  FROM (SELECT key, bucket, dod,
       |          sum(CASE WHEN brk THEN 1 ELSE 0 END)
       |            OVER (PARTITION BY key, bucket ORDER BY t) AS drun_id
       |        FROM dbrk)
       |  GROUP BY key, bucket, drun_id),
       |dtb AS (
       |  SELECT key, bucket,
       |         sum(${vlenSql(zzSql("dod"))} + ${vlenSql("run_len")}) AS bytes
       |  FROM druns GROUP BY 1, 2),
       |tb AS (
       |  SELECT key, bucket, count(*) AS n,
       |         ${vlenSql(zzSql("min(t)"))} AS t0_bytes
       |  FROM ord GROUP BY 1, 2),
       |ds AS (SELECT key, bucket, count(*) AS dict_size FROM dict GROUP BY 1, 2)
       |SELECT tb.key, tb.bucket, tb.n AS n_points, rb.n_runs,
       |  CAST(coalesce(ds.dict_size, 0) AS BIGINT) AS dict_size,
       |  16 * tb.n AS raw_bytes,
       |  CAST(${vlenSql("tb.n")} + tb.t0_bytes + coalesce(dtb.bytes, 0)
       |    + ${vlenSql("coalesce(ds.dict_size, 0)")}
       |    + 8 * coalesce(ds.dict_size, 0) + rb.bytes AS BIGINT) AS rle_bytes
       |FROM tb
       |JOIN rb ON rb.key = tb.key AND rb.bucket = tb.bucket
       |LEFT JOIN ds ON ds.key = tb.key AND ds.bucket = tb.bucket
       |LEFT JOIN dtb ON dtb.key = tb.key AND dtb.bucket = tb.bucket""".stripMargin

  /** Trailing percentile rank per sample — each value's rank among its
    * key's last 100 samples as an exact rational (num = trailing values
    * ≤ current, den = window size): the streaming-friendly "how unusual
    * is this reading vs its own recent history" score. One bounded ROWS
    * window; the oracle replays the same frame with a list filter. */
  def qPercentileRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("key").orderBy("t").rowsBetween(-99, 0)
    points(spark, dir)
      .withColumn("_win", collect_list(col("v")).over(w))
      .select(col("key"), col("t"),
        size(filter(col("_win"), x => x <= col("v"))).cast("long").as("rank_num"),
        size(col("_win")).cast("long").as("rank_den"))
  }

  val sqlPercentileRank: String =
    """WITH pts AS (
      |  SELECT event_type AS key, epoch_us(ts) AS t, max(value) AS v
      |  FROM events GROUP BY 1, 2),
      |w AS (
      |  SELECT key, t, v,
      |         list(v) OVER (PARTITION BY key ORDER BY t
      |           ROWS BETWEEN 99 PRECEDING AND CURRENT ROW) AS l
      |  FROM pts)
      |SELECT key, t,
      |  CAST(len(list_filter(l, x -> x <= v)) AS BIGINT) AS rank_num,
      |  CAST(len(l) AS BIGINT) AS rank_den
      |FROM w""".stripMargin

  /** Monthly retention tier: the daily histogram tier rebinned to
    * calendar months ([[Rollup.rebin]] + [[Rollup.floorMonth]]). Months
    * are irregular (28-31 days), so unlike the fixed-step daily/weekly
    * cascade this exercises the calendar floor; weights stay exact longs
    * so the cascade is still lossless. */
  def qRollupMonthly(spark: SparkSession, dir: String): DataFrame =
    qRollupDaily(spark, dir)
      .groupBy(col("key"), Rollup.floorMonth(col("bin_start")).as("bin_start"),
        col("state"))
      .agg(sum("weight_us").cast("long").as("weight_us"))

  val sqlRollupMonthly: String =
    s"""SELECT key,
       |  epoch_us(date_trunc('month', make_timestamp(bin_start))) AS bin_start,
       |  state, CAST(sum(weight_us) AS BIGINT) AS weight_us
       |FROM ($sqlRollupDaily) GROUP BY 1, 2, 3""".stripMargin

  /** The retention policy as a driver-gated query ([[Rollup.applyRetention]]
    * — the north rule's "retention" leg): raw kept 7 days, hourly 30,
    * daily 90, weekly forever, all relative to the stream's own tmax;
    * output is the per-tier storage manifest (rows kept + kept range).
    * The oracle rebuilds every tier and replays the horizon filters. */
  def qRetentionSweep(spark: SparkSession, dir: String): DataFrame = {
    val pts = points(spark, dir)
    val (_, tmax) = eventBounds(spark, dir)
    val (r, h, d, w) = Rollup.applyRetention(
      pts, hourlyHist(spark, dir), qRollupDaily(spark, dir),
      qRollupWeekly(spark, dir), nowUs = tmax,
      rawKeepUs = 7 * DAY, hourlyKeepUs = 30 * DAY, dailyKeepUs = 90 * DAY)
    def manifest(df: DataFrame, tier: String, tc: String): DataFrame =
      df.agg(count(lit(1)).as("n_rows"),
          min(col(tc)).as("lo_us"), max(col(tc)).as("hi_us"))
        .select(lit(tier).as("tier"), col("n_rows"), col("lo_us"), col("hi_us"))
    manifest(r, "raw", "t")
      .unionByName(manifest(h, "hourly", "bin_start"))
      .unionByName(manifest(d, "daily", "bin_start"))
      .unionByName(manifest(w, "weekly", "bin_start"))
  }

  private val sqlHourlyHistFull: String =
    sqlHist(s"cell * $HOUR").replace("__STEP__", HOUR.toString).replace("__SHIFT__", "0")

  val sqlRetentionSweep: String =
    s"""WITH raw AS (
       |  SELECT event_type AS key, epoch_us(ts) AS t, max(value) AS v
       |  FROM events GROUP BY 1, 2),
       |b AS (SELECT max(t) AS tmax FROM raw)
       |SELECT 'raw' AS tier, count(*) AS n_rows,
       |  min(t) AS lo_us, max(t) AS hi_us
       |FROM raw WHERE t >= (SELECT tmax FROM b) - ${7 * DAY}
       |UNION ALL
       |SELECT 'hourly', count(*), min(bin_start), max(bin_start)
       |FROM ($sqlHourlyHistFull)
       |WHERE bin_start >= (SELECT tmax FROM b) - ${30 * DAY}
       |UNION ALL
       |SELECT 'daily', count(*), min(bin_start), max(bin_start)
       |FROM ($sqlRollupDaily)
       |WHERE bin_start >= (SELECT tmax FROM b) - ${90 * DAY}
       |UNION ALL
       |SELECT 'weekly', count(*), min(bin_start), max(bin_start)
       |FROM ($sqlRollupWeekly)""".stripMargin

  /** Time-weighted mean under a business-hours calendar mask (Mon-Fri
    * 09:00-17:00 UTC): segments split at hour cells, only business cells
    * kept — the SLA-report composition of the hour-of-day/day-of-week
    * machinery. Exact long coverage; the value sum rides the 1e-3 grid
    * in decimal(38,0)/HUGEINT so partial-aggregation order can't move a
    * bit; ONE final division rounded to 6 dp. */
  def qBusinessHours(spark: SparkSession, dir: String): DataFrame = {
    val pts = points(spark, dir)
    val (tmin, tmax) = eventBounds(spark, dir)
    val segs = SeriesOps.segmentsInRange(pts, lit(tmin), lit(tmax), nullD)
    val cells = Regularize.splitAtCells(segs, lit(0L), lit(HOUR))
    val wk = pmod(floor(col("cell_start") / DAY) + 3, lit(7))
    val hr = pmod(floor(col("cell_start") / HOUR), lit(24))
    val dur = col("t1") - col("t0")
    val vq = floor(col("v") * 1000 + 0.5).cast("long")
    cells
      .filter(col("v").isNotNull && wk <= 4 && hr >= 9 && hr < 17)
      .groupBy("key")
      .agg(
        sum(dur).as("covered_us"),
        sum((vq * dur).cast("decimal(38,0)")).as("_s"))
      .select(col("key"), col("covered_us"),
        round(col("_s").cast("double") / col("covered_us") / 1000.0, 6)
          .as("bh_mean"))
  }

  val sqlBusinessHours: String =
    sqlPrefix() +
      s""", cells AS (
         |  SELECT key, v,
         |         greatest(t0, cell * $HOUR) AS c0,
         |         least(t1, (cell + 1) * $HOUR) AS c1, cell
         |  FROM segs, unnest(generate_series(t0 // $HOUR, t1 // $HOUR)) c(cell)
         |  WHERE t1 > t0)
         |SELECT key, CAST(sum(c1 - c0) AS BIGINT) AS covered_us,
         |  round(CAST(sum(CAST(floor(v * 1000 + 0.5) AS HUGEINT) * (c1 - c0))
         |          AS DOUBLE) / sum(c1 - c0) / 1000.0, 6) AS bh_mean
         |FROM cells
         |WHERE c1 > c0 AND v IS NOT NULL
         |  AND ((cell // 24) + 3) % 7 <= 4 AND cell % 24 BETWEEN 9 AND 16
         |GROUP BY 1""".stripMargin

  /** Monthly availability SLO: per (key, calendar month) the share of
    * clipped wall time spent at value ≥ 100 — the threshold-based
    * availability complement of q111's gap-based downtime, on the
    * irregular month floor. Exact long durations, one division. */
  def qUptimeSlo(spark: SparkSession, dir: String): DataFrame = {
    val pts = points(spark, dir)
    val (h0, h1) = dayBounds(spark, dir)
    val segs = SeriesOps.segmentsInRange(pts, lit(h0), lit(h1), nullD)
    val dur = col("t1") - col("t0")
    Regularize.splitAtCells(segs, lit(0L), lit(DAY))
      .groupBy(col("key"),
        Rollup.floorMonth(col("cell_start")).as("month_start"))
      .agg(
        sum(when(col("v") >= 100, dur).otherwise(0L)).as("up_us"),
        sum(dur).as("span_us"))
      .select(col("key"), col("month_start"), col("up_us"), col("span_us"),
        round(col("up_us").cast("double") / col("span_us"), 6).as("uptime"))
  }

  val sqlUptimeSlo: String =
    sqlPrefix() +
      s""", bb AS (SELECT (tmin // $DAY) * $DAY AS h0,
         |            ((tmax // $DAY) + 1) * $DAY AS h1 FROM b),
         |clipped AS (
         |  SELECT key,
         |         CASE WHEN ot IS NULL THEN (SELECT h0 FROM bb) ELSE t0 END AS t0,
         |         CASE WHEN lst THEN (SELECT h1 FROM bb) ELSE t1 END AS t1,
         |         v
         |  FROM segs),
         |cells AS (
         |  SELECT key, v,
         |         greatest(t0, cell * $DAY) AS c0,
         |         least(t1, (cell + 1) * $DAY) AS c1,
         |         cell * $DAY AS cs
         |  FROM clipped, unnest(generate_series(t0 // $DAY, t1 // $DAY)) c(cell)
         |  WHERE t1 > t0)
         |SELECT key,
         |  epoch_us(date_trunc('month', make_timestamp(cs))) AS month_start,
         |  CAST(sum(CASE WHEN v >= 100 THEN c1 - c0 ELSE 0 END) AS BIGINT) AS up_us,
         |  CAST(sum(c1 - c0) AS BIGINT) AS span_us,
         |  round(CAST(sum(CASE WHEN v >= 100 THEN c1 - c0 ELSE 0 END) AS DOUBLE)
         |        / sum(c1 - c0), 6) AS uptime
         |FROM cells WHERE c1 > c0 GROUP BY 1, 2""".stripMargin

  /** Week-over-week comparison on the SPARSE hourly bin grid: each
    * (key, hour) bin's event count and 1e-3-grid value sum joined with
    * the bin exactly 7 days earlier (an equi join on (key, bin−1w), NOT
    * a lag window — a lag would silently compare against whatever bin
    * happens to precede on a sparse grid). Exact integers throughout. */
  def qWeekOverWeek(spark: SparkSession, dir: String): DataFrame = {
    val bins = points(spark, dir)
      .groupBy(col("key"),
        (floor(col("t") / HOUR) * HOUR).cast("long").as("bin_start"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("v") * 1000 + 0.5).cast("long")).as("sq"))
    val prev = bins.select(col("key").as("_pk"),
      (col("bin_start") + WEEK).as("_pb"),
      col("n").as("n_prev"), col("sq").as("sq_prev"))
    bins
      .join(prev, col("key") === col("_pk") && col("bin_start") === col("_pb"))
      .select(col("key"), col("bin_start"), col("n"), col("sq"),
        col("n_prev"), col("sq_prev"),
        (col("n") - col("n_prev")).as("dn"),
        (col("sq") - col("sq_prev")).as("dsq"))
  }

  val sqlWeekOverWeek: String =
    s"""WITH pts AS (
       |  SELECT event_type AS key, epoch_us(ts) AS t, max(value) AS v
       |  FROM events GROUP BY 1, 2),
       |bins AS (
       |  SELECT key, (t // $HOUR) * $HOUR AS bin_start,
       |         count(*) AS n,
       |         CAST(sum(CAST(floor(v * 1000 + 0.5) AS BIGINT)) AS BIGINT) AS sq
       |  FROM pts GROUP BY 1, 2)
       |SELECT b.key, b.bin_start, b.n, b.sq,
       |  p.n AS n_prev, p.sq AS sq_prev,
       |  b.n - p.n AS dn, b.sq - p.sq AS dsq
       |FROM bins b
       |JOIN bins p ON p.key = b.key AND p.bin_start = b.bin_start - $WEEK""".stripMargin

  /** Real-time continuous aggregate (the TimescaleDB serving pattern):
    * the MATERIALIZED hourly tier answers bins before the watermark, the
    * raw tail is aggregated on the fly for bins at/after it, and the
    * union is the query result. The watermark tail re-aggregation rides
    * [[SeriesOps.segmentsInRange]] from the watermark, which carries
    * each key's as-of value across the boundary (zero-order hold), so
    * the stitch is seamless; the oracle is the DIRECTLY-computed full
    * hourly tier — a hash match proves stitched ≡ recomputed. */
  def qTierStitch(spark: SparkSession, dir: String): DataFrame = {
    val pts = points(spark, dir)
    val (h0, h1) = dayBounds(spark, dir)
    // materialization watermark (hour-aligned), clamped to the tier
    // start: on a table spanning under 14 days an unclamped watermark
    // would make the raw tail re-aggregate [wm, h0) and emit
    // null-state bins the materialized tier never held
    val wm = math.max(h0, h1 - 14 * DAY)
    val materialized = hourlyHist(spark, dir).filter(col("bin_start") < wm)
    val tail = Rollup
      .histTier(pts.withColumn("v", floor(col("v") / 50).cast("double")),
        wm, h1, HOUR)
      .select(col("key"), col("bin_start"), col("v").as("state"),
        col("weight").as("weight_us"))
    materialized.unionByName(tail)
  }

  val sqlTierStitch: String = sqlHourlyHistFull

  /** PromQL-style `resets()`: per (key, UTC day) the number of strict
    * value DECREASES between consecutive samples (counter wrap/restart
    * marks), attributed to the later sample's day, plus the day's sample
    * count. One keyed window, exact integers. */
  def qCounterResets(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("key").orderBy("t")
    points(spark, dir)
      .withColumn("_pv", lag("v", 1).over(w))
      .groupBy(col("key"),
        (floor(col("t") / DAY) * DAY).cast("long").as("day_start"))
      .agg(
        count(lit(1)).as("n_samples"),
        count(when(col("_pv") > col("v"), 1)).as("n_resets"))
  }

  val sqlCounterResets: String =
    s"""WITH pts AS (
       |  SELECT event_type AS key, epoch_us(ts) AS t, max(value) AS v
       |  FROM events GROUP BY 1, 2),
       |l AS (SELECT key, t, v,
       |        lag(v) OVER (PARTITION BY key ORDER BY t) AS pv
       |      FROM pts)
       |SELECT key, (t // $DAY) * $DAY AS day_start,
       |  count(*) AS n_samples,
       |  count(CASE WHEN pv > v THEN 1 END) AS n_resets
       |FROM l GROUP BY 1, 2""".stripMargin

  /** Lomb–Scargle periodogram over each user's raw irregular event
    * values at five trial periods (6h/12h/24h/3d/7d): the variance
    * fraction explained by the best-fit sinusoid + intercept at each
    * period, computed AT THE SAMPLE TIMES (no binning). See
    * [[graft.stats.Spectral]] for the engine-exactness argument (all
    * trig is per-row and integer-quantized; the aggregate-side math is
    * pure rational). */
  def qLombScargle(spark: SparkSession, dir: String): DataFrame =
    graft.stats.Spectral.periodogram(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("user_id").as("key"), tsUs.as("t"), col("value").as("v")),
      periodsUs = Seq(6 * HOUR, 12 * HOUR, DAY, 3 * DAY, 7 * DAY),
      minPoints = 16)
      .select(col("key").as("user_id"), col("period_us"), col("n"),
        col("power"))

  /** Shared CTE chain (through the det frame `f`) of the q193/q216
    * oracles. */
  private val sqlLombChain: String =
    s"""WITH e AS (SELECT user_id, epoch_us(ts) AS t, value
       |           FROM events WHERE value IS NOT NULL AND epoch_us(ts) >= 0),
       |per AS (SELECT unnest([${6 * HOUR}, ${12 * HOUR}, $DAY, ${3 * DAY},
       |                      ${7 * DAY}]) AS period_us),
       |q AS (SELECT user_id, period_us,
       |        CAST(floor(value * 1000 + 0.5) AS BIGINT) AS x,
       |        CAST(floor(cos((6.283185307179586 * CAST(t % period_us AS DOUBLE))
       |          / CAST(period_us AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS c,
       |        CAST(floor(sin((6.283185307179586 * CAST(t % period_us AS DOUBLE))
       |          / CAST(period_us AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS s
       |      FROM e CROSS JOIN per),
       |sm AS (SELECT user_id, period_us, count(*) AS n,
       |        sum(x) AS sx, sum(x * x) AS sxx, sum(c) AS sc, sum(s) AS ss,
       |        sum(c * c) AS scc, sum(s * s) AS sss, sum(c * s) AS scs,
       |        sum(x * c) AS sxc, sum(x * s) AS sxs
       |      FROM q GROUP BY 1, 2),
       |m AS (SELECT user_id, period_us, n,
       |        CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS vxx,
       |        CAST(scc AS DOUBLE) - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) AS vcc,
       |        CAST(sss AS DOUBLE) - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE) / CAST(n AS DOUBLE) AS vss,
       |        CAST(scs AS DOUBLE) - CAST(sc AS DOUBLE) * CAST(ss AS DOUBLE) / CAST(n AS DOUBLE) AS vcs,
       |        CAST(sxc AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) AS vxc,
       |        CAST(sxs AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(ss AS DOUBLE) / CAST(n AS DOUBLE) AS vxs
       |      FROM sm),
       |f AS (SELECT *, vcc * vss - vcs * vcs AS det FROM m)""".stripMargin

  /** The q193 power expression, shared verbatim with the q216 oracle so
    * the two can never silently diverge. */
  private val lsPowerCase: String =
    """CASE WHEN n >= 16 AND det > 0 AND vxx > 0 THEN
      |    round((((vss * vxc - vcs * vxs) / det) * vxc
      |         + ((vcc * vxs - vcs * vxc) / det) * vxs) / vxx, 6)
      |  END""".stripMargin

  val sqlLombScargle: String =
    sqlLombChain + "\nSELECT user_id, period_us, n,\n  " +
      lsPowerCase + " AS power\nFROM f"

  /** Harmonic fit at the 24h period: least-squares μ + a·cos + b·sin
    * coefficients in original value units, amplitude, and fit R² per
    * user — "how big is the daily swing". Phase stays as (a, b): atan2
    * is not correctly-rounded, so it would break oracle bit-parity. */
  def qHarmonicFit(spark: SparkSession, dir: String): DataFrame =
    graft.stats.Spectral.harmonicFit(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("user_id").as("key"), tsUs.as("t"), col("value").as("v")),
      periodUs = DAY, minPoints = 16)
      .select(col("key").as("user_id"), col("n"), col("a"), col("b"),
        col("amp"), col("r2"))

  val sqlHarmonicFit: String =
    s"""WITH e AS (SELECT user_id, epoch_us(ts) AS t, value
       |           FROM events WHERE value IS NOT NULL AND epoch_us(ts) >= 0),
       |q AS (SELECT user_id,
       |        CAST(floor(value * 1000 + 0.5) AS BIGINT) AS x,
       |        CAST(floor(cos((6.283185307179586 * CAST(t % $DAY AS DOUBLE))
       |          / CAST($DAY AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS c,
       |        CAST(floor(sin((6.283185307179586 * CAST(t % $DAY AS DOUBLE))
       |          / CAST($DAY AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS s
       |      FROM e),
       |sm AS (SELECT user_id, count(*) AS n,
       |        sum(x) AS sx, sum(x * x) AS sxx, sum(c) AS sc, sum(s) AS ss,
       |        sum(c * c) AS scc, sum(s * s) AS sss, sum(c * s) AS scs,
       |        sum(x * c) AS sxc, sum(x * s) AS sxs
       |      FROM q GROUP BY 1),
       |m AS (SELECT user_id, n,
       |        CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS vxx,
       |        CAST(scc AS DOUBLE) - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) AS vcc,
       |        CAST(sss AS DOUBLE) - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE) / CAST(n AS DOUBLE) AS vss,
       |        CAST(scs AS DOUBLE) - CAST(sc AS DOUBLE) * CAST(ss AS DOUBLE) / CAST(n AS DOUBLE) AS vcs,
       |        CAST(sxc AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) AS vxc,
       |        CAST(sxs AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(ss AS DOUBLE) / CAST(n AS DOUBLE) AS vxs
       |      FROM sm),
       |f AS (SELECT *, vcc * vss - vcs * vcs AS det FROM m),
       |ab AS (SELECT user_id, n, vxx, det, vxc, vxs,
       |         (vss * vxc - vcs * vxs) / det AS aq,
       |         (vcc * vxs - vcs * vxc) / det AS bq
       |       FROM f)
       |SELECT user_id, n,
       |  CASE WHEN n >= 16 AND det > 0 AND vxx > 0
       |    THEN round(aq * 1000, 6) END AS a,
       |  CASE WHEN n >= 16 AND det > 0 AND vxx > 0
       |    THEN round(bq * 1000, 6) END AS b,
       |  CASE WHEN n >= 16 AND det > 0 AND vxx > 0
       |    THEN round(sqrt(aq * aq + bq * bq) * 1000, 6) END AS amp,
       |  CASE WHEN n >= 16 AND det > 0 AND vxx > 0
       |    THEN round((aq * vxc + bq * vxs) / vxx, 6) END AS r2
       |FROM ab""".stripMargin

  /** Exact two-sample Kolmogorov–Smirnov drift per key between the two
    * halves of the observed time range (split at the integer midpoint of
    * [tmin, tmax]). See [[graft.stats.TwoSample]]: the gap is maximized
    * as the cross-multiplied integer |cA·nB − cB·nA|, one division at
    * the end. */
  def qKsDrift(spark: SparkSession, dir: String): DataFrame = {
    val pts = points(spark, dir)
    val (tmin, tmax) = eventBounds(spark, dir)
    graft.stats.TwoSample.ks(pts, lit((tmin + tmax) / 2))
      .select(col("key"), col("n_a"), col("n_b"), col("d_num"), col("d"))
  }

  /** The shared two-window histogram CTE for q195/q196: per-(key, 1e-3
    * value bin) counts in window A (t below the global midpoint) and B,
    * cumulative in value order, with per-key totals. */
  private val sqlHistAB: String =
    """WITH pts AS (
      |  SELECT event_type AS key, epoch_us(ts) AS t, max(value) AS v
      |  FROM events GROUP BY 1, 2),
      |b AS (SELECT (min(t) + max(t)) // 2 AS tm FROM pts),
      |q AS (SELECT key, CAST(floor(v * 1000 + 0.5) AS BIGINT) AS x,
      |        CASE WHEN t < (SELECT tm FROM b) THEN 1 ELSE 0 END AS a
      |      FROM pts WHERE v IS NOT NULL),
      |cnt AS (SELECT key, x, sum(a) AS ca, sum(1 - a) AS cb
      |        FROM q GROUP BY 1, 2),
      |cum AS (SELECT key, x, ca, cb,
      |        sum(ca) OVER (PARTITION BY key ORDER BY x) AS cca,
      |        sum(cb) OVER (PARTITION BY key ORDER BY x) AS ccb,
      |        sum(ca) OVER (PARTITION BY key) AS na,
      |        sum(cb) OVER (PARTITION BY key) AS nb
      |        FROM cnt)""".stripMargin

  val sqlKsDrift: String =
    s"""$sqlHistAB
       |SELECT key, CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
       |  CAST(max(abs(cca * nb - ccb * na)) AS BIGINT) AS d_num,
       |  CASE WHEN max(na) > 0 AND max(nb) > 0 THEN
       |    round(CAST(max(abs(cca * nb - ccb * na)) AS DOUBLE)
       |          / CAST(max(na) * max(nb) AS DOUBLE), 6) END AS d
       |FROM cum GROUP BY 1""".stripMargin

  /** Mann–Whitney U with midrank ties between the same two halves —
    * u2 = 2·U_A exact long, auc = U_A/(nA·nB) the probability-of-
    * superiority effect size. */
  def qMwuDrift(spark: SparkSession, dir: String): DataFrame = {
    val pts = points(spark, dir)
    val (tmin, tmax) = eventBounds(spark, dir)
    graft.stats.TwoSample.mannWhitney(pts, lit((tmin + tmax) / 2))
      .select(col("key"), col("n_a"), col("n_b"), col("u2"), col("auc"))
  }

  val sqlMwuDrift: String =
    s"""$sqlHistAB,
       |dr AS (SELECT key, ca, na, nb,
       |        2 * (cca + ccb - (ca + cb)) + (ca + cb) + 1 AS d2
       |       FROM cum),
       |a AS (SELECT key, CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
       |        CAST(sum(ca * d2) - max(na) * (max(na) + 1) AS BIGINT) AS u2
       |      FROM dr GROUP BY 1)
       |SELECT key, n_a, n_b, u2,
       |  CASE WHEN n_a > 0 AND n_b > 0 THEN
       |    round(CAST(u2 AS DOUBLE) / (2.0 * CAST(n_a * n_b AS DOUBLE)), 6)
       |  END AS auc
       |FROM a""".stripMargin

  /** Seasonal strength: one-way-ANOVA η² of the value against
    * hour-of-day and against day-of-week (Monday = 0), per key — the
    * variance fraction the calendar explains. See
    * [[graft.stats.StatsOps.seasonalStrength]] for the exact-integer
    * floored-division discipline. */
  def qSeasonalStrength(spark: SparkSession, dir: String): DataFrame = {
    val pts = points(spark, dir)
    val hour = expr(s"(t % $DAY) div $HOUR")
    val dow = expr(s"(t div $DAY + 3) % 7")
    StatsOps.seasonalStrength(pts, hour)
      .withColumn("cycle", lit("hour_of_day"))
      .unionByName(StatsOps.seasonalStrength(pts, dow)
        .withColumn("cycle", lit("day_of_week")))
      .select(col("key"), col("cycle"), col("n"), col("n_bins"),
        col("eta2"))
  }

  val sqlSeasonalStrength: String =
    s"""WITH pts AS (
       |  SELECT event_type AS key, epoch_us(ts) AS t, max(value) AS v
       |  FROM events GROUP BY 1, 2),
       |q AS (
       |  SELECT 'hour_of_day' AS cycle, key, (t % $DAY) // $HOUR AS b,
       |         CAST(floor(v * 1000 + 0.5) AS BIGINT) AS x
       |  FROM pts WHERE v IS NOT NULL
       |  UNION ALL
       |  SELECT 'day_of_week', key, (t // $DAY + 3) % 7,
       |         CAST(floor(v * 1000 + 0.5) AS BIGINT)
       |  FROM pts WHERE v IS NOT NULL),
       |bins AS (SELECT cycle, key, b, count(*) AS nh, sum(x) AS sh,
       |           sum(x * x) AS sxxh
       |         FROM q GROUP BY 1, 2, 3),
       |bt AS (SELECT *, (CAST(abs(sh) AS HUGEINT) * abs(sh)) // nh AS bh
       |       FROM bins),
       |agg AS (SELECT cycle, key, CAST(sum(nh) AS BIGINT) AS n, count(*) AS n_bins,
       |          sum(sh) AS s, sum(sxxh) AS sxx, sum(bh) AS bsum
       |        FROM bt GROUP BY 1, 2)
       |SELECT key, cycle, n, n_bins,
       |  CASE WHEN n_bins >= 2
       |        AND CAST(CAST(n AS HUGEINT) * sxx - s * s AS DOUBLE) > 0
       |    THEN round(CAST(CAST(n AS HUGEINT) * bsum - s * s AS DOUBLE)
       |             / CAST(CAST(n AS HUGEINT) * sxx - s * s AS DOUBLE), 6)
       |  END AS eta2
       |FROM agg""".stripMargin

  /** Turning-points randomness test per key: count of strict local
    * extrema of the quantized value sequence, with the i.i.d.-null
    * expectation 2(n−2)/3 and z-score. See
    * [[graft.stats.StatsOps.turningPoints]]. */
  def qTurningPoints(spark: SparkSession, dir: String): DataFrame =
    StatsOps.turningPoints(points(spark, dir))
      .select(col("key"), col("n"), col("n_tp"), col("e_tp"), col("z"))

  val sqlTurningPoints: String =
    """WITH pts AS (
      |  SELECT event_type AS key, epoch_us(ts) AS t, max(value) AS v
      |  FROM events GROUP BY 1, 2),
      |q AS (SELECT key, t, CAST(floor(v * 1000 + 0.5) AS BIGINT) AS x
      |      FROM pts WHERE v IS NOT NULL),
      |l AS (SELECT key, x,
      |        lag(x) OVER (PARTITION BY key ORDER BY t) AS p,
      |        lead(x) OVER (PARTITION BY key ORDER BY t) AS f
      |      FROM q),
      |a AS (SELECT key, count(*) AS n,
      |        count(CASE WHEN (p < x AND f < x) OR (p > x AND f > x)
      |              THEN 1 END) AS n_tp
      |      FROM l GROUP BY 1)
      |SELECT key, n, n_tp,
      |  CASE WHEN n >= 3
      |    THEN round(2.0 * (CAST(n AS DOUBLE) - 2.0) / 3.0, 6) END AS e_tp,
      |  CASE WHEN n >= 3
      |    THEN round((CAST(n_tp AS DOUBLE)
      |                - 2.0 * (CAST(n AS DOUBLE) - 2.0) / 3.0)
      |              / sqrt((16.0 * CAST(n AS DOUBLE) - 29.0) / 90.0), 6)
      |  END AS z
      |FROM a""".stripMargin

  /** Cramér–von Mises drift between the two halves — the integral
    * counterpart of q195's KS supremum (sensitive to broad CDF
    * differences, not the single worst point). */
  def qCvmDrift(spark: SparkSession, dir: String): DataFrame = {
    val pts = points(spark, dir)
    val (tmin, tmax) = eventBounds(spark, dir)
    graft.stats.TwoSample.cvm(pts, lit((tmin + tmax) / 2))
      .select(col("key"), col("n_a"), col("n_b"), col("t_stat"))
  }

  val sqlCvmDrift: String =
    s"""$sqlHistAB,
       |st AS (SELECT key, na, nb,
       |        CAST(ca + cb AS HUGEINT)
       |          * ((cca * nb - ccb * na) * (cca * nb - ccb * na)) AS sterm
       |       FROM cum),
       |a AS (SELECT key, CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b, sum(sterm) AS s
       |      FROM st GROUP BY 1)
       |SELECT key, n_a, n_b,
       |  CASE WHEN n_a > 0 AND n_b > 0 THEN
       |    round(CAST(s AS DOUBLE)
       |          / (CAST(n_a * n_b AS DOUBLE)
       |             * (CAST(n_a + n_b AS DOUBLE)
       |                * CAST(n_a + n_b AS DOUBLE))), 6)
       |  END AS t_stat
       |FROM a""".stripMargin

  /** Wasserstein-1 (earth-mover) drift between the two halves, in
    * original value units — "how far did the distribution move". */
  def qWassersteinDrift(spark: SparkSession, dir: String): DataFrame = {
    val pts = points(spark, dir)
    val (tmin, tmax) = eventBounds(spark, dir)
    graft.stats.TwoSample.wasserstein1(pts, lit((tmin + tmax) / 2))
      .select(col("key"), col("n_a"), col("n_b"), col("w1"))
  }

  val sqlWassersteinDrift: String =
    s"""$sqlHistAB,
       |g AS (SELECT key, na, nb, cca, ccb,
       |        lead(x) OVER (PARTITION BY key ORDER BY x) - x AS gap
       |      FROM cum),
       |st AS (SELECT key, na, nb,
       |        CASE WHEN gap IS NOT NULL
       |          THEN CAST(abs(cca * nb - ccb * na) AS HUGEINT) * gap
       |          ELSE 0 END AS wterm
       |       FROM g),
       |a AS (SELECT key, CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b, sum(wterm) AS s
       |      FROM st GROUP BY 1)
       |SELECT key, n_a, n_b,
       |  CASE WHEN n_a > 0 AND n_b > 0 THEN
       |    round(CAST(s AS DOUBLE) / (CAST(n_a * n_b AS DOUBLE) * 1000.0), 6)
       |  END AS w1
       |FROM a""".stripMargin

  /** Pettitt changepoint test per key: the Mann–Whitney statistic
    * maximized over every time split (exact doubled-midrank integers),
    * with the earliest argmax time and the significance exponent. See
    * [[graft.stats.TwoSample.pettitt]]. */
  def qPettitt(spark: SparkSession, dir: String): DataFrame =
    graft.stats.TwoSample.pettitt(points(spark, dir))
      .select(col("key"), col("n"), col("k_stat"), col("cp_t"),
        col("p_exponent"))

  val sqlPettitt: String =
    """WITH pts AS (
      |  SELECT event_type AS key, epoch_us(ts) AS t, max(value) AS v
      |  FROM events GROUP BY 1, 2),
      |q AS (SELECT key, t, CAST(floor(v * 1000 + 0.5) AS BIGINT) AS x
      |      FROM pts WHERE v IS NOT NULL),
      |r AS (SELECT key, t, x,
      |        2 * (rank() OVER (PARTITION BY key ORDER BY x) - 1)
      |          + count(*) OVER (PARTITION BY key, x) + 1 AS dr,
      |        count(*) OVER (PARTITION BY key) AS n,
      |        row_number() OVER (PARTITION BY key ORDER BY t) AS i
      |      FROM q),
      |u AS (SELECT key, t, n, i,
      |        sum(dr) OVER (PARTITION BY key ORDER BY t
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |          - i * (n + 1) AS uu
      |      FROM r),
      |a AS (SELECT key, max(n) AS n, CAST(max(abs(uu)) AS BIGINT) AS k_stat
      |      FROM u WHERE i < n GROUP BY 1),
      |c AS (SELECT u.key, min(u.t) AS cp_t
      |      FROM u JOIN a ON u.key = a.key AND abs(u.uu) = a.k_stat
      |      WHERE u.i < u.n GROUP BY 1)
      |SELECT a.key, a.n, a.k_stat, c.cp_t,
      |  CASE WHEN a.n >= 2 THEN
      |    round(-6.0 * (CAST(a.k_stat AS DOUBLE) * CAST(a.k_stat AS DOUBLE))
      |          / (CAST(a.n AS DOUBLE) * CAST(a.n AS DOUBLE)
      |               * CAST(a.n AS DOUBLE)
      |             + CAST(a.n AS DOUBLE) * CAST(a.n AS DOUBLE)), 6)
      |  END AS p_exponent
      |FROM a JOIN c ON a.key = c.key""".stripMargin

  /** Product-quantization vector search (Jégou et al. 2011): train 8
    * subspace codebooks (32 codes, 2 Lloyd iterations) on the 1e-4
    * integer grid, encode the corpus to 8 codes/vector, answer the 5
    * lowest-id queries by exact-integer ADC, and report recall@10 both
    * for the raw code scan (recall_adc) and for the production serving
    * shape — ADC top-200 shortlist (10% of the sf0.1 corpus) + exact re-rank (recall_rr) — against
    * the exact L2 ground truth on the same grid. Every assignment/
    * distance/rank is an exact long (see [[graft.ann.Pq]]), so the
    * DuckDB replay retrains the identical codebooks. */
  def qPqRecall(spark: SparkSession, dir: String): DataFrame = {
    val emb = embeddings(spark, dir)
    val books = graft.ann.Pq.train(emb, m = 8, subDim = 8, k = 32,
      iters = 2)
    val codes = graft.ann.Pq.encode(emb, books, m = 8, subDim = 8)
    val queries = emb.filter(col("vec_id") < 5)
    // ONE corpus code scan serves both answers: the plain-ADC top-10 is
    // the rank <= 10 prefix of the 200-candidate shortlist (same
    // ordering), and the re-rank runs on the shortlist's (q_id, n_id)
    val short = graft.ann.Pq.adcTopK(codes, books, queries, k = 200,
      m = 8, subDim = 8)
    val adc = short.filter(col("rank") <= 10)
    val rr = graft.ann.Pq.rerankTopK(short.select(col("q_id"), col("n_id")),
      queries, emb, k = 10)
    val exact = graft.ann.Pq.bruteForceL2TopK(emb, queries, 10)
    Ann.recallAtK(adc, exact)
      .select(col("q_id"), round(col("recall"), 6).as("recall_adc"))
      .join(Ann.recallAtK(rr, exact)
        .select(col("q_id"), round(col("recall"), 6).as("recall_rr")),
        Seq("q_id"))
  }

  /** DuckDB replay of [[qPqRecall]]: quantize to the 1e-4 grid, seed
    * each subspace's 32 codes with the 32 lowest-id subvectors, run the
    * same 2 Lloyd iterations (exact long distances, floor(avg+0.5)
    * means, empty codes keep their centroid), encode, ADC, and compare
    * with brute-force L2 on the same grid — all integer-exact, so this
    * is a bit-identical retrain, not an approximation. Iteration CTEs
    * are generated so the count lives in one place. */
  val sqlPqRecall: String = {
    val (iters, m, sd, k, dim) = (2, 8, 8, 32, 64)
    require(m * sd == dim)
    val iterCtes = (0 until iters).map { n =>
      s"""d$n AS (
         |  SELECT q.vec_id, q.sub, c.code,
         |         sum((q.xq - c.cq) * (q.xq - c.cq)) AS d
         |  FROM qv q JOIN c$n c ON q.sub = c.sub AND q.pos = c.pos
         |  GROUP BY 1, 2, 3),
         |asg$n AS (
         |  SELECT vec_id, sub, code FROM d$n
         |  QUALIFY row_number() OVER (PARTITION BY vec_id, sub
         |    ORDER BY d ASC, code ASC) = 1),
         |mv$n AS (
         |  SELECT a.sub, a.code, q.pos,
         |         CAST(floor(avg(q.xq) + 0.5) AS BIGINT) AS cq
         |  FROM asg$n a JOIN qv q ON q.vec_id = a.vec_id AND q.sub = a.sub
         |  GROUP BY 1, 2, 3),
         |c${n + 1} AS (
         |  SELECT p.sub, p.code, p.pos, coalesce(v.cq, p.cq) AS cq
         |  FROM c$n p LEFT JOIN mv$n v
         |    ON p.sub = v.sub AND p.code = v.code AND p.pos = v.pos)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH qv AS (
       |  SELECT vec_id, (d.i - 1) // $sd AS sub, (d.i - 1) % $sd AS pos,
       |    CAST(floor(embedding[d.i]::DOUBLE * 10000 + 0.5) AS BIGINT) AS xq
       |  FROM embeddings, unnest(generate_series(1, $dim)) d(i)),
       |c0 AS (
       |  SELECT sub, r - 1 AS code, pos, xq AS cq FROM (
       |    SELECT sub, pos, xq,
       |      row_number() OVER (PARTITION BY sub, pos ORDER BY vec_id) AS r
       |    FROM qv)
       |  WHERE r <= $k),
       |$iterCtes,
       |dF AS (
       |  SELECT q.vec_id, q.sub, c.code,
       |         sum((q.xq - c.cq) * (q.xq - c.cq)) AS d
       |  FROM qv q JOIN c$iters c ON q.sub = c.sub AND q.pos = c.pos
       |  GROUP BY 1, 2, 3),
       |asgF AS (
       |  SELECT vec_id, sub, code FROM dF
       |  QUALIFY row_number() OVER (PARTITION BY vec_id, sub
       |    ORDER BY d ASC, code ASC) = 1),
       |lut AS (
       |  SELECT vec_id AS q_id, sub, code, d AS dq FROM dF
       |  WHERE vec_id < 5),
       |cand AS (
       |  SELECT l.q_id, a.vec_id AS n_id,
       |    row_number() OVER (PARTITION BY l.q_id
       |      ORDER BY sum(l.dq) ASC, a.vec_id ASC) AS r
       |  FROM asgF a JOIN lut l ON a.sub = l.sub AND a.code = l.code
       |  WHERE a.vec_id <> l.q_id
       |  GROUP BY 1, 2
       |  QUALIFY r <= 200),
       |adc AS (SELECT q_id, n_id FROM cand WHERE r <= 10),
       |rr AS (
       |  SELECT c.q_id, c.n_id
       |  FROM cand c
       |  JOIN qv q ON q.vec_id = c.q_id
       |  JOIN qv n ON n.vec_id = c.n_id AND n.sub = q.sub AND n.pos = q.pos
       |  GROUP BY 1, 2
       |  QUALIFY row_number() OVER (PARTITION BY c.q_id
       |    ORDER BY sum((q.xq - n.xq) * (q.xq - n.xq)) ASC,
       |             c.n_id ASC) <= 10),
       |bf AS (
       |  SELECT q.vec_id AS q_id, n.vec_id AS n_id
       |  FROM qv q JOIN qv n ON q.sub = n.sub AND q.pos = n.pos
       |  WHERE q.vec_id < 5 AND q.vec_id <> n.vec_id
       |  GROUP BY 1, 2
       |  QUALIFY row_number() OVER (PARTITION BY q.vec_id
       |    ORDER BY sum((q.xq - n.xq) * (q.xq - n.xq)) ASC,
       |             n.vec_id ASC) <= 10)
       |SELECT bf.q_id,
       |  round(CAST(sum(CASE WHEN a.n_id IS NOT NULL THEN 1 ELSE 0 END)
       |          AS DOUBLE) / count(*), 6) AS recall_adc,
       |  round(CAST(sum(CASE WHEN r.n_id IS NOT NULL THEN 1 ELSE 0 END)
       |          AS DOUBLE) / count(*), 6) AS recall_rr
       |FROM bf
       |LEFT JOIN adc a ON bf.q_id = a.q_id AND bf.n_id = a.n_id
       |LEFT JOIN rr r ON bf.q_id = r.q_id AND bf.n_id = r.n_id
       |GROUP BY 1""".stripMargin
  }

  /** Granger-lite lead-lag attribution click -> view on the hourly
    * count grid: ΔR² of adding click's previous hour to the view-rate
    * AR(1) — the directional information gain on top of q134's phase
    * alignment. */
  def qGrangerLite(spark: SparkSession, dir: String): DataFrame =
    graft.events.Correlation.grangerLite(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_type").as("key"), tsUs.as("t")),
      keyA = "click", keyB = "view", binUs = HOUR, minBins = 8)

  val sqlGrangerLite: String =
    """WITH e AS (SELECT event_type, epoch_us(ts) // 3600000000 AS b
      |           FROM events WHERE event_type IN ('click', 'view')),
      |c AS (SELECT event_type, b, CAST(count(*) AS HUGEINT) AS c
      |      FROM e GROUP BY 1, 2),
      |tri AS (
      |  SELECT y.c AS y, y1.c AS x1, a.c AS x2
      |  FROM (SELECT b, c FROM c WHERE event_type = 'view') y
      |  JOIN (SELECT b + 1 AS b1, c FROM c WHERE event_type = 'view') y1
      |    ON y.b = y1.b1
      |  JOIN (SELECT b + 1 AS b2, c FROM c WHERE event_type = 'click') a
      |    ON y.b = a.b2),
      |s AS (SELECT count(*) AS n_bins, sum(y) AS sy, sum(x1) AS s1,
      |        sum(x2) AS s2, sum(y * y) AS syy, sum(x1 * x1) AS s11,
      |        sum(x2 * x2) AS s22, sum(y * x1) AS sy1, sum(y * x2) AS sy2,
      |        sum(x1 * x2) AS s12
      |      FROM tri),
      |v AS (SELECT n_bins,
      |        CAST(n_bins * syy - sy * sy AS DOUBLE) AS vy,
      |        CAST(n_bins * s11 - s1 * s1 AS DOUBLE) AS v1,
      |        CAST(n_bins * s22 - s2 * s2 AS DOUBLE) AS v2,
      |        CAST(n_bins * sy1 - sy * s1 AS DOUBLE) AS c01,
      |        CAST(n_bins * sy2 - sy * s2 AS DOUBLE) AS c02,
      |        CAST(n_bins * s12 - s1 * s2 AS DOUBLE) AS c12
      |      FROM s),
      |r AS (SELECT n_bins, vy, v1, v2,
      |        c01 / sqrt(vy * v1) AS ra,
      |        c02 / sqrt(vy * v2) AS rl,
      |        c12 / sqrt(v1 * v2) AS rc
      |      FROM v)
      |SELECT n_bins,
      |  CASE WHEN ok THEN round(ra, 6) END AS r_auto,
      |  CASE WHEN ok THEN round(rl, 6) END AS r_lead,
      |  CASE WHEN ok THEN round(rc, 6) END AS r_collin,
      |  CASE WHEN ok THEN round(ra * ra, 6) END AS r2_restricted,
      |  CASE WHEN ok THEN round((ra * ra + rl * rl - 2 * ra * rl * rc)
      |    / (1 - rc * rc), 6) END AS r2_full,
      |  CASE WHEN ok THEN round((ra * ra + rl * rl - 2 * ra * rl * rc)
      |    / (1 - rc * rc) - ra * ra, 6) END AS delta_r2
      |FROM (SELECT *, n_bins >= 8 AND vy > 0 AND v1 > 0 AND v2 > 0
      |        AND (1 - rc * rc) > 0 AS ok FROM r)""".stripMargin

  /** HyperLogLog distinct-user tier per (event_type, day): HOURLY
    * registers max-merged to daily (the lossless continuous-aggregate
    * path — the oracle builds daily registers straight from raw, so a
    * hash match proves merge(hourly) ≡ raw-daily), then the corrected
    * HLL estimate next to the exact distinct count and the relative
    * error the 512-register sketch actually achieved. */
  def qHllTier(spark: SparkSession, dir: String): DataFrame = {
    val e = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_type"), tsUs.as("t"), col("user_id"))
      .withColumn("hour", floor(col("t") / HOUR))
    val hourly = graft.sketch.Hll.registers(
      e, Seq("event_type", "hour"), "user_id")
    val daily = graft.sketch.Hll.merge(
      hourly.withColumn("day", floor(col("hour") / lit(24L))),
      Seq("event_type", "day"))
    val est = graft.sketch.Hll.estimate(daily, Seq("event_type", "day"))
    val exact = e.withColumn("day", floor(col("t") / DAY))
      .groupBy(col("event_type"), col("day"))
      .agg(countDistinct(col("user_id")).as("exact_distinct"))
    est.join(exact, Seq("event_type", "day"))
      .select(col("event_type"), col("day"), col("n_regs"),
        col("est_distinct"), col("exact_distinct"),
        round((col("est_distinct") - col("exact_distinct").cast("double")) /
          col("exact_distinct").cast("double"), 6).as("rel_err"))
  }

  val sqlHllTier: String =
    s"""WITH h AS (
       |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
       |    ('0x' || substr(md5('hll' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
       |      AS h
       |  FROM events WHERE user_id IS NOT NULL),
       |r AS (
       |  SELECT event_type, day, h >> 51 AS idx,
       |    CASE WHEN (h & 2251799813685247) = 0 THEN 52
       |         ELSE 52 - length(bin(h & 2251799813685247)) END AS rho
       |  FROM h),
       |g AS (SELECT event_type, day, idx, max(rho) AS rho
       |      FROM r GROUP BY 1, 2, 3),
       |s AS (SELECT event_type, day, CAST(count(*) AS INT) AS n_regs,
       |        sum(1::BIGINT << (52 - rho)) AS hit
       |      FROM g GROUP BY 1, 2),
       |x AS (SELECT event_type, day, n_regs,
       |        CAST(hit + (512 - n_regs) * (1::BIGINT << 52) AS DOUBLE) AS n,
       |        512 - n_regs AS v
       |      FROM s),
       |e AS (SELECT event_type, day, n_regs,
       |        round(CASE WHEN ${graft.sketch.Hll.EstConst} / n <= 1280
       |                    AND v > 0
       |                   THEN 512 * ln(512 / CAST(v AS DOUBLE))
       |                   ELSE ${graft.sketch.Hll.EstConst} / n END, 6)
       |          AS est_distinct
       |      FROM x),
       |d AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
       |        count(DISTINCT user_id) AS exact_distinct
       |      FROM events GROUP BY 1, 2)
       |SELECT e.event_type, e.day, e.n_regs, e.est_distinct,
       |  d.exact_distinct,
       |  round((e.est_distinct - CAST(d.exact_distinct AS DOUBLE))
       |    / CAST(d.exact_distinct AS DOUBLE), 6) AS rel_err
       |FROM e JOIN d ON e.event_type = d.event_type AND e.day = d.day""".stripMargin

  /** Conditional entropy rate H(X_t|X_{t-1}) of each user's event-type
    * sequence — the information-theoretic summary of the q179 Markov
    * transition table, exact via the quantized-ln (2^20 grid) long
    * algebra the Kleinberg Viterbi (q168) established. */
  def qEntropyRate(spark: SparkSession, dir: String): DataFrame =
    graft.categorical.CategoricalOps.entropyRate(statePoints(spark, dir))

  val sqlEntropyRate: String =
    sqlStatePts +
      """,
        |pr AS (SELECT key, sv AS a,
        |         lead(sv) OVER (PARTITION BY key ORDER BY t) AS b
        |       FROM spts),
        |c AS (SELECT key, a, b, count(*) AS nab
        |      FROM pr WHERE b IS NOT NULL GROUP BY 1, 2, 3),
        |na AS (SELECT key, a, sum(nab) AS na FROM c GROUP BY 1, 2),
        |q AS (SELECT c.key, c.nab, c.nab *
        |        (CAST(floor(ln(CAST(na.na AS DOUBLE)) * 1048576 + 0.5) AS BIGINT)
        |       - CAST(floor(ln(CAST(c.nab AS DOUBLE)) * 1048576 + 0.5) AS BIGINT))
        |          AS qt
        |      FROM c JOIN na ON c.key = na.key AND c.a = na.a),
        |s AS (SELECT key, CAST(sum(nab) AS BIGINT) AS n_transitions, count(*) AS n_bigrams,
        |        sum(qt) AS qsum
        |      FROM q GROUP BY 1)
        |SELECT key, n_transitions, n_bigrams,
        |  round(CAST(qsum AS DOUBLE) / 1048576.0 / CAST(n_transitions AS DOUBLE)
        |    / 0.6931471805599453, 6) AS entropy_bits
        |FROM s""".stripMargin

  /** Allan-variance ladder (τ = 1h, 2h, 4h, 8h) of each event type's
    * per-bin count — the stability-vs-averaging-time fingerprint; the
    * oracle replays the dense-grid pair differences exactly. */
  def qAllanVariance(spark: SparkSession, dir: String): DataFrame =
    graft.events.EventOps.allanVariance(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_type").as("key"), tsUs.as("t")),
      taus = Seq(HOUR, 2 * HOUR, 4 * HOUR, 8 * HOUR))

  val sqlAllanVariance: String =
    """WITH e AS (SELECT event_type AS key, epoch_us(ts) AS t FROM events),
      |tt AS (SELECT unnest([3600000000, 7200000000, 14400000000,
      |                      28800000000]) AS tau),
      |c AS (SELECT e.key, tt.tau, e.t // tt.tau AS b, count(*) AS c
      |      FROM e CROSS JOIN tt GROUP BY 1, 2, 3),
      |bd AS (SELECT key, tau, min(b) AS b0, max(b) AS b1 FROM c GROUP BY 1, 2),
      |g AS (SELECT key, tau, unnest(generate_series(b0, b1)) AS b FROM bd),
      |d AS (SELECT g.key, g.tau, g.b, coalesce(c.c, 0) AS c
      |      FROM g LEFT JOIN c ON g.key = c.key AND g.tau = c.tau AND g.b = c.b),
      |p AS (SELECT key, tau, c,
      |        lead(c) OVER (PARTITION BY key, tau ORDER BY b) AS cn
      |      FROM d),
      |s AS (SELECT key, tau, count(*) AS n_pairs,
      |        sum((cn - c) * (cn - c)) AS sd2
      |      FROM p WHERE cn IS NOT NULL GROUP BY 1, 2)
      |SELECT key, tau AS tau_us, n_pairs,
      |  round(CAST(sd2 AS DOUBLE) / (2 * n_pairs), 6) AS avar,
      |  round(sqrt(CAST(sd2 AS DOUBLE) / (2 * n_pairs)), 6) AS adev
      |FROM s""".stripMargin

  /** Hill tail-index of each event type's inter-event gap distribution
    * (top-50 order statistics) — is the gap tail heavy enough that
    * mean-based SLA math breaks? Exact via the quantized-ln long
    * algebra. */
  def qHillTail(spark: SparkSession, dir: String): DataFrame =
    graft.events.EventOps.hillTailIndex(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_type").as("key"), tsUs.as("t")),
      k = 50)

  val sqlHillTail: String =
    """WITH e AS (SELECT event_type AS key, epoch_us(ts) AS t FROM events),
      |g0 AS (SELECT key, t,
      |         t - lag(t) OVER (PARTITION BY key ORDER BY t) AS gap
      |       FROM e),
      |g AS (SELECT key, t, gap FROM g0 WHERE gap > 0),
      |r AS (SELECT key, t, gap,
      |        row_number() OVER (PARTITION BY key
      |          ORDER BY gap DESC, t ASC) AS r,
      |        count(*) OVER (PARTITION BY key) AS n
      |      FROM g),
      |x AS (SELECT key, gap, r, n, least(50, n - 1) AS k
      |      FROM r WHERE n >= 2 AND r <= least(50, n - 1) + 1),
      |thr AS (SELECT key,
      |          CAST(floor(ln(CAST(gap AS DOUBLE)) * 1048576 + 0.5) AS BIGINT)
      |            AS qthr,
      |          k AS ku, n AS nu
      |        FROM x WHERE r = k + 1),
      |s AS (SELECT key,
      |        sum(CAST(floor(ln(CAST(gap AS DOUBLE)) * 1048576 + 0.5)
      |            AS BIGINT)) AS qsum
      |      FROM x WHERE r <= k GROUP BY 1)
      |SELECT s.key, thr.nu AS n_gaps, thr.ku AS k_used,
      |  round(CAST(qsum - ku * qthr AS DOUBLE) / 1048576.0
      |    / CAST(ku AS DOUBLE), 6) AS hill_mean_log,
      |  CASE WHEN qsum - ku * qthr > 0
      |       THEN round(CAST(ku AS DOUBLE) * 1048576.0
      |         / CAST(qsum - ku * qthr AS DOUBLE), 6) END AS tail_index
      |FROM s JOIN thr ON s.key = thr.key""".stripMargin

  /** Daily KL divergence of the event-type mix vs the global mix — the
    * categorical drift complement of q104's value-bin PSI; exact via
    * the quantized-ln long algebra. */
  def qKlMix(spark: SparkSession, dir: String): DataFrame =
    graft.events.EventOps.klMixDrift(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_type").as("key"), tsUs.as("t")),
      binUs = DAY)

  val sqlKlMix: String =
    """WITH e AS (SELECT event_type AS key,
      |             epoch_us(ts) // 86400000000 AS bin
      |           FROM events),
      |c AS (SELECT bin, key, count(*) AS n FROM e GROUP BY 1, 2),
      |nd AS (SELECT bin, sum(n) AS nd FROM c GROUP BY 1),
      |g AS (SELECT key, sum(n) AS g FROM c GROUP BY 1),
      |gt AS (SELECT sum(n) AS gt FROM c),
      |q AS (SELECT c.bin, nd.nd, c.n *
      |        (CAST(floor(ln(CAST(c.n AS DOUBLE)) * 1048576 + 0.5) AS BIGINT)
      |       + CAST(floor(ln(CAST(gt.gt AS DOUBLE)) * 1048576 + 0.5) AS BIGINT)
      |       - CAST(floor(ln(CAST(nd.nd AS DOUBLE)) * 1048576 + 0.5) AS BIGINT)
      |       - CAST(floor(ln(CAST(g.g AS DOUBLE)) * 1048576 + 0.5) AS BIGINT))
      |          AS term
      |      FROM c JOIN nd USING (bin) JOIN g USING (key) CROSS JOIN gt),
      |s AS (SELECT bin, CAST(max(nd) AS BIGINT) AS n_events, count(*) AS n_cats,
      |        sum(term) AS qsum
      |      FROM q GROUP BY 1)
      |SELECT bin, n_events, n_cats,
      |  round(CAST(qsum AS DOUBLE) / 1048576.0 / CAST(n_events AS DOUBLE)
      |    / 0.6931471805599453, 6) AS kl_bits
      |FROM s""".stripMargin

  /** Embedding centroid drift across ingestion batches (vec_id/100):
    * per batch the L2 step from the previous batch's centroid and the
    * excursion from the global centroid — integer-exact on the Pq 1e-4
    * grid. */
  def qCentroidShift(spark: SparkSession, dir: String): DataFrame =
    graft.ann.VectorDrift.centroidShift(
      spark.read.parquet(s"$dir/embeddings.parquet"), batchSize = 100)

  val sqlCentroidShift: String =
    """WITH q AS (SELECT vec_id // 100 AS grp, d.i AS pos,
      |    CAST(floor(CAST(embedding[d.i] AS DOUBLE) * 10000 + 0.5) AS BIGINT)
      |      AS xq
      |  FROM embeddings, unnest(generate_series(1, 64)) d(i)),
      |c AS (SELECT grp, pos, count(*) AS n,
      |        CAST(floor(avg(xq) + 0.5) AS BIGINT) AS m
      |      FROM q GROUP BY 1, 2),
      |nv AS (SELECT grp, max(n) AS n_vecs FROM c GROUP BY 1),
      |g AS (SELECT pos, CAST(floor(avg(xq) + 0.5) AS BIGINT) AS gm
      |      FROM q GROUP BY 1),
      |dprev AS (SELECT a.grp, sum((a.m - b.m) * (a.m - b.m)) AS d2
      |          FROM c a JOIN c b ON b.grp = a.grp - 1 AND b.pos = a.pos
      |          GROUP BY 1),
      |dglob AS (SELECT a.grp, sum((a.m - g.gm) * (a.m - g.gm)) AS d2
      |          FROM c a JOIN g ON g.pos = a.pos GROUP BY 1)
      |SELECT nv.grp AS batch, nv.n_vecs,
      |  round(sqrt(CAST(dprev.d2 AS DOUBLE)) / 10000.0, 6) AS l2_prev,
      |  round(sqrt(CAST(dglob.d2 AS DOUBLE)) / 10000.0, 6) AS l2_global
      |FROM nv LEFT JOIN dprev ON nv.grp = dprev.grp
      |JOIN dglob ON nv.grp = dglob.grp""".stripMargin

  /** Label purity of the embedding space: per label the within-scatter
    * (mean squared member→centroid distance), nearest other centroid
    * and the between/within separation ratio — integer-exact on the
    * 1e-4 grid. */
  def qLabelPurity(spark: SparkSession, dir: String): DataFrame =
    graft.ann.VectorDrift.labelPurity(
      spark.read.parquet(s"$dir/embeddings.parquet"))

  val sqlLabelPurity: String =
    """WITH q AS (SELECT CAST(label AS BIGINT) AS l, vec_id, d.i AS pos,
      |    CAST(floor(CAST(embedding[d.i] AS DOUBLE) * 10000 + 0.5) AS BIGINT)
      |      AS xq
      |  FROM embeddings, unnest(generate_series(1, 64)) d(i)),
      |c AS (SELECT l, pos, CAST(floor(avg(xq) + 0.5) AS BIGINT) AS m
      |      FROM q GROUP BY 1, 2),
      |own AS (SELECT q.l, q.vec_id, sum((q.xq - c.m) * (q.xq - c.m)) AS d2
      |        FROM q JOIN c ON q.l = c.l AND q.pos = c.pos GROUP BY 1, 2),
      |w AS (SELECT l, count(*) AS n_vecs, sum(d2) AS w FROM own GROUP BY 1),
      |p AS (SELECT a.l AS la, b.l AS lb, sum((a.m - b.m) * (a.m - b.m)) AS bd2
      |      FROM c a JOIN c b ON a.pos = b.pos AND a.l <> b.l GROUP BY 1, 2),
      |nr AS (SELECT la, lb, bd2 FROM p
      |       QUALIFY row_number() OVER (PARTITION BY la
      |         ORDER BY bd2 ASC, lb ASC) = 1)
      |SELECT w.l AS label, w.n_vecs,
      |  round(CAST(w.w AS DOUBLE) / w.n_vecs / 1e8, 6) AS mean_sq_within,
      |  nr.lb AS nearest_label,
      |  round(CAST(nr.bd2 AS DOUBLE) / 1e8, 6) AS between_sq,
      |  CASE WHEN w.w > 0 THEN round(CAST(nr.bd2 AS DOUBLE)
      |    / (CAST(w.w AS DOUBLE) / w.n_vecs), 6) END AS separation
      |FROM w JOIN nr ON w.l = nr.la""".stripMargin

  /** Zipf rank-frequency head fit over the documents corpus — natural
    * text reads slope ≈ −1; exact decimal OLS on the quantized-ln
    * grid. */
  def qZipf(spark: SparkSession, dir: String): DataFrame =
    graft.text.LexStats.zipfFit(docs(spark, dir), topR = 1000)

  val sqlZipf: String =
    """WITH f AS (SELECT s AS term, count(*) AS n
      |  FROM (SELECT unnest(regexp_extract_all(text, '\S+')) AS s
      |        FROM documents)
      |  GROUP BY 1),
      |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total_tokens, count(*) AS vocab FROM f),
      |top AS (SELECT term, n FROM f ORDER BY n DESC, term ASC LIMIT 1000),
      |r AS (SELECT row_number() OVER (ORDER BY n DESC, term ASC) AS r, n
      |      FROM top),
      |q AS (SELECT
      |    CAST(CAST(floor(ln(CAST(r AS DOUBLE)) * 1048576 + 0.5) AS BIGINT)
      |      AS HUGEINT) AS x,
      |    CAST(CAST(floor(ln(CAST(n AS DOUBLE)) * 1048576 + 0.5) AS BIGINT)
      |      AS HUGEINT) AS y
      |  FROM r),
      |s AS (SELECT CAST(count(*) AS HUGEINT) AS k, sum(x) AS sx, sum(y) AS sy,
      |        sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
      |      FROM q),
      |v AS (SELECT CAST(k AS BIGINT) AS n_fit,
      |        CAST(k * sxy - sx * sy AS DOUBLE) AS num,
      |        CAST(k * sxx - sx * sx AS DOUBLE) AS den,
      |        CAST(k * syy - sy * sy AS DOUBLE) AS deny
      |      FROM s)
      |SELECT n_fit, tot.total_tokens, tot.vocab,
      |  CASE WHEN den > 0 THEN round(num / den, 6) END AS zipf_slope,
      |  CASE WHEN den > 0 AND deny > 0
      |       THEN round(num * num / (den * deny), 6) END AS zipf_r2
      |FROM v CROSS JOIN tot""".stripMargin

  /** Heaps vocabulary-growth fit at 10 doc-id prefixes — the
    * vocabulary-vs-corpus-size exponent (natural text β ≈ 0.4-0.6);
    * exact decimal OLS on the quantized-ln grid. */
  def qHeaps(spark: SparkSession, dir: String): DataFrame =
    graft.text.LexStats.heapsFit(docs(spark, dir), nCk = 10)

  val sqlHeaps: String =
    """WITH nd AS (SELECT count(*) AS nd FROM documents),
      |t AS (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS term
      |      FROM documents),
      |ck AS (SELECT least(9, (t.doc_id * 10) // nd.nd) AS ck, term
      |       FROM t CROSS JOIN nd),
      |tk AS (SELECT ck, count(*) AS tk FROM ck GROUP BY 1),
      |ft AS (SELECT term, min(ck) AS ck FROM ck GROUP BY 1),
      |ty AS (SELECT ck, count(*) AS ty FROM ft GROUP BY 1),
      |g AS (SELECT coalesce(tk.ck, ty.ck) AS ck, coalesce(tk.tk, 0) AS tk,
      |        coalesce(ty.ty, 0) AS ty
      |      FROM tk FULL JOIN ty ON tk.ck = ty.ck),
      |c AS (SELECT a.ck, sum(b.tk) AS ct, sum(b.ty) AS cy
      |      FROM g a JOIN g b ON b.ck <= a.ck GROUP BY 1
      |      HAVING sum(b.tk) > 0 AND sum(b.ty) > 0),
      |q AS (SELECT
      |    CAST(CAST(floor(ln(CAST(ct AS DOUBLE)) * 1048576 + 0.5) AS BIGINT)
      |      AS HUGEINT) AS x,
      |    CAST(CAST(floor(ln(CAST(cy AS DOUBLE)) * 1048576 + 0.5) AS BIGINT)
      |      AS HUGEINT) AS y
      |  FROM c),
      |s AS (SELECT CAST(count(*) AS HUGEINT) AS k, sum(x) AS sx, sum(y) AS sy,
      |        sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
      |      FROM q),
      |v AS (SELECT CAST(k AS BIGINT) AS n_checkpoints,
      |        CAST(k * sxy - sx * sy AS DOUBLE) AS num,
      |        CAST(k * sxx - sx * sx AS DOUBLE) AS den,
      |        CAST(k * syy - sy * sy AS DOUBLE) AS deny
      |      FROM s),
      |m AS (SELECT CAST(max(ct) AS BIGINT) AS total_tokens, CAST(max(cy) AS BIGINT) AS vocab FROM c)
      |SELECT n_checkpoints, m.total_tokens, m.vocab,
      |  CASE WHEN den > 0 THEN round(num / den, 6) END AS heaps_beta,
      |  CASE WHEN den > 0 AND deny > 0
      |       THEN round(num * num / (den * deny), 6) END AS heaps_r2
      |FROM v CROSS JOIN m""".stripMargin

  /** Binned mutual information click↔view on the hourly count grid —
    * the nonlinear-dependence complement of q203's Granger screen;
    * exact integer histograms + quantized-ln long algebra. */
  def qMutualInfo(spark: SparkSession, dir: String): DataFrame =
    graft.events.Correlation.mutualInfo(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_type").as("key"), tsUs.as("t")),
      keyA = "click", keyB = "view", binUs = HOUR, valueBins = 8)

  val sqlMutualInfo: String =
    """WITH e AS (SELECT event_type, epoch_us(ts) // 3600000000 AS b
      |           FROM events WHERE event_type IN ('click', 'view')),
      |c AS (SELECT event_type, b, count(*) AS c FROM e GROUP BY 1, 2),
      |p AS (SELECT a.c AS ca, v.c AS cb
      |      FROM (SELECT b, c FROM c WHERE event_type = 'click') a
      |      JOIN (SELECT b, c FROM c WHERE event_type = 'view') v USING (b)),
      |bd AS (SELECT min(ca) AS a0, max(ca) AS a1,
      |         min(cb) AS b0, max(cb) AS b1 FROM p),
      |j AS (SELECT ((ca - a0) * 8) // (a1 - a0 + 1) AS x,
      |             ((cb - b0) * 8) // (b1 - b0 + 1) AS y, count(*) AS n
      |      FROM p CROSS JOIN bd GROUP BY 1, 2),
      |mx AS (SELECT x, sum(n) AS m FROM j GROUP BY 1),
      |my AS (SELECT y, sum(n) AS m FROM j GROUP BY 1),
      |cells AS (SELECT j.x, j.y, j.n, mx.m AS nx, my.m AS ny
      |          FROM j JOIN mx USING (x) JOIN my USING (y)),
      |s AS (SELECT sum(n) AS nt, count(*) AS n_cells,
      |        sum(n *
      |          (CAST(floor(ln(CAST(n AS DOUBLE)) * 1048576 + 0.5) AS BIGINT)
      |         - CAST(floor(ln(CAST(nx AS DOUBLE)) * 1048576 + 0.5) AS BIGINT)
      |         - CAST(floor(ln(CAST(ny AS DOUBLE)) * 1048576 + 0.5) AS BIGINT)))
      |          AS qmi0
      |      FROM cells),
      |qx AS (SELECT sum(m *
      |         CAST(floor(ln(CAST(m AS DOUBLE)) * 1048576 + 0.5) AS BIGINT))
      |         AS qx FROM mx),
      |qy AS (SELECT sum(m *
      |         CAST(floor(ln(CAST(m AS DOUBLE)) * 1048576 + 0.5) AS BIGINT))
      |         AS qy FROM my),
      |v AS (SELECT nt, n_cells,
      |        CAST(qmi0 + nt *
      |          CAST(floor(ln(CAST(nt AS DOUBLE)) * 1048576 + 0.5) AS BIGINT)
      |          AS DOUBLE) / 1048576.0 / CAST(nt AS DOUBLE)
      |          / 0.6931471805599453 AS mi,
      |        CAST(nt *
      |          CAST(floor(ln(CAST(nt AS DOUBLE)) * 1048576 + 0.5) AS BIGINT)
      |          - qx AS DOUBLE) / 1048576.0 / CAST(nt AS DOUBLE)
      |          / 0.6931471805599453 AS ha,
      |        CAST(nt *
      |          CAST(floor(ln(CAST(nt AS DOUBLE)) * 1048576 + 0.5) AS BIGINT)
      |          - qy AS DOUBLE) / 1048576.0 / CAST(nt AS DOUBLE)
      |          / 0.6931471805599453 AS hb
      |      FROM s CROSS JOIN qx CROSS JOIN qy)
      |SELECT CAST(nt AS BIGINT) AS n_bins, n_cells, round(mi, 6) AS mi_bits,
      |  round(ha, 6) AS h_a, round(hb, 6) AS h_b,
      |  CASE WHEN least(ha, hb) > 0
      |       THEN round(mi / least(ha, hb), 6) END AS nmi
      |FROM v""".stripMargin

  /** Top-20 trigram motifs by second-order lift over the Markov-1
    * baseline — which state patterns carry structure the transition
    * table can't see; exact counts, one division per row. */
  def qMotifSurprise(spark: SparkSession, dir: String): DataFrame =
    graft.categorical.CategoricalOps.motifSurprise(
      statePoints(spark, dir), k = 20, minN = 5)

  val sqlMotifSurprise: String =
    sqlStatePts +
      """,
        |tri AS (SELECT a, b, c, count(*) AS n_abc
        |        FROM (SELECT sv AS a,
        |                lead(sv, 1) OVER (PARTITION BY key ORDER BY t) AS b,
        |                lead(sv, 2) OVER (PARTITION BY key ORDER BY t) AS c
        |              FROM spts)
        |        WHERE b IS NOT NULL AND c IS NOT NULL GROUP BY 1, 2, 3),
        |bi AS (SELECT from_state, to_state, count(*) AS n
        |       FROM (SELECT sv AS from_state,
        |               lead(sv) OVER (PARTITION BY key ORDER BY t) AS to_state
        |             FROM spts)
        |       WHERE to_state IS NOT NULL GROUP BY 1, 2),
        |uni AS (SELECT from_state AS ub, CAST(sum(n) AS BIGINT) AS n_b FROM bi GROUP BY 1)
        |SELECT tri.a, tri.b, tri.c, tri.n_abc, ab.n AS n_ab, bc.n AS n_bc,
        |  uni.n_b,
        |  round(CAST(tri.n_abc * uni.n_b AS DOUBLE)
        |    / CAST(ab.n * bc.n AS DOUBLE), 6) AS lift
        |FROM tri
        |JOIN bi ab ON ab.from_state = tri.a AND ab.to_state = tri.b
        |JOIN bi bc ON bc.from_state = tri.b AND bc.to_state = tri.c
        |JOIN uni ON uni.ub = tri.b
        |WHERE tri.n_abc >= 5
        |ORDER BY lift DESC, tri.a, tri.b, tri.c LIMIT 20""".stripMargin

  /** Weekly rolling click↔view correlation on the hourly count grid
    * plus the deviation from the all-time r — does the coupling hold,
    * decay or flip over the span; exact long statistics per bucket. */
  def qRollingCorr(spark: SparkSession, dir: String): DataFrame =
    graft.events.Correlation.rollingCorr(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_type").as("key"), tsUs.as("t")),
      keyA = "click", keyB = "view", binUs = HOUR, bucketBins = 168L,
      minBins = 8)

  val sqlRollingCorr: String =
    """WITH e AS (SELECT event_type, epoch_us(ts) // 3600000000 AS b
      |           FROM events WHERE event_type IN ('click', 'view')),
      |c AS (SELECT event_type, b, count(*) AS c FROM e GROUP BY 1, 2),
      |p AS (SELECT a.b // 168 AS bucket, a.c AS x, v.c AS y
      |      FROM (SELECT b, c FROM c WHERE event_type = 'click') a
      |      JOIN (SELECT b, c FROM c WHERE event_type = 'view') v USING (b)),
      |s AS (SELECT bucket, count(*) AS n_bins, sum(x) AS sx, sum(y) AS sy,
      |        sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
      |      FROM p GROUP BY 1),
      |g AS (SELECT count(*) AS n_bins, sum(x) AS sx, sum(y) AS sy,
      |        sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
      |      FROM p),
      |rb AS (SELECT bucket, n_bins,
      |        CASE WHEN n_bins >= 8
      |              AND CAST(n_bins AS DOUBLE) * CAST(sxx AS DOUBLE)
      |                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
      |              AND CAST(n_bins AS DOUBLE) * CAST(syy AS DOUBLE)
      |                - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
      |             THEN (CAST(n_bins AS DOUBLE) * CAST(sxy AS DOUBLE)
      |                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |               / sqrt((CAST(n_bins AS DOUBLE) * CAST(sxx AS DOUBLE)
      |                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |                * (CAST(n_bins AS DOUBLE) * CAST(syy AS DOUBLE)
      |                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) END AS r
      |       FROM s),
      |rg AS (SELECT CASE WHEN n_bins >= 8
      |              AND CAST(n_bins AS DOUBLE) * CAST(sxx AS DOUBLE)
      |                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
      |              AND CAST(n_bins AS DOUBLE) * CAST(syy AS DOUBLE)
      |                - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
      |             THEN (CAST(n_bins AS DOUBLE) * CAST(sxy AS DOUBLE)
      |                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |               / sqrt((CAST(n_bins AS DOUBLE) * CAST(sxx AS DOUBLE)
      |                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |                * (CAST(n_bins AS DOUBLE) * CAST(syy AS DOUBLE)
      |                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) END AS rg
      |       FROM g)
      |SELECT bucket, n_bins, round(r, 6) AS r, round(rg, 6) AS r_overall,
      |  round(r - rg, 6) AS dr
      |FROM rb CROSS JOIN rg""".stripMargin

  /** Normalized spectral entropy of each user's Lomb–Scargle ladder —
    * is the rhythm concentrated in one period or spread flat; exact
    * integer lift of the rounded powers + quantized-ln algebra. */
  def qSpectralEntropy(spark: SparkSession, dir: String): DataFrame =
    graft.stats.Spectral.spectralEntropy(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("user_id").as("key"), tsUs.as("t"), col("value").as("v")),
      periodsUs = Seq(6 * HOUR, 12 * HOUR, DAY, 3 * DAY, 7 * DAY),
      minPoints = 16)
      .select(col("key").as("user_id"), col("n_periods"),
        col("spectral_entropy_bits"), col("flatness"))

  val sqlSpectralEntropy: String =
    sqlLombChain + ",\npw AS (SELECT user_id, " + lsPowerCase +
      " AS power FROM f),\n" +
      """pq AS (SELECT user_id,
        |         CAST(floor(power * 1000000 + 0.5) AS BIGINT) AS pq
        |       FROM pw WHERE power IS NOT NULL
        |         AND CAST(floor(power * 1000000 + 0.5) AS BIGINT) > 0),
        |g AS (SELECT user_id, count(*) AS n_periods, sum(pq) AS s,
        |        sum(pq * CAST(floor(ln(CAST(pq AS DOUBLE)) * 1048576 + 0.5)
        |            AS BIGINT)) AS sq
        |      FROM pq GROUP BY 1),
        |h AS (SELECT user_id, n_periods, s,
        |        CAST(s * CAST(floor(ln(CAST(s AS DOUBLE)) * 1048576 + 0.5)
        |            AS BIGINT) - sq AS DOUBLE) AS hnum
        |      FROM g)
        |SELECT user_id, n_periods,
        |  round(hnum / 1048576.0 / CAST(s AS DOUBLE) / 0.6931471805599453, 6)
        |    AS spectral_entropy_bits,
        |  CASE WHEN n_periods >= 2 THEN round(hnum / CAST(s AS DOUBLE)
        |    / CAST(CAST(floor(ln(CAST(n_periods AS DOUBLE)) * 1048576 + 0.5)
        |        AS BIGINT) AS DOUBLE), 6) END AS flatness
        |FROM h""".stripMargin

  /** Top-10 trending terms per ingestion day (doc_id/50) by burst lift
    * over their trailing-7-day baseline; brand-new terms rank first. */
  def qTrendingTerms(spark: SparkSession, dir: String): DataFrame =
    graft.text.LexStats.trendingTerms(docs(spark, dir),
      dayCol = floor(col("doc_id") / 50), k = 10, window = 7, minN = 5)

  val sqlTrendingTerms: String =
    """WITH c AS (SELECT doc_id // 50 AS day, s AS term, count(*) AS n
      |  FROM (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS s
      |        FROM documents)
      |  GROUP BY 1, 2),
      |b AS (SELECT c.term AS bt, c.day + o.off AS day, CAST(sum(c.n) AS BIGINT) AS n_base
      |      FROM c CROSS JOIN
      |        (SELECT unnest(generate_series(1, 7)) AS off) o
      |      GROUP BY 1, 2),
      |s AS (SELECT c.day, c.term, c.n AS n_today,
      |        coalesce(b.n_base, 0) AS n_base,
      |        CASE WHEN b.n_base IS NOT NULL
      |             THEN round(CAST(c.n * 7 AS DOUBLE)
      |               / CAST(b.n_base AS DOUBLE), 6) END AS lift
      |      FROM c LEFT JOIN b ON b.bt = c.term AND b.day = c.day
      |      WHERE c.n >= 5),
      |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY day
      |        ORDER BY lift DESC NULLS FIRST, term ASC) AS INT) AS term_rank
      |      FROM s)
      |SELECT day, term, n_today, n_base, lift, term_rank
      |FROM r WHERE term_rank <= 10""".stripMargin

  /** Typed profile of the events' JSON props.k attribute per event
    * type — extraction + exact integer stats with missing-value
    * accounting (all-missing keys still surface). */
  def qJsonProfile(spark: SparkSession, dir: String): DataFrame =
    graft.events.EventOps.jsonAttrProfile(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_type").as("key"), col("props")))
      .withColumnRenamed("key", "event_type")

  val sqlJsonProfile: String =
    """WITH x AS (SELECT event_type AS key,
      |    CASE WHEN regexp_matches(json_extract_string(props, '$.k'),
      |                             '^-?[0-9]+$')
      |         THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
      |    END AS v
      |  FROM events),
      |m AS (SELECT key, count(*) AS nm FROM x WHERE v IS NULL GROUP BY 1),
      |g AS (SELECT key, v, count(*) AS n FROM x WHERE v IS NOT NULL
      |      GROUP BY 1, 2),
      |a AS (SELECT key, CAST(sum(n) AS BIGINT) AS n_events, count(*) AS n_distinct,
      |        sum(v * n) AS sv, min(v) AS min_v, max(v) AS max_v
      |      FROM g GROUP BY 1),
      |md AS (SELECT key, v AS mode_v, n AS n_mode FROM g
      |       QUALIFY row_number() OVER (PARTITION BY key
      |         ORDER BY n DESC, v ASC) = 1),
      |am AS (SELECT a.key, a.n_events, a.n_distinct, a.sv, a.min_v,
      |         a.max_v, md.mode_v, md.n_mode
      |       FROM a JOIN md ON a.key = md.key)
      |SELECT coalesce(am.key, m.key) AS event_type,
      |  coalesce(am.n_events, 0) AS n_events,
      |  coalesce(m.nm, 0) AS n_missing,
      |  coalesce(am.n_distinct, 0) AS n_distinct,
      |  am.mode_v, am.n_mode,
      |  round(CAST(am.sv AS DOUBLE) / am.n_events, 6) AS mean_v,
      |  am.min_v, am.max_v
      |FROM am FULL JOIN m ON am.key = m.key""".stripMargin

  /** Theta-sketch difference per day: estimated click-only users
    * (|click \ view|) from the same KMV sketches as q114 — the set
    * algebra's third operation. */
  def qKmvDifference(spark: SparkSession, dir: String): DataFrame = {
    val k = 32
    val e = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_type"), tsUs.as("t"), col("user_id"))
      .withColumn("day", floor(col("t") / DAY))
    def side(et: String) = graft.sketch.Kmv.sketch(
      e.filter(col("event_type") === et), Seq("day"), "user_id", k)
    graft.sketch.Kmv.differenceEstimate(side("click"), side("view"),
      Seq("day"), k)
      .select(col("day"), col("n_only"), col("est_only"))
  }

  val sqlKmvDifference: String =
    """WITH e AS (
      |  SELECT DISTINCT event_type, epoch_us(ts) // 86400000000 AS day,
      |    ('0x' || substr(md5('kmv' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
      |      AS h
      |  FROM events WHERE event_type IN ('click', 'view')),
      |r AS (
      |  SELECT event_type, day, h,
      |    row_number() OVER (PARTITION BY event_type, day ORDER BY h) AS rn
      |  FROM e),
      |s AS (SELECT event_type, day, h FROM r WHERE rn <= 32),
      |th AS (SELECT event_type, day, count(*) AS n, max(h) AS hk
      |       FROM s GROUP BY 1, 2),
      |t2 AS (
      |  SELECT a.day,
      |    least(CASE WHEN a.n < 32 THEN 9223372036854775807 ELSE a.hk END,
      |          CASE WHEN b.n IS NULL OR b.n < 32
      |               THEN 9223372036854775807 ELSE b.hk END)
      |      AS theta
      |  FROM (SELECT day, n, hk FROM th WHERE event_type = 'click') a
      |  LEFT JOIN (SELECT day, n, hk FROM th WHERE event_type = 'view') b
      |    ON a.day = b.day),
      |c AS (
      |  SELECT sa.day, count(*) AS no
      |  FROM s sa
      |  JOIN t2 ON t2.day = sa.day AND sa.h < t2.theta
      |  WHERE sa.event_type = 'click'
      |    AND NOT EXISTS (SELECT 1 FROM s sb WHERE sb.day = sa.day
      |                    AND sb.event_type = 'view' AND sb.h = sa.h)
      |  GROUP BY 1)
      |SELECT t2.day, coalesce(c.no, 0) AS n_only,
      |  CASE WHEN t2.theta = 9223372036854775807
      |       THEN CAST(coalesce(c.no, 0) AS DOUBLE)
      |       ELSE round(coalesce(c.no, 0) * 1152921504606846976.0 / t2.theta, 6)
      |  END AS est_only
      |FROM t2 LEFT JOIN c USING (day)""".stripMargin

  /** The 20 most document-concentrated frequent terms — the term-level
    * boilerplate screen (low df/tf, high single-doc share). */
  def qTermDispersion(spark: SparkSession, dir: String): DataFrame =
    graft.text.LexStats.termDispersion(docs(spark, dir), k = 20, minTf = 50)

  val sqlTermDispersion: String =
    """WITH pd AS (SELECT doc_id, s AS term, count(*) AS n
      |  FROM (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS s
      |        FROM documents)
      |  GROUP BY 1, 2),
      |t AS (SELECT term, CAST(sum(n) AS BIGINT) AS tf, count(*) AS df,
      |        max(n) AS max_in_doc
      |      FROM pd GROUP BY 1 HAVING sum(n) >= 50)
      |SELECT term, tf, df, max_in_doc,
      |  round(CAST(df AS DOUBLE) / tf, 6) AS doc_rate,
      |  round(CAST(max_in_doc AS DOUBLE) / tf, 6) AS top_share
      |FROM t ORDER BY doc_rate ASC, term ASC LIMIT 20""".stripMargin

  /** Streaming-face driver row (round-4 verdict #8): the HLL register
    * tier computed BY THE STRUCTURED-STREAMING PATH — events read as a
    * bounded file stream, [[graft.streaming.StreamingRollup
    * .hllRegistersStream]] maintains the per-(key, hour, register) max-
    * rho state, Trigger.AvailableNow drains it, and the materialized
    * sink is returned as the query result. Registers are integer-exact
    * (md5-derived hash, max is order-insensitive), so the DuckDB oracle
    * recomputes the same rows from the BATCH definition — the driver
    * hash now pins streaming ≡ batch ≡ oracle, where before only the
    * spec asserted the first equivalence. Complete output mode is used
    * so the final (still-open) hour emits too — append would hold it
    * back behind the watermark forever on a bounded source. */
  def qStreamHll(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // the file-stream source needs a DIRECTORY; glob-filter the sf dir
    // down to the events table
    val pts = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      .select(col("event_type").as("key"),
        col("ts").cast("timestamp").as("ts"), col("user_id"))
    val regs = graft.streaming.StreamingRollup
      .hllRegistersStream(pts, "user_id")
    // fixed sink name, re-runnable within a session (Bench reps)
    scala.util.Try(spark.catalog.dropTempView("q221_sink"))
    // A stateful streaming aggregation opens ONE state store per shuffle
    // partition and pays its open/commit cost every micro-batch — and the
    // executor-side provider registry is a synchronized singleton, so N
    // simultaneous first-time opens serialize (BenchExtra: the 128-task
    // state stage ran 475 ms/task wall at 21 ms/task cpu — pure provider
    // lock wait). The session's 4x-cores shuffle width is sized for batch
    // exchanges where AQE coalesces at runtime; AQE is OFF in streaming,
    // so the width is paid in full. Pin the stream's state width to the
    // executor core count (cluster-parameterised — local[N] ⇒ N, never a
    // constant; on a real cluster this would be total executor cores or
    // state-size/target-partition-size). Registers are per-(key, hour,
    // idx) maxes, so the result is partition-count-invariant. Conf is
    // restored afterwards — batch queries are untouched.
    val streamWidth = {
      val m = spark.sparkContext.master
      val p = "local\\[(\\d+|\\*)\\]".r
      m match {
        case p("*") => Runtime.getRuntime.availableProcessors
        case p(n) => n.toInt
        case _ => spark.sparkContext.defaultParallelism
      }
    }
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", streamWidth.toString)
      val q = regs.writeStream.format("memory").queryName("q221_sink")
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      // conf stays pinned until the bounded stream drains: micro-batch
      // planning happens on the stream thread after start() returns
      q.awaitTermination()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    spark.table("q221_sink")
      .select(col("key").as("event_type"),
        unix_micros(col("bin_start")).as("hour_start"),
        col("idx"), col("rho"))
  }

  /** DuckDB replay of [[qStreamHll]] from the BATCH register
    * definition (the q204 hash chain, hourly bins): what the stream
    * materialized must equal what a batch scan computes. */
  val sqlStreamHll: String =
    """WITH h AS (
      |  SELECT event_type,
      |    (epoch_us(ts) // 3600000000) * 3600000000 AS hour_start,
      |    ('0x' || substr(md5('hll' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
      |      AS h
      |  FROM events WHERE user_id IS NOT NULL)
      |SELECT event_type, hour_start, h >> 51 AS idx,
      |  max(CASE WHEN (h & 2251799813685247) = 0 THEN 52
      |       ELSE 52 - length(bin(h & 2251799813685247)) END) AS rho
      |FROM h GROUP BY event_type, hour_start, h >> 51""".stripMargin

  /** Winnowing fingerprints over the documents table (MOSS, k=8 grams,
    * w=16 windows): one row per selected (position, 40-bit md5 hash) —
    * the deterministic any-match-≥-w+k−1-chars dedup modality beside
    * MinHash/SimHash. All integer md5-grid arithmetic, hash-exact. */
  def qWinnowFp(spark: SparkSession, dir: String): DataFrame =
    graft.dedup.Winnow.fingerprints(docs(spark, dir))

  val sqlWinnowFp: String =
    """WITH d AS (SELECT doc_id, text, length(text) - 7 AS n
      |           FROM documents WHERE text IS NOT NULL AND length(text) >= 8),
      |g AS (SELECT d.doc_id, d.n, i.i,
      |        ('0x' || substr(md5(substr(d.text, CAST(i.i AS INT), 8)), 1, 10))
      |          ::BIGINT * 1048576 + i.i AS p
      |      FROM d, unnest(generate_series(1, d.n)) AS i(i)),
      |w AS (SELECT doc_id, n, i,
      |        min(p) OVER (PARTITION BY doc_id ORDER BY i
      |          ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS sel
      |      FROM g),
      |s AS (SELECT DISTINCT doc_id, sel FROM w
      |      WHERE i <= greatest(n - 15, 1))
      |SELECT doc_id, sel % 1048576 AS fp_pos, sel // 1048576 AS fp_hash
      |FROM s""".stripMargin

  /** MOSS near-duplicate pairs from shared winnowed fingerprints
    * (≥ 2 shared hashes, boilerplate hashes with df > 50 dropped before
    * the pair join). */
  def qWinnowNearDup(spark: SparkSession, dir: String): DataFrame =
    graft.dedup.Winnow.nearDupPairs(docs(spark, dir))

  val sqlWinnowNearDup: String =
    """WITH d AS (SELECT doc_id, text, length(text) - 7 AS n
      |           FROM documents WHERE text IS NOT NULL AND length(text) >= 8),
      |g AS (SELECT d.doc_id, d.n, i.i,
      |        ('0x' || substr(md5(substr(d.text, CAST(i.i AS INT), 8)), 1, 10))
      |          ::BIGINT * 1048576 + i.i AS p
      |      FROM d, unnest(generate_series(1, d.n)) AS i(i)),
      |w AS (SELECT doc_id, n, i,
      |        min(p) OVER (PARTITION BY doc_id ORDER BY i
      |          ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS sel
      |      FROM g),
      |f AS (SELECT DISTINCT doc_id, sel // 1048576 AS h FROM w
      |      WHERE i <= greatest(n - 15, 1)),
      |sz AS (SELECT doc_id, count(*) AS s FROM f GROUP BY 1),
      |k AS (SELECT f.doc_id, f.h FROM f
      |      JOIN (SELECT h FROM f GROUP BY h HAVING count(*) <= 50)
      |        USING (h)),
      |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
      |      FROM k a JOIN k b ON a.h = b.h AND a.doc_id < b.doc_id
      |      GROUP BY 1, 2 HAVING count(*) >= 2)
      |SELECT p.doc_a, p.doc_b, p.n_shared, sa.s AS n_a, sb.s AS n_b,
      |  round(CAST(p.n_shared AS DOUBLE) / (sa.s + sb.s - p.n_shared), 6)
      |    AS jaccard
      |FROM p JOIN sz sa ON sa.doc_id = p.doc_a
      |  JOIN sz sb ON sb.doc_id = p.doc_b""".stripMargin

  /** RDP polyline simplification of the event-type hourly series
    * (ε = 0.1 value units): the error-BOUNDED downsampler beside M4's
    * extrema (q99) and LTTB's area heuristic (q120) — every dropped
    * point provably sits within ε of the kept polyline. Exact integer
    * split rule ([[graft.rollup.Rollup.rdp]]); the oracle replays the
    * segment frontier as a recursive CTE with the argmax packed into
    * one HUGEINT (c²·2²⁰ − i ⇔ max c², tie → smallest i). */
  def qRdpSimplify(spark: SparkSession, dir: String): DataFrame =
    graft.rollup.Rollup.rdp(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_type").as("key"), tsUs.as("t"),
          col("value").as("v")),
      binUs = HOUR, epsMilli = 100)

  val sqlRdpSimplify: String =
    """WITH RECURSIVE
      |e AS (SELECT event_type AS key, epoch_us(ts) AS t, value AS v
      |      FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
      |gq AS (SELECT key, t // 3600000000 AS b,
      |        CAST(floor((CAST(sum(CAST(floor(v * 1000 + 0.5) AS BIGINT))
      |                         AS DOUBLE)
      |                    / CAST(count(*) AS DOUBLE)) + 0.5) AS BIGINT) AS x
      |      FROM e GROUP BY key, b),
      |pts AS (SELECT key, b, x,
      |         CAST(row_number() OVER (PARTITION BY key ORDER BY b)
      |           AS BIGINT) AS i,
      |         count(*) OVER (PARTITION BY key) AS n
      |       FROM gq),
      |root AS (SELECT DISTINCT key, CAST(1 AS BIGINT) AS lo, n AS hi
      |         FROM pts),
      |rec AS (
      |  SELECT * FROM root
      |  UNION ALL
      |  SELECT qq.key,
      |    CASE u.s WHEN 0 THEN qq.lo ELSE qq.m END AS lo,
      |    CASE u.s WHEN 0 THEN qq.m ELSE qq.hi END AS hi
      |  FROM (
      |    SELECT key, lo, hi,
      |      ((mp + 1048575) // 1048576) * 1048576 - mp AS m
      |    FROM (
      |      SELECT r.key, r.lo, r.hi,
      |        max((CAST(r.hi - r.lo AS HUGEINT) * (p.x - xl.x)
      |             - CAST(xh.x - xl.x AS HUGEINT) * (p.i - r.lo))
      |            * (CAST(r.hi - r.lo AS HUGEINT) * (p.x - xl.x)
      |               - CAST(xh.x - xl.x AS HUGEINT) * (p.i - r.lo))
      |            * 1048576 - p.i) AS mp,
      |        max(CAST(r.hi - r.lo AS HUGEINT) * (r.hi - r.lo)
      |            + CAST(xh.x - xl.x AS HUGEINT) * (xh.x - xl.x)) AS seg2
      |      FROM rec r
      |      JOIN pts xl ON xl.key = r.key AND xl.i = r.lo
      |      JOIN pts xh ON xh.key = r.key AND xh.i = r.hi
      |      JOIN pts p ON p.key = r.key AND p.i > r.lo AND p.i < r.hi
      |      GROUP BY r.key, r.lo, r.hi)
      |    WHERE (mp + 1048575) // 1048576 > 10000 * seg2) qq,
      |    (SELECT unnest([0, 1]) AS s) u),
      |kept AS (SELECT key, lo AS i FROM rec
      |         UNION SELECT key, hi FROM rec)
      |SELECT DISTINCT p.key, CAST(p.i AS INT) AS i, p.b * 3600000000 AS bin_start,
      |  p.x / 1000.0 AS v
      |FROM kept k JOIN pts p ON p.key = k.key AND p.i = k.i""".stripMargin

  // classic relational smoke (lineitem)
  def qLineitemAgg(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(round(sum("l_quantity"), 4).as("sum_qty"), count(lit(1)).as("n_rows"))

  val sqlLineitemAgg: String =
    "SELECT l_returnflag, round(sum(l_quantity), 4) AS sum_qty, count(*) AS n_rows FROM lineitem GROUP BY 1"
}
