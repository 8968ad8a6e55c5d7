package graft

import graft.pipeline.{CheckpointedRollup, Pages}
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {

  test("synthetic pages: deterministic, skewed, byte-identical text per url") {
    val p1 = Pages.synthPages(spark, 2000)
    val p2 = Pages.synthPages(spark, 2000)
    assert(p1.exceptAll(p2).isEmpty && p2.exceptAll(p1).isEmpty, "generator not deterministic")
    // text is a pure function of url
    assert(p1.select("url", "text").distinct().count() == p1.select("url").distinct().count())
    // extraction invariant: extractText(html) byte-identical to text per row
    val bad = p1.filter(Pages.extractText(col("html")) =!= col("text")).count()
    assert(bad == 0, s"$bad rows break the text-extraction invariant")
    // skew: hottest domain should dominate
    val counts = p1.groupBy(regexp_extract(col("url"), "https://(d\\d+)", 1).as("dom"))
      .count().orderBy(col("count").desc).collect()
    assert(counts.head.getLong(1) > counts.last.getLong(1) * 3, "expected hot-domain skew")
  }

  test("checkpointed rollup runs, resumes idempotently, and counts lineage") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rollup").toString
    val series = Pages.toSeries(Pages.synthPages(spark, 3000))
    CheckpointedRollup.run(series, dir)

    val cp = CheckpointedRollup.readCheckpoint(spark, dir)
    val tiers = cp.select("tier").distinct().collect().map(_.getString(0)).toSet
    assert(tiers == Set("chunks", "hourly", "daily", "weekly"), s"tiers: $tiers")
    assert(cp.filter(col("status") =!= "done").count() == 0)

    val hourly1 = spark.read.parquet(s"$dir/hourly")
    // materialize daily rows NOW: the resume surgery below deletes files,
    // so a lazy DataFrame over them would fail on re-execution
    val daily1Rows = spark.read.parquet(s"$dir/daily").collect().map(_.toString).sorted.toSeq
    val h1 = hourly1.count(); val d1 = daily1Rows.size.toLong
    assert(h1 > 0 && d1 > 0)

    // chunks round-trip: decoded chunk points == compacted input series
    val decoded = graft.chunk.ChunkOps.readChunks(spark.read.parquet(s"$dir/chunks"))
    val compacted = graft.core.SeriesOps.compact(series)
    assert(decoded.exceptAll(compacted).isEmpty && compacted.exceptAll(decoded).isEmpty,
      "chunk round-trip lost points")

    // resume: drop the checkpoint rows + outputs of one daily partition and rerun
    val victim = cp.filter(col("tier") === "daily").select("partition").head().getLong(0)
    val cpAll = cp.collect()
    val keep = cpAll.filterNot(r => r.getString(0) == "daily" && r.getLong(1) == victim)
    // rewrite checkpoint without the victim row
    import spark.implicits._
    val tickDf = keep.map(r => CheckpointedRollup.Tick(
      r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toSeq.toDF()
    val cpPath = CheckpointedRollup.checkpointPath(dir)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(cpPath))
    tickDf.coalesce(1).write.parquet(cpPath)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$dir/daily/partition=$victim"))

    CheckpointedRollup.run(series, dir) // must only redo the victim partition
    val daily2Rows = spark.read.parquet(s"$dir/daily").collect().map(_.toString).sorted.toSeq
    assert(daily2Rows.size.toLong == d1, s"resume changed daily row count: ${daily2Rows.size} vs $d1")
    assert(daily2Rows == daily1Rows, "resume produced different daily rows")
    val cp2 = CheckpointedRollup.readCheckpoint(spark, dir)
    assert(cp2.filter(col("tier") === "daily" && col("partition") === victim).count() == 1)
  }

  test("retention keeps only fresh raw/hourly/daily and all weekly") {
    val series = Pages.toSeries(Pages.synthPages(spark, 1000))
    val now = series.agg(max("t")).head().getLong(0)
    val day = CheckpointedRollup.DAY
    val hourly = series.select(col("key"), col("t").as("bin_start"), col("v"))
    val (r, h, d, w) = graft.rollup.Rollup.applyRetention(
      series, hourly, hourly, hourly, now, day, 2 * day, 4 * day)
    assert(r.agg(min("t")).head().getLong(0) >= now - day)
    assert(h.agg(min("bin_start")).head().getLong(0) >= now - 2 * day)
    assert(w.count() == hourly.count())
  }
}
