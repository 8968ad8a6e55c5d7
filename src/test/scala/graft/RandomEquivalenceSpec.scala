package graft

import graft.agg.AggOps
import graft.core.SeriesOps
import graft.regularize.Regularize
import org.apache.spark.sql.functions._

/** Randomized equivalence vs the reference for the flagship semantics:
  * distribution boundaries/defaults/None weights, moving averages across
  * placements, and point sampling (previous + linear) — 50 seeded trials
  * whose expected outputs come from RUNNING the reference
  * (tools/gen_goldens.py). */
class RandomEquivalenceSpec extends SparkSpec {
  private val nullD = lit(null).cast("double")

  def defCol(d: Option[Double]) = d.map(lit(_).cast("double")).getOrElse(nullD)

  test("distribution matches reference on 20 random series/boundary trials") {
    Goldens.distTrials.zipWithIndex.foreach { case (tr, i) =>
      val df = seriesD(tr.points)
      val segs = SeriesOps.segmentsInRange(df, lit(tr.start.toDouble), lit(tr.end.toDouble), defCol(tr.default))
      val got = AggOps
        .distribution(segs, normalized = false)
        .select("v", "weight").collect()
        .map(r => (if (r.isNullAt(0)) None else Some(r.getDouble(0)), r.get(1).toString.toDouble))
        .toSeq.sortBy(_._1.getOrElse(-1e9))
      val exp = tr.expected.sortBy(_._1.getOrElse(-1e9))
      assert(got.size == exp.size, s"trial $i: $got vs $exp")
      got.zip(exp).foreach { case ((v1, w1), (v2, w2)) =>
        assert(v1 == v2 && math.abs(w1 - w2) < 1e-9, s"trial $i: $got vs $exp")
      }
    }
  }

  test("moving_average matches reference on 15 random placement trials") {
    Goldens.maTrials.zipWithIndex.foreach { case (tr, i) =>
      val df = seriesD(tr.points).withColumn("t", col("t").cast("long"))
      val got = collectTV(
        Regularize
          .movingAverage(df, Regularize.gridLongs(tr.start, tr.end, 1), tr.window, tr.placement, nullD)
          .withColumnRenamed("mean", "v"))
      approxEq(got, tr.expected, 1e-9)
    }
  }

  test("sampling matches reference get() on 15 random previous/linear trials") {
    Goldens.sampleTrials.zipWithIndex.foreach { case (tr, i) =>
      val df = seriesD(tr.points).withColumn("t", col("t").cast("long"))
      val s = spark
      import s.implicits._
      val grid = Regularize.gridDf(df, (tr.start.toLong to tr.end.toLong).toDF("t"))
      val got = collectTV(
        if (tr.interp == "previous") Regularize.samplePrevious(df, grid, defCol(tr.default))
        else Regularize.sampleLinear(df, grid, defCol(tr.default)))
      approxEq(got, tr.expected, 1e-9)
    }
  }

  test("setManyCompact matches reference set_many(compact=True) on 12 trials") {
    Goldens.smcTrials.zipWithIndex.foreach { case (tr, i) =>
      val got = collectTV(SeriesOps.setManyCompact(seriesD(tr.points), defCol(tr.default)))
      approxEq(got, tr.expected, 1e-9)
    }
  }

  test("sliceSeries matches reference slice() on 12 random boundary trials") {
    Goldens.sliceTrials.zipWithIndex.foreach { case (tr, i) =>
      val got = collectTV(SeriesOps.sliceSeries(
        seriesD(tr.points), lit(tr.start.toDouble), lit(tr.end.toDouble), nullD))
      approxEq(got, tr.expected, 1e-9)
    }
  }

  test("nPointsMasked matches reference n_points(mask=...) on 12 trials") {
    Goldens.maskNTrials.zipWithIndex.foreach { case (tr, i) =>
      val df = seriesD(tr.points)
      val (tmin, tmax) = (tr.points.map(_._1).min, tr.points.map(_._1).max)
      val maskSeries = SeriesOps.threshold(df, lit(tr.thresh))
      val mask = SeriesOps.trueIntervals(maskSeries, lit(tmin), lit(tmax), lit(0.0))
      val got = SeriesOps.nPointsMasked(df, mask).select("n_points").head().getLong(0)
      assert(got == tr.expected.toLong, s"trial $i: $got vs ${tr.expected}")
    }
  }
}
