package graft.streaming

import graft.core.SeriesOps.{K, T, V}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming face of the rollup pipeline. The reference is
  * batch-only (SURVEY.md §2.10) and the north rule runs batch-with-resume,
  * but a continuously-ingesting deployment of the same tiers is the natural
  * streaming extension: watermarked hourly aggregates + stateful
  * carry-forward (the streaming form of the zero-order-hold gap fill).
  */
object StreamingRollup {

  /** Hourly continuous aggregate over a streaming points source:
    * watermark bounds state; append-mode emits each (key, hour) once its
    * watermark passes. Columns in: (key, ts: timestamp, v). */
  def hourlyStats(points: DataFrame, watermarkDelay: String = "2 hours"): DataFrame =
    points
      .withWatermark("ts", watermarkDelay)
      .groupBy(col(K), window(col("ts"), "1 hour").as("win"))
      .agg(
        count(lit(1)).as("n_points"),
        avg(col(V)).as("mean"),
        min(col(V)).as("min"),
        max(col(V)).as("max"))
      .select(col(K), col("win.start").as("bin_start"), col("n_points"),
        col("mean"), col("min"), col("max"))

  case class PointEvent(key: String, t: Long, v: Double)
  case class Carried(key: String, t: Long, v: Double, prev: Option[Double])

  case class SidEvent(key: String, sid: String, t: Long, v: Option[Double])
  case class MergedPoint(key: String, t: Long, v: Double, seq: Long)

  /** Streaming ignorant-sum K-way merge: the batch transition-delta trick
    * (MergeOps.mergeSum) held as per-key state — the running sum plus each
    * series' last value — so state is O(#series per key), never O(#events).
    * Emits the post-transition merged value once per distinct time within a
    * batch, like iter_merge. Events must reach each key in nondecreasing
    * event-time order ACROSS micro-batches (in-batch reordering is sorted
    * out); when simultaneous transitions straddle a batch boundary the
    * later batch RE-emits the corrected point at the same t with a higher
    * `seq` — the output is an UPSERT stream keyed by (key, t), last `seq`
    * wins (the streaming face of the reference's SortedDict overwrite
    * semantics; downstream: max_by(struct(v), seq) per (key, t)).
    */
  def mergeSumStream(events: Dataset[SidEvent]): Dataset[MergedPoint] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (key: String, rows: Iterator[SidEvent],
            state: GroupState[(Double, Map[String, Double], Long)]) => {
          var (sum, lastBySid, seq) = state.getOption.getOrElse((0.0, Map.empty[String, Double], 0L))
          val sorted = rows.toSeq.sortBy(e => (e.t, e.sid))
          val out = Seq.newBuilder[MergedPoint]
          var i = 0
          while (i < sorted.length) {
            val e = sorted(i)
            sum += e.v.getOrElse(0.0) - lastBySid.getOrElse(e.sid, 0.0)
            lastBySid = lastBySid.updated(e.sid, e.v.getOrElse(0.0))
            // emit once per distinct time, after all simultaneous transitions
            if (i + 1 >= sorted.length || sorted(i + 1).t != e.t) {
              seq += 1
              out += MergedPoint(key, e.t, sum, seq)
            }
            i += 1
          }
          state.update((sum, lastBySid, seq))
          out.result().iterator
        })
  }

  /** Streaming exact dedup: keep the first document per content digest.
    * `dropDuplicates` holds O(#distinct digests) state (16-byte digests,
    * never text); add an ingest-time watermark column + dropDuplicates on
    * (digest) with withWatermark upstream to bound state for
    * bounded-lateness windows. */
  def dedupStream(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("digest", md5(col(textCol).cast("binary")))
      .dropDuplicates("digest")

  /** Stateful per-key carry-forward: each event is emitted with the
    * previous value of its series (the streaming transition stream that
    * feeds compaction / delta encoding). `mapGroupsWithState` keeps one
    * Double per key — state is O(#keys), not O(#events). */
  def withPrevious(events: Dataset[PointEvent]): Dataset[Carried] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (key: String, rows: Iterator[PointEvent], state: GroupState[Double]) => {
          val sorted = rows.toSeq.sortBy(_.t)
          var prev: Option[Double] = state.getOption
          val out = sorted.map { e =>
            val c = Carried(key, e.t, e.v, prev)
            prev = Some(e.v)
            c
          }
          prev.foreach(state.update)
          out.iterator
        })
  }
}
