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

  /** Streaming HLL distinct-count registers — the continuous face of
    * [[graft.sketch.Hll.registers]]: per (key, hour, register) the max
    * rho of the values seen, emitted once per closed hour (append mode,
    * watermark-bounded state). Register rows are EXACTLY the batch
    * sketch (max is order-insensitive), so downstream tiers max-merge
    * them with [[graft.sketch.Hll.merge]] and estimate with
    * [[graft.sketch.Hll.estimate]] unchanged — the streaming job only
    * maintains ≤ 512 small ints of state per (key, open hour).
    * Columns in: (key, ts: timestamp, `valueCol`); out:
    * (key, bin_start: timestamp, idx, rho). */
  def hllRegistersStream(points: DataFrame, valueCol: String,
      watermarkDelay: String = "2 hours"): DataFrame = {
    val h = graft.sketch.Kmv.hash60(col(valueCol), "hll")
    points
      .filter(col(valueCol).isNotNull)
      .withWatermark("ts", watermarkDelay)
      .select(col(K), col("ts"),
        shiftright(h, graft.sketch.Hll.W).as("idx"),
        graft.sketch.Hll.rho(h).as("rho"))
      .groupBy(col(K), window(col("ts"), "1 hour").as("win"), col("idx"))
      .agg(max(col("rho")).as("rho"))
      .select(col(K), col("win.start").as("bin_start"), col("idx"), col("rho"))
  }

  /** Streaming gap sessionization — the continuous face of
    * [[graft.events.EventOps.sessionize]], on Spark's native
    * `session_window` (state-store-merged windows, watermark-bounded
    * state; a session emits once, when the watermark passes its close +
    * gap). Columns in: (key, ts: timestamp, v); out: one row per closed
    * session (key, t_start, t_end, n_events, v_sum).
    *
    * Boundary semantics MATCH the batch operator exactly:
    * `session_window` merges windows that touch (an event at precisely
    * prev + gap extends the session), so a new session starts only when
    * the inter-event gap is STRICTLY greater than `gap` — the same
    * contract as `sessionize`'s `t - prev > gap` split. Spec'd in
    * StreamingSpec with events at the exact boundary on both sides.
    */
  def sessionizeStream(
      points: DataFrame,
      gap: String,
      watermarkDelay: String = "1 hour"): DataFrame =
    points
      .withWatermark("ts", watermarkDelay)
      .groupBy(col(K), session_window(col("ts"), gap).as("win"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col(V)).as("v_sum"),
        min(col("ts")).as("t_start"),
        max(col("ts")).as("t_end"))
      .select(col(K), col("t_start"), col("t_end"), col("n_events"), col("v_sum"))

  case class PointEvent(key: String, t: Long, v: Double)
  case class Carried(key: String, t: Long, v: Double, prev: Option[Double])

  case class SidEvent(key: String, sid: String, t: Long, v: Option[Double])
  case class MergedPoint(key: String, t: Long, v: Double, seq: Long)

  /** State of one merge key: the running sum and per-sid last values AS OF
    * just before the retained transition buffer, the buffer itself (every
    * transition within the lateness horizon, (t, sid, v) in time order),
    * the emission counter and the max event time seen. Buffer size is
    * O(transitions within `allowedLatenessUs`), the price of repair. */
  case class MergeKeyState(
      baseSum: Double, baseLast: Map[String, Double],
      recent: List[(Long, String, Option[Double])], seq: Long, maxT: Long)

  /** Streaming ignorant-sum K-way merge: the batch transition-delta trick
    * (MergeOps.mergeSum) held as per-key state — the running sum plus each
    * series' last value — so state is O(#series per key) plus a bounded
    * repair buffer, never O(#events). Emits the post-transition merged
    * value once per distinct time within a batch, like iter_merge. The
    * output is an UPSERT stream keyed by (key, t), last `seq` wins (the
    * streaming face of the reference's SortedDict overwrite semantics;
    * downstream: max_by(struct(v), seq) per (key, t)).
    *
    * Cross-batch out-of-order events are DETECTED AND REPAIRED within
    * `allowedLatenessUs` (round-3 verdict #7 — the contract used to be
    * documented but unenforced, so a late event silently corrupted the
    * running sum): transitions inside the horizon (maxT - lateness) stay
    * buffered in state; a late arrival is spliced into the buffer and
    * every affected (key, t) point re-emits corrected with a higher seq.
    * An event older than the horizon DETECTS-AND-FAILS loudly instead of
    * corrupting. The default lateness 0 keeps the strict contract (only
    * same-t boundary straddles repair) with enforcement. */
  def mergeSumStream(
      events: Dataset[SidEvent],
      allowedLatenessUs: Long = 0L): Dataset[MergedPoint] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (key: String, rows: Iterator[SidEvent], state: GroupState[MergeKeyState]) => {
          val s0 = state.getOption
            .getOrElse(MergeKeyState(0.0, Map.empty, Nil, 0L, Long.MinValue))
          val fresh = rows.toSeq
          if (fresh.isEmpty) Iterator.empty
          else {
            val horizon =
              if (s0.maxT == Long.MinValue) Long.MinValue
              else s0.maxT - allowedLatenessUs
            val lateT = fresh.map(_.t).min
            if (lateT < horizon)
              throw new IllegalStateException(
                s"mergeSumStream: event at t=$lateT for key=$key is older than the " +
                  s"repair horizon $horizon (maxT=${s0.maxT}, allowedLatenessUs=" +
                  s"$allowedLatenessUs) — raise allowedLatenessUs or fix the source order")
            // splice new transitions into the buffered suffix and replay
            // from the pre-buffer base; re-emit every time >= the earliest
            // new arrival (those merged values may have changed)
            val all = (s0.recent ++ fresh.map(e => (e.t, e.sid, e.v)))
              .sortBy(x => (x._1, x._2))
            val out = Seq.newBuilder[MergedPoint]
            var sum = s0.baseSum; var last = s0.baseLast; var seq = s0.seq
            var i = 0
            while (i < all.length) {
              val (t, sid, v) = all(i)
              sum += v.getOrElse(0.0) - last.getOrElse(sid, 0.0)
              last = last.updated(sid, v.getOrElse(0.0))
              // emit once per distinct time, after all simultaneous
              // transitions, and only for times the new batch touched
              if ((i + 1 >= all.length || all(i + 1)._1 != t) && t >= lateT) {
                seq += 1
                out += MergedPoint(key, t, sum, seq)
              }
              i += 1
            }
            // age transitions that fell outside the new horizon into the
            // base (fold order = time order, so the base stays exact)
            val newMaxT = math.max(s0.maxT, fresh.map(_.t).max)
            val (aged, kept) = all.partition(_._1 < newMaxT - allowedLatenessUs)
            var bSum = s0.baseSum; var bLast = s0.baseLast
            aged.foreach { case (_, sid, v) =>
              bSum += v.getOrElse(0.0) - bLast.getOrElse(sid, 0.0)
              bLast = bLast.updated(sid, v.getOrElse(0.0))
            }
            state.update(MergeKeyState(bSum, bLast, kept, seq, newMaxT))
            out.result().iterator
          }
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

  case class DownEvent(key: String, t: Long)
  case class DownSlice(key: String, day: Long, downUs: Long)

  /** State of one downtime key: the last event time already consumed by
    * emitted gaps (Long.MinValue = none yet), the max event time seen,
    * and the buffered event times still inside the lateness horizon
    * (sorted). Buffer size is O(events within `allowedLatenessUs`). */
  case class DowntimeKeyState(prevT: Long, maxT: Long, recent: Seq[Long])

  /** Streaming face of [[graft.events.EventOps.downtime]]: dead-man's-
    * switch gap detection with per-calendar-day attribution, emitting
    * APPEND-only (key, day, down_us) increments (a consumer sums per
    * (key, day) — slices for one gap never re-emit). A gap becomes
    * FINAL only once the key's max event time has moved
    * `allowedLatenessUs` past its right endpoint — an out-of-order
    * event inside a still-open gap splices in and splits it correctly;
    * one older than the horizon fails loudly (the [[mergeSumStream]]
    * contract: raise the lateness budget or fix the source order).
    * Same-t duplicates are gap-0 no-ops, matching batch. */
  def downtimeStream(
      events: Dataset[DownEvent],
      heartbeatUs: Long,
      dayUs: Long = 86400000000L,
      allowedLatenessUs: Long = 0L): Dataset[DownSlice] = {
    require(heartbeatUs > 0 && dayUs > 0 && allowedLatenessUs >= 0,
      s"bad params: hb=$heartbeatUs day=$dayUs lateness=$allowedLatenessUs")
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (key: String, rows: Iterator[DownEvent], state: GroupState[DowntimeKeyState]) => {
          val s0 = state.getOption
            .getOrElse(DowntimeKeyState(Long.MinValue, Long.MinValue, Nil))
          val fresh = rows.map(_.t).toSeq
          if (fresh.isEmpty) Iterator.empty
          else {
            val horizon =
              if (s0.maxT == Long.MinValue) Long.MinValue
              else s0.maxT - allowedLatenessUs
            val lateT = fresh.min
            if (lateT < horizon || (s0.prevT != Long.MinValue && lateT < s0.prevT))
              throw new IllegalStateException(
                s"downtimeStream: event at t=$lateT for key=$key is older than " +
                  s"the horizon $horizon (maxT=${s0.maxT}, allowedLatenessUs=" +
                  s"$allowedLatenessUs) — raise allowedLatenessUs or fix the source order")
            val newMaxT = math.max(s0.maxT, fresh.max)
            val cutoff =
              if (allowedLatenessUs == 0L) newMaxT
              else newMaxT - allowedLatenessUs
            val all = (s0.recent ++ fresh).sorted
            val out = Seq.newBuilder[DownSlice]
            var p = s0.prevT
            val kept = Seq.newBuilder[Long]
            all.foreach { t =>
              if (t <= cutoff) {
                if (p != Long.MinValue && t - p > heartbeatUs) {
                  // split the down interval [p + hb, t) across days
                  val d0 = p + heartbeatUs
                  var day = Math.floorDiv(d0, dayUs)
                  val dayLast = Math.floorDiv(t - 1, dayUs)
                  while (day <= dayLast) {
                    val lo = math.max(d0, day * dayUs)
                    val hi = math.min(t, (day + 1) * dayUs)
                    out += DownSlice(key, day, hi - lo)
                    day += 1
                  }
                }
                p = t
              } else kept += t
            }
            state.update(DowntimeKeyState(p, newMaxT, kept.result()))
            out.result().iterator
          }
        })
  }

  case class DebounceState(lastKept: Long, maxT: Long)

  /** Streaming face of [[graft.events.EventOps.debounce]]: per key, emit
    * an event only once at least `cooldownUs` has passed since the last
    * EMITTED one — state is two longs per key (the last kept timestamp
    * and the max time seen), the cheapest state in the module. Within a
    * batch, events sort and the greedy chain replays exactly like batch
    * debounce (same-t duplicates collapse); ACROSS batches the chain is
    * append-only, so an event older than the key's max seen time could
    * retroactively change decisions already emitted — it is detected
    * and FAILS loudly (the [[mergeSumStream]] contract; debounce emits
    * are consumed as triggers, so silent late reordering would mean
    * phantom or missing alerts downstream). */
  def debounceStream(
      events: Dataset[DownEvent],
      cooldownUs: Long): Dataset[DownEvent] = {
    require(cooldownUs > 0, s"cooldown $cooldownUs must be positive")
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (key: String, rows: Iterator[DownEvent], state: GroupState[DebounceState]) => {
          // Long.MinValue/2 seed: MinValue + cooldown would overflow
          val s0 = state.getOption
            .getOrElse(DebounceState(Long.MinValue / 2, Long.MinValue))
          val ts = rows.map(_.t).toArray.sorted.distinct
          if (ts.isEmpty) Iterator.empty
          else {
            if (s0.maxT != Long.MinValue && ts.head < s0.maxT)
              throw new IllegalStateException(
                s"debounceStream: event at t=${ts.head} for key=$key is older " +
                  s"than the max seen time ${s0.maxT} — the kept chain is " +
                  "append-only; feed per-key event-time-ordered batches")
            var last = s0.lastKept
            val kept = Seq.newBuilder[DownEvent]
            ts.foreach { t =>
              if (t >= last + cooldownUs) { last = t; kept += DownEvent(key, t) }
            }
            state.update(DebounceState(last, math.max(s0.maxT, ts.last)))
            kept.result().iterator
          }
        })
  }

  case class DeadbandState(lastKeptX: Long, maxT: Long)

  /** Streaming face of [[graft.events.EventOps.deadband]]: per key, emit
    * a point only when its 1e-3-quantized value has moved at least
    * `delta` from the last EMITTED value — state is two longs per key
    * (the last kept quantized value and the max time seen). Within a
    * batch, points sort by time and same-t duplicates collapse to max v,
    * exactly like the batch fold; ACROSS batches the contract is
    * STRICTLY increasing event time per key — stricter than
    * [[debounceStream]]'s ≤, because here a same-t re-delivery is a
    * value CORRECTION the append-only chain cannot honor (batch deadband
    * would have folded it into the dedupe before deciding). Stale or
    * equal-time input fails loudly. */
  def deadbandStream(
      events: Dataset[PointEvent],
      delta: Double): Dataset[PointEvent] = {
    require(delta > 0, s"delta $delta must be positive")
    val deltaMilli = math.rint(delta * 1000).toLong
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (key: String, rows: Iterator[PointEvent], state: GroupState[DeadbandState]) => {
          // MinValue/2 sentinel: no real quantized value is within delta
          val s0 = state.getOption
            .getOrElse(DeadbandState(Long.MinValue / 2, Long.MinValue))
          val pts = rows.toArray.groupBy(_.t)
            .map { case (t, ps) => (t, ps.map(_.v).max) }
            .toArray.sortBy(_._1)
          if (pts.isEmpty) Iterator.empty
          else {
            if (s0.maxT != Long.MinValue && pts.head._1 <= s0.maxT)
              throw new IllegalStateException(
                s"deadbandStream: point at t=${pts.head._1} for key=$key is " +
                  s"not after the max seen time ${s0.maxT} — the kept chain " +
                  "is append-only and same-t re-delivery is a correction; " +
                  "feed per-key strictly-time-ordered batches")
            var last = s0.lastKeptX
            val kept = Seq.newBuilder[PointEvent]
            pts.foreach { case (t, v) =>
              val x = math.floor(v * 1000 + 0.5).toLong
              if (math.abs(x - last) >= deltaMilli) {
                last = x; kept += PointEvent(key, t, v)
              }
            }
            state.update(DeadbandState(last, math.max(s0.maxT, pts.last._1)))
            kept.result().iterator
          }
        })
  }

  case class ReqEvent(key: String, t: Long, bad: Boolean)
  case class BurnRow(key: String, t: Long, tot_s: Long, bad_s: Long,
      burn_s: Double, tot_l: Long, bad_l: Long, burn_l: Double, alert: Long)
  case class BurnState(recent: Seq[(Long, Long, Long)], maxT: Long)

  /** Streaming face of [[graft.events.EventOps.burnRate]]: per key, the
    * SRE multi-window burn-rate alert evaluated at every distinct event
    * time over the trailing (t − W, t] request/bad counts for W ∈
    * {shortUs, longUs}. State is the per-(key, t) count ring inside the
    * LONG window — O(distinct event times per longUs) — pruned as time
    * advances; the short window reads from the same ring. Within a
    * batch, events group per t and replay in time order exactly like
    * the batch operator; ACROSS batches the contract is STRICTLY
    * increasing event time per key ([[deadbandStream]]'s rule — a
    * same-t re-delivery is a count CORRECTION the already-emitted row
    * cannot honor) and stale input fails loudly. Burn rounding matches
    * the batch face bit-for-bit (two fixed-order IEEE divisions,
    * HALF_UP at 6 dp). */
  def burnRateStream(
      events: Dataset[ReqEvent], budget: Double,
      shortUs: Long, longUs: Long, burnThreshold: Double): Dataset[BurnRow] = {
    require(budget > 0 && budget <= 1, s"budget $budget must be in (0, 1]")
    require(shortUs > 0 && longUs > shortUs,
      s"windows must satisfy 0 < short ($shortUs) < long ($longUs)")
    import events.sparkSession.implicits._
    def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (key: String, rows: Iterator[ReqEvent], state: GroupState[BurnState]) => {
          val s0 = state.getOption.getOrElse(BurnState(Nil, Long.MinValue))
          val byT = rows.toArray.groupBy(_.t)
            .map { case (t, es) =>
              (t, es.length.toLong, es.count(_.bad).toLong)
            }
            .toArray.sortBy(_._1)
          if (byT.isEmpty) Iterator.empty
          else {
            if (s0.maxT != Long.MinValue && byT.head._1 <= s0.maxT)
              throw new IllegalStateException(
                s"burnRateStream: event at t=${byT.head._1} for key=$key is " +
                  s"not after the max seen time ${s0.maxT} — emitted rows " +
                  "are final and a same-t re-delivery is a count " +
                  "correction; feed per-key strictly-time-ordered batches")
            val ring = scala.collection.mutable.ArrayDeque
              .from(s0.recent)
            val out = byT.map { case (t, n, b) =>
              ring.append((t, n, b))
              while (ring.head._1 <= t - longUs) ring.removeHead()
              var totL = 0L; var badL = 0L; var totS = 0L; var badS = 0L
              ring.foreach { case (rt, rn, rb) =>
                totL += rn; badL += rb
                if (rt > t - shortUs) { totS += rn; badS += rb }
              }
              val burnS = r6(badS.toDouble / totS / budget)
              val burnL = r6(badL.toDouble / totL / budget)
              BurnRow(key, t, totS, badS, burnS, totL, badL, burnL,
                if (burnS >= burnThreshold && burnL >= burnThreshold) 1L
                else 0L)
            }
            state.update(BurnState(ring.toSeq, byT.last._1))
            out.iterator
          }
        })
  }
}
