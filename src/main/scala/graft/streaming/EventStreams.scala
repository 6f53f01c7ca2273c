package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import graft.functions.GraftFunctions.epochMicros

/** Structured Streaming surface (`SURVEY.md` §2 E "streaming twin",
  * H5). The reference is batch-only; these give the engine genuine
  * stream semantics — event-time tumbling/sliding windows, gap-based
  * session windows, watermarked late-data handling — while every
  * transform also runs identically in batch mode (same functions, same
  * plans), which is how the DuckDB oracle exercises them.
  *
  * Scale: watermark + windowed aggregation is incremental state in the
  * HDFS-backed state store, partitioned by group key — no unbounded
  * state, no driver accumulation.
  */
object EventStreams {

  val EventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType), // µs wall-clock (current testdata)
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Proper event-time column from `ts`, whatever its encoding
    * (int64 nanos, TIMESTAMP_NTZ µs, or TIMESTAMP µs — dispatch in
    * [[graft.functions.GraftFunctions.epochMicros]]); always a
    * TIMESTAMP instant so watermarks/windows behave identically
    * regardless of the source encoding. */
  def withEventTime(df: DataFrame): DataFrame =
    df.withColumn("event_time",
      timestamp_micros(epochMicros(df.schema("ts").dataType, col("ts"))))

  /** File-source stream over the events parquet (schema must be
    * declared for streaming reads — [[EventSchema]] matches the
    * current µs-timestamp testdata encoding). */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    withEventTime(
      spark.readStream.schema(EventSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))

  /** Stream-static enrichment: left-join the stream against a batch
    * dimension frame on `key`. Stateless on the stream side — no
    * watermark, no state store; the static side is executed afresh
    * each micro-batch (a dim whose SOURCE changes between batches is
    * re-scanned, the standard slowly-changing-dimension pattern). At
    * scale the dim either broadcasts (small) or the join co-partitions
    * per batch — the same plan menu as any batch join. */
  def enrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(dim, Seq(key), "left")

  /** Tumbling event-time window aggregation with a 1-hour watermark:
    * in streaming mode emits finalized windows; in batch mode computes
    * the same result in one pass. */
  def tumblingCounts(events: DataFrame, width: String = "1 hour"): DataFrame =
    events
      .withWatermark("event_time", "1 hour")
      .groupBy(window(col("event_time"), width), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding window (size/slide), the streaming twin of q61. */
  def slidingCounts(events: DataFrame, size: String = "1 hour",
                    slide: String = "30 minutes"): DataFrame =
    events
      .withWatermark("event_time", "1 hour")
      .groupBy(window(col("event_time"), size, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"))

  /** Stream-stream interval join: each left event matched with the
    * right-side events for the same key within the trailing `within`
    * interval. Watermarks on BOTH sides bound the join state (Spark
    * evicts right-side state once the left watermark passes
    * `event_time + within`) — without them a stream-stream inner join
    * would buffer forever. Also runs identically in batch. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   within: String, watermark: String = "1 hour"): DataFrame = {
    val l = left.withWatermark("event_time", watermark).alias("l")
    val r = right.withWatermark("event_time", watermark).alias("r")
    l.join(r,
      expr(s"l.$key = r.$key AND " +
        s"r.event_time BETWEEN l.event_time - INTERVAL $within AND l.event_time"),
      "inner")
      .select(col(s"l.$key").as(key),
        col("l.event_time").as("left_time"),
        col("r.event_time").as("right_time"))
  }

  /** Streaming EXACT dedup: drop rows whose `keys` were already seen,
    * keeping state only within the watermark delay —
    * `dropDuplicatesWithinWatermark` evicts a key's dedup state once
    * the watermark passes its event time, so state is bounded by the
    * key arrival rate × delay instead of growing with the stream's
    * lifetime (plain `dropDuplicates` on a stream never evicts).
    * The exact-dedup twin of [[StreamingDedup]]'s near-dup index: use
    * this for replays/at-least-once sources, the index for content
    * near-duplicates. */
  def dedupWithinWatermark(events: DataFrame, delay: String,
                           keys: String*): DataFrame = {
    // an empty key list would pass Seq.empty to the dedup operator,
    // which groups on ZERO columns — every row shares the empty key
    // and all but one row per state lifetime silently drop. A caller
    // meaning "dedup on all columns" must say so with the column list.
    require(keys.nonEmpty,
      "dedupWithinWatermark: pass at least one key column — an empty " +
        "key list would collapse the whole stream to one surviving row")
    events.withWatermark("event_time", delay)
      .dropDuplicatesWithinWatermark(keys.toSeq)
  }

  /** Row/state types for the custom-state operator. */
  final case class UserEvent(user_id: Long, ts_us: Long)
  final case class UserSessionState(nSessions: Long, lastTsUs: Long)
  final case class UserSessionCount(user_id: Long, n_sessions: Long,
                                    n_events_batch: Long)

  /** Custom incremental state via `flatMapGroupsWithState` (the
    * `KeyValueGroupedDataset` path for semantics the built-in window
    * operators can't express): a per-user running SESSION COUNTER that
    * survives across micro-batches. Each batch's events are folded into
    * (count, last-timestamp) state; a gap > `gapUs` opens a new
    * session. State is one tiny record per user in the state store —
    * bounded, partitioned by key, nothing on the driver. Works on a
    * streaming Dataset; also callable on a batch Dataset for tests.
    *
    * Contract (the [[statefulFunnel]] law): per-key event-time order
    * must be non-decreasing ACROSS micro-batches (within a batch any
    * order is fine — the batch sorts per key before folding). The
    * fold additionally DEFENDS against violation: `lastTsUs` is
    * monotone (max, never overwrite), so a late straggler that lands
    * inside the current session merges into it instead of REGRESSING
    * the watermark timestamp — unguarded, one out-of-order arrival
    * would widen the next gap computation and silently inflate every
    * future session count. A straggler older than the whole current
    * session still cannot be re-attributed (its session closed in
    * already-emitted state); it merges rather than double-counts. */
  def statefulSessionCounts(events: Dataset[UserEvent], gapUs: Long)
      : Dataset[UserSessionCount] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserSessionState, UserSessionCount](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[UserEvent], state: GroupState[UserSessionState]) =>
          val sorted = rows.toSeq.sortBy(_.ts_us)
          if (sorted.isEmpty) Iterator.empty
          else {
            val init = state.getOption.getOrElse(UserSessionState(0L, Long.MinValue))
            val next = sorted.foldLeft(init) { (st, e) =>
              val newSession = st.lastTsUs == Long.MinValue || e.ts_us - st.lastTsUs > gapUs
              UserSessionState(st.nSessions + (if (newSession) 1 else 0),
                math.max(st.lastTsUs, e.ts_us))
            }
            state.update(next)
            Iterator.single(UserSessionCount(user, next.nSessions, sorted.size.toLong))
          }
      }
  }

  /** Row/output types for the streaming funnel. `times` uses -1 as the
    * "step not reached" sentinel (event times are positive epoch-µs). */
  final case class FunnelEvent(user_id: Long, ts_us: Long, tie: Long,
                               event_type: String)
  final case class UserFunnel(user_id: Long, times: Seq[Long])

  /** Streaming funnel: the incremental twin of
    * [[graft.operators.EventAnalytics.funnelTimes]]. Per-user state is
    * exactly k longs — the current earliest chained completion time of
    * each step — updated event by event: a `steps(k)` event completes
    * step k iff step k−1 completed STRICTLY earlier (same strict-`<`
    * law as batch, so same-timestamp ties never chain, in either mode).
    *
    * Contract: per-key event-time order must be non-decreasing ACROSS
    * micro-batches (within a batch any order is fine — the batch is
    * sorted per key before folding). An out-of-order arrival that
    * time-travels before already-folded state could retroactively
    * validate a rejected event; batch-sorted replay of an append-only
    * log (the normal file/Kafka source shape) satisfies the contract.
    * The parity law — N in-order batches ⇒ identical `funnelTimes`
    * output — is proven in EventAnalyticsSpec on the real events table.
    *
    * Scale: state is k·8 bytes per user in the state store, partitioned
    * by key; output is one row per ACTIVE user per batch (Update mode);
    * the driver sees nothing. State grows with USER cardinality, not
    * event volume — k longs per ever-seen user. Completion-eviction
    * would be unsound (a re-created empty state would let later events
    * restart the funnel and emit a worse completion than the true
    * earliest one); lifecycles that need eviction should wrap the call
    * with `GroupStateTimeout` and accept that a chain straddling the
    * TTL is lost — the standard streaming state/completeness trade. */
  def statefulFunnel(events: Dataset[FunnelEvent], steps: Seq[String])
      : Dataset[UserFunnel] = {
    import events.sparkSession.implicits._
    require(steps.nonEmpty && steps.distinct == steps,
      s"funnel steps must be non-empty and distinct, got $steps")
    val k = steps.size
    events.groupByKey(_.user_id)
      .mapGroupsWithState[Seq[Long], UserFunnel](GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[FunnelEvent], state: GroupState[Seq[Long]]) =>
          val times = state.getOption.getOrElse(Seq.fill(k)(-1L)).toArray
          rows.toSeq.sortBy(e => (e.ts_us, e.tie)).foreach { e =>
            val i = steps.indexOf(e.event_type)
            if (i == 0) {
              if (times(0) < 0 || e.ts_us < times(0)) times(0) = e.ts_us
            } else if (i > 0) {
              val prevDone = times(i - 1) >= 0 && times(i - 1) < e.ts_us
              if (prevDone && (times(i) < 0 || e.ts_us < times(i)))
                times(i) = e.ts_us
            }
          }
          state.update(times.toSeq)
          UserFunnel(user, times.toSeq)
      }
  }

  final case class DebEvent(user_id: Long, event_type: String, ts_us: Long)
  final case class DebState(first: Long, last: Long, n: Long)
  final case class DebBurst(user_id: Long, event_type: String,
                            ts_first: Long, ts_last: Long, n_collapsed: Long)

  /** Incremental burst collapse — the streaming twin of
    * [[graft.operators.EventAnalytics.debounce]] (same trailing-gap
    * chain semantics, same ε): per (key, type), state is the ONE open
    * burst (first, last, n); an event within ε of `last` extends it,
    * a later one EMITS the closed burst and opens a new one. Emitted
    * rows are exactly the batch operator's bursts minus each key's
    * still-open final burst — the parity law the spec pins on real
    * events split across micro-batches.
    *
    * Contract (the [[statefulFunnel]] law): per-key event-time order
    * across batches — the append-only-log replay shape. State is 24
    * bytes per (key, type) in the partitioned state store; nothing
    * reaches the driver. Production would add a `GroupStateTimeout`
    * to flush long-idle bursts; the operator keeps them open so the
    * parity law stays exact. */
  def statefulDebounce(events: Dataset[DebEvent], epsUs: Long)
      : Dataset[DebBurst] = {
    import events.sparkSession.implicits._
    require(epsUs > 0, s"epsUs must be positive (µs): $epsUs")
    events.groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[DebState, DebBurst](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Long, String), rows: Iterator[DebEvent],
         state: GroupState[DebState]) =>
          val closed = scala.collection.mutable.ArrayBuffer.empty[DebBurst]
          var open = state.getOption.orNull
          rows.toSeq.sortBy(_.ts_us).foreach { e =>
            open match {
              case null =>
                open = DebState(e.ts_us, e.ts_us, 1L)
              case DebState(f, l, n) if e.ts_us - l <= epsUs =>
                open = DebState(f, math.max(l, e.ts_us), n + 1)
              case DebState(f, l, n) =>
                closed += DebBurst(key._1, key._2, f, l, n)
                open = DebState(e.ts_us, e.ts_us, 1L)
            }
          }
          if (open != null) state.update(open)
          closed.iterator
      }
  }

  final case class ScdEvent(user_id: Long, attr: Option[String], ts_us: Long)
  final case class ScdState(attr: Option[String], from: Long, n: Long)
  final case class ScdVersion(user_id: Long, attr: Option[String],
                              valid_from: Long, valid_to: Long,
                              n_events: Long)

  /** Incremental SCD2 — the streaming CDC twin of
    * [[graft.operators.EventAnalytics.scd2Intervals]]: per key, state
    * is the ONE open version (attr, valid_from, n); an event carrying
    * the same attr (NULL-safely) extends it, a changed one EMITS the
    * closed version (valid_to = the new event's ts, the half-open
    * interval law) and opens the next. Emitted rows are exactly the
    * batch operator's CLOSED versions (valid_to non-NULL); each key's
    * open current version lives in state — the parity law the spec
    * pins on real events split across micro-batches.
    *
    * Contract (the [[statefulFunnel]] law): per-key event-time order
    * across batches. State is one (attr, long, long) per key. */
  def statefulScd2(events: Dataset[ScdEvent]): Dataset[ScdVersion] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[ScdState, ScdVersion](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[ScdEvent], state: GroupState[ScdState]) =>
          val closed = scala.collection.mutable.ArrayBuffer.empty[ScdVersion]
          var open = state.getOption.orNull
          rows.toSeq.sortBy(_.ts_us).foreach { e =>
            open match {
              case null =>
                open = ScdState(e.attr, e.ts_us, 1L)
              case ScdState(a, f, n) if a == e.attr =>
                open = ScdState(a, f, n + 1)
              case ScdState(a, f, n) =>
                closed += ScdVersion(user, a, f, e.ts_us, n)
                open = ScdState(e.attr, e.ts_us, 1L)
            }
          }
          if (open != null) state.update(open)
          closed.iterator
      }
  }

  final case class IntervalRow(user_id: Long, s: Long, e: Long)
  final case class IslandState(s: Long, e: Long, n: Long)
  final case class Island(user_id: Long, island_start: Long,
                          island_end: Long, n_merged: Long)

  /** Incremental interval union — the streaming twin of
    * [[graft.operators.EventAnalytics.intervalIslands]]: per key,
    * state is the ONE open island (start, running max end, merged
    * count); an interval whose start is ≤ the open end TOUCHES and
    * merges (the batch tie law), a later one EMITS the closed island
    * and opens the next. Emitted rows are exactly the batch island
    * table minus each key's LAST island (still open in state) — the
    * parity law the spec pins on q177-shaped debounce bursts of real
    * events split across micro-batches. Negative-width intervals
    * refuse loudly — same producer-bug law as the batch operator.
    *
    * Contract (the [[statefulFunnel]] law): per-key start-order
    * across batches — the shape any upstream per-key island source
    * (closed debounce bursts, session spans) already emits. State is
    * 24 bytes per key in the partitioned state store. */
  def statefulIntervalUnion(intervals: Dataset[IntervalRow])
      : Dataset[Island] = {
    import intervals.sparkSession.implicits._
    intervals.groupByKey(_.user_id)
      .flatMapGroupsWithState[IslandState, Island](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[IntervalRow],
         state: GroupState[IslandState]) =>
          val closed = scala.collection.mutable.ArrayBuffer.empty[Island]
          var open = state.getOption.orNull
          rows.toSeq.sortBy(r => (r.s, r.e)).foreach { r =>
            require(r.e >= r.s,
              s"statefulIntervalUnion: end < start for key $user — " +
                "negative-width intervals corrupt the running max; " +
                "fix the producer")
            open match {
              case null =>
                open = IslandState(r.s, r.e, 1L)
              case IslandState(s0, e0, n) if r.s <= e0 =>
                open = IslandState(s0, math.max(e0, r.e), n + 1)
              case IslandState(s0, e0, n) =>
                closed += Island(user, s0, e0, n)
                open = IslandState(r.s, r.e, 1L)
            }
          }
          if (open != null) state.update(open)
          closed.iterator
      }
  }

  final case class LtEvent(user_id: Long, ts_us: Long, tie: Long,
                           event_type: String, value: Option[Double])
  final case class LtState(ts_us: Long, tie: Long, channel: String)
  final case class LtConv(user_id: Long, tie: Long,
                          channel: Option[String], value: Option[Double])

  /** Incremental last-touch attribution — the streaming twin of
    * [[graft.operators.EventAnalytics.lastTouchAttribution]]: per key,
    * state is the ONE most recent touch (ts, tie, channel); a
    * conversion emits itself credited to that touch (None → the
    * `"(none)"` bucket). Unlike the burst/version twins there is NO
    * open tail — every conversion resolves the moment it arrives — so
    * the parity law is EXACT equality: the channel rollup of the
    * emitted conversions equals the batch operator's output, pinned
    * over in-order micro-batch splits of the real events table.
    * Same-timestamp tie law as the batch as-of join: a touch at the
    * conversion's own timestamp counts (at-or-before), later ties by
    * `tie` win.
    *
    * Contract (the [[statefulFunnel]] law): per-key event-time order
    * across batches. State is (long, long, channel) per key. */
  def statefulLastTouch(events: Dataset[LtEvent], conversionType: String)
      : Dataset[LtConv] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[LtState, LtConv](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[LtEvent], state: GroupState[LtState]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[LtConv]
          rows.toSeq.sortBy(e => (e.ts_us,
            if (e.event_type == conversionType) 1 else 0, e.tie))
            .foreach { e =>
              if (e.event_type == conversionType)
                out += LtConv(user, e.tie, state.getOption.map(_.channel),
                  e.value)
              else state.update(LtState(e.ts_us, e.tie, e.event_type))
            }
          out.iterator
      }
  }

  final case class CdcChange(k: Long, ts: Long, tid: Long,
                             v: Option[String], op: String)
  final case class CdcCurrent(k: Long, ts: Long, tid: Long,
                              v: Option[String], alive: Boolean)

  /** Incremental CDC compaction — the streaming twin of
    * [[graft.operators.Cdc.applyChangelog]]: per key, state is the
    * current winner (seq, payload, alive); a change with a HIGHER
    * (ts, tid) replaces it and emits the new current row, a lower or
    * equal one is ignored — which makes this twin order-INDEPENDENT
    * across batches (latest-wins is a max, the same associativity the
    * batch fold has), not merely order-tolerant: the spec feeds
    * SHUFFLED batches and still demands exact parity. Final state per
    * key (its last emission) equals the batch apply: alive rows match
    * `applyChangelog` over the whole feed, dead keys' last emission
    * carries `alive = false` where the batch output simply omits them.
    * Unknown op codes refuse loudly — the [[graft.operators.Cdc]] law. */
  def statefulCdc(changes: Dataset[CdcChange]): Dataset[CdcCurrent] = {
    import changes.sparkSession.implicits._
    val ord = Ordering.Tuple2[Long, Long]
    changes.groupByKey(_.k)
      .flatMapGroupsWithState[CdcCurrent, CdcCurrent](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: Long, rows: Iterator[CdcChange], state: GroupState[CdcCurrent]) =>
          var cur = state.getOption.orNull
          var changed = false
          rows.foreach { c =>
            require(c.op == "U" || c.op == "D",
              s"statefulCdc: unknown op code '${c.op}' for key $k — only " +
                "U (upsert) and D (delete) exist; a dropped delete " +
                "resurrects rows, fix the producer")
            if (cur == null || ord.gt((c.ts, c.tid), (cur.ts, cur.tid))) {
              cur = CdcCurrent(k, c.ts, c.tid, c.v, c.op == "U")
              changed = true
            }
          }
          if (changed) { state.update(cur); Iterator.single(cur) }
          else Iterator.empty
      }
  }

  /** Gap-based session windows (`session_window`) — Spark's native
    * operator for what `Sessionize` builds manually; a session closes
    * when no event arrives within `gap`. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("event_time", "1 hour")
      .groupBy(session_window(col("event_time"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("user_id"), col("n"))
}
