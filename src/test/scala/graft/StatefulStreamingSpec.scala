package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventStreams
import graft.streaming.EventStreams.{UserEvent, UserSessionCount}

/** Custom streaming state end to end: a MemoryStream drives
  * `flatMapGroupsWithState` across two micro-batches; the per-user
  * session counter must carry state across the batch boundary. */
class StatefulStreamingSpec extends SparkSpec {

  test("flatMapGroupsWithState session counter persists across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val gapUs = 1000000L    // 1s gap
    val input = MemoryStream[UserEvent]
    val counts = EventStreams.statefulSessionCounts(input.toDS(), gapUs)
    val q = counts.writeStream
      .format("memory").queryName("session_counts").outputMode("update")
      .start()
    try {
      // batch 1: user 1 -> two events 100ms apart (one session);
      //          user 2 -> two events 2s apart (two sessions)
      input.addData(
        UserEvent(1L, 1000000L), UserEvent(1L, 1100000L),
        UserEvent(2L, 1000000L), UserEvent(2L, 3100000L))
      q.processAllAvailable()
      val b1 = spark.table("session_counts").as[UserSessionCount]
        .collect().map(c => c.user_id -> c.n_sessions).toMap
      assert(b1 === Map(1L -> 1L, 2L -> 2L))

      // batch 2: user 1 again after a big gap -> second session opens,
      // proving state survived the micro-batch boundary
      input.addData(UserEvent(1L, 10000000L), UserEvent(1L, 10050000L))
      q.processAllAvailable()
      val b2 = spark.table("session_counts").as[UserSessionCount]
        .collect().groupBy(_.user_id).map { case (u, rows) =>
          u -> rows.map(_.n_sessions).max }
      assert(b2(1L) === 2L)
      assert(b2(2L) === 2L)
    } finally q.stop()
  }

  test("a cross-batch straggler cannot regress the session watermark and inflate counts") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val gapUs = 10L
    val input = MemoryStream[UserEvent]
    val counts = EventStreams.statefulSessionCounts(input.toDS(), gapUs)
    val q = counts.writeStream
      .format("memory").queryName("session_counts_late").outputMode("update")
      .start()
    try {
      input.addData(UserEvent(1L, 100L))
      q.processAllAvailable()
      // late straggler INSIDE the open session: unguarded, it would
      // overwrite lastTs 100 → 95 …
      input.addData(UserEvent(1L, 95L))
      q.processAllAvailable()
      // … and this event (107 − 95 = 12 > gap) would then open a
      // phantom second session; the true timeline 95,100,107 has max
      // gap 7 → ONE session
      input.addData(UserEvent(1L, 107L))
      q.processAllAvailable()
      val n = spark.table("session_counts_late").as[UserSessionCount]
        .collect().map(_.n_sessions).max
      assert(n === 1L, s"late arrival inflated the session count to $n")
    } finally q.stop()
  }

  test("statefulFunnel over 3 in-order batches equals batch funnelTimes") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.streaming.EventStreams.{FunnelEvent, UserFunnel}

    val steps = Seq("view", "click", "purchase")
    val ev = graft.sources.Tables.load(spark, sf("sf0.001"), "events")
    val evUs = ev.withColumn("ts_us",
      graft.functions.GraftFunctions.epochMicros(ev.schema("ts").dataType, col("ts")))

    // batch oracle
    val expected = graft.operators.EventAnalytics
      .funnelTimes(evUs, "user_id", "ts_us", "event_type", steps, "event_id")
      .collect().map { r =>
        r.getLong(0) -> (1 to 3).map(i =>
          if (r.isNullAt(i)) -1L else r.getLong(i)).toSeq
      }.toMap

    // stream the same events in GLOBAL ts order, cut into 3 batches —
    // in-order per key across batches, as the operator's contract asks
    val all = evUs.select(col("user_id"), col("ts_us"),
        col("event_id").as("tie"), col("event_type"))
      .as[FunnelEvent].collect().sortBy(e => (e.ts_us, e.tie))
    val batches = all.grouped((all.length + 2) / 3).toSeq
    val input = MemoryStream[FunnelEvent]
    val q = EventStreams.statefulFunnel(input.toDS(), steps)
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("update").start()
    try {
      batches.foreach { b => input.addData(b.toIndexedSeq); q.processAllAvailable() }
      // Update mode re-emits a user on every batch it appears in; state
      // only ever improves, so the final value per step is the min of
      // the non-sentinel emissions
      val got = spark.table("funnel_out").as[UserFunnel].collect()
        .groupBy(_.user_id).map { case (u, rows) =>
          u -> (0 until 3).map { i =>
            val set = rows.map(_.times(i)).filter(_ >= 0)
            if (set.isEmpty) -1L else set.min
          }
        }
      assert(got.size === expected.size)
      got.foreach { case (u, times) => assert(times === expected(u),
        s"user $u: streamed $times vs batch ${expected(u)}") }
    } finally q.stop()
  }

  test("statefulDebounce over 3 in-order batches == batch debounce minus open bursts") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.streaming.EventStreams.{DebBurst, DebEvent}

    val eps = 21600000000L // 6 h, the q177 setting
    val ev = graft.sources.Tables.load(spark, sf("sf0.001"), "events")
    val evUs = ev.withColumn("ts_us",
      graft.functions.GraftFunctions.epochMicros(ev.schema("ts").dataType, col("ts")))

    val batchBursts = graft.operators.EventAnalytics
      .debounce(evUs, "user_id", "ts_us", "event_type", "event_id", eps)
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => DebBurst(r._1, r._2, r._3, r._4, r._5)).toSet
    // each (key, type)'s LAST burst is still open in the stream's state
    val openBursts = batchBursts.groupBy(b => (b.user_id, b.event_type))
      .values.map(_.maxBy(_.ts_first)).toSet

    val all = evUs.select(col("user_id"), col("event_type"), col("ts_us"))
      .as[DebEvent].collect().sortBy(_.ts_us)
    val batches = all.grouped((all.length + 2) / 3).toSeq
    val input = MemoryStream[DebEvent]
    val q = EventStreams.statefulDebounce(input.toDS(), eps)
      .writeStream.format("memory").queryName("deb_out")
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b.toIndexedSeq); q.processAllAvailable() }
      val got = spark.table("deb_out").as[DebBurst].collect().toSet
      assert(got === (batchBursts -- openBursts),
        s"streamed ${got.size} vs batch-closed ${(batchBursts -- openBursts).size}")
      assert(got.nonEmpty, "parity corpus must actually close bursts")
    } finally q.stop()
  }

  test("statefulScd2 over 3 in-order batches == batch intervals' closed versions") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.streaming.EventStreams.{ScdEvent, ScdVersion}

    val ev = graft.sources.Tables.load(spark, sf("sf0.001"), "events")
    val evUs = ev.withColumn("ts_us",
      graft.functions.GraftFunctions.epochMicros(ev.schema("ts").dataType, col("ts")))

    // batch truth: CLOSED versions only (valid_to non-NULL); the open
    // current version per key lives in the stream's state
    val closed = graft.operators.EventAnalytics
      .scd2Intervals(evUs, "user_id", "ts_us", "event_type", "event_id")
      .filter(col("valid_to").isNotNull)
      .as[(Long, Option[String], Long, Long, Long)].collect()
      .map(r => ScdVersion(r._1, r._2, r._3, r._4, r._5)).toSet

    val all = evUs.select(col("user_id"), col("event_type").as("attr"),
        col("ts_us"))
      .as[ScdEvent].collect().sortBy(_.ts_us)
    val batches = all.grouped((all.length + 2) / 3).toSeq
    val input = MemoryStream[ScdEvent]
    val q = EventStreams.statefulScd2(input.toDS())
      .writeStream.format("memory").queryName("scd_out")
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b.toIndexedSeq); q.processAllAvailable() }
      val got = spark.table("scd_out").as[ScdVersion].collect().toSet
      assert(got === closed,
        s"streamed ${got.size} vs batch-closed ${closed.size}")
      assert(got.nonEmpty, "parity corpus must close versions")
    } finally q.stop()
  }

  test("statefulIntervalUnion over 3 in-order batches == batch islands minus open tails") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.streaming.EventStreams.{Island, IntervalRow}

    // q187's interval source: debounce bursts of the real events table
    val eps = 21600000000L
    val ev = graft.sources.Tables.load(spark, sf("sf0.001"), "events")
    val evUs = ev.withColumn("ts_us",
      graft.functions.GraftFunctions.epochMicros(ev.schema("ts").dataType, col("ts")))
    val bursts = graft.operators.EventAnalytics
      .debounce(evUs, "user_id", "ts_us", "event_type", "event_id", eps)
      .select(col("user_id"), col("ts_first").as("s"), col("ts_last").as("e"))

    val batchIslands = graft.operators.EventAnalytics
      .intervalIslands(bursts, "user_id", "s", "e")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => Island(r._1, r._2, r._3, r._4)).toSet
    // each key's LAST island is still open in the stream's state
    val openTails = batchIslands.groupBy(_.user_id)
      .values.map(_.maxBy(_.island_start)).toSet

    // global (s, e) order gives the per-key start order the contract asks
    val all = bursts.as[IntervalRow].collect().sortBy(r => (r.s, r.e))
    val batches = all.grouped((all.length + 2) / 3).toSeq
    val input = MemoryStream[IntervalRow]
    val q = EventStreams.statefulIntervalUnion(input.toDS())
      .writeStream.format("memory").queryName("iu_out")
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b.toIndexedSeq); q.processAllAvailable() }
      val got = spark.table("iu_out").as[Island].collect().toSet
      assert(got === (batchIslands -- openTails),
        s"streamed ${got.size} vs batch-closed ${(batchIslands -- openTails).size}")
      assert(got.nonEmpty, "parity corpus must actually close islands")
    } finally q.stop()
  }

  test("statefulLastTouch over 3 in-order batches == batch attribution EXACTLY") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.streaming.EventStreams.{LtConv, LtEvent}

    val ev = graft.sources.Tables.load(spark, sf("sf0.001"), "events")
    val evUs = ev.withColumn("ts_us",
      graft.functions.GraftFunctions.epochMicros(ev.schema("ts").dataType, col("ts")))
    val batch = graft.operators.EventAnalytics.lastTouchAttribution(
        evUs.select(col("user_id"), col("ts_us"), col("event_id"),
          col("event_type"), col("value")),
        "user_id", "ts_us", "event_type", conversionType = "purchase",
        valueCol = "value", tie = "event_id")
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

    val all = evUs.select(col("user_id"), col("ts_us"),
        col("event_id").as("tie"), col("event_type"), col("value"))
      .as[LtEvent].collect().sortBy(e => (e.ts_us, e.tie))
    val batches = all.grouped((all.length + 2) / 3).toSeq
    val input = MemoryStream[LtEvent]
    val q = EventStreams.statefulLastTouch(input.toDS(), "purchase")
      .writeStream.format("memory").queryName("lt_out")
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b.toIndexedSeq); q.processAllAvailable() }
      // every conversion resolves on arrival — NO open tail, so the
      // rollup of the emitted stream equals the batch operator exactly
      val got = spark.table("lt_out").as[LtConv].collect()
        .groupBy(_.channel.getOrElse("(none)"))
        .map { case (ch, rows) =>
          ch -> (rows.length.toLong, rows.flatMap(_.value).sum) }
      assert(got.keySet === batch.keySet)
      got.foreach { case (ch, (n, rev)) =>
        assert(n === batch(ch)._1, s"$ch count")
        assert(math.abs(rev - batch(ch)._2) < 0.006,
          s"$ch revenue $rev vs ${batch(ch)._2}")
      }
    } finally q.stop()
  }

  test("statefulCdc over SHUFFLED batches == batch applyChangelog (order independence)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.EventStreams.{CdcChange, CdcCurrent}

    val rnd = new scala.util.Random(7)
    val log = (0 until 300).map { i =>
      CdcChange(rnd.nextInt(15).toLong, rnd.nextInt(40).toLong * 10,
        i.toLong, Some(s"v$i"), if (rnd.nextInt(4) == 0) "D" else "U")
    }
    // batch truth via the associative operator itself (spec-pinned
    // against a plain fold in CdcSpec)
    val empty = Seq.empty[(Long, Long, Long, Option[String])]
      .toDF("k", "ts", "tid", "v")
    val batch = graft.operators.Cdc.applyChangelog(empty,
        log.toDF("k", "ts", "tid", "v", "op"),
        Seq("k"), Seq("ts", "tid"), "op")
      .as[(Long, Long, Long, Option[String])].collect().toSet

    // SHUFFLED batches: latest-wins is a max, so the twin must not
    // care about arrival order at all
    val shuffled = rnd.shuffle(log)
    val batches = shuffled.grouped(100).toSeq
    val input = MemoryStream[CdcChange]
    val q = EventStreams.statefulCdc(input.toDS())
      .writeStream.format("memory").queryName("cdc_out")
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b.toIndexedSeq); q.processAllAvailable() }
      // final state per key = its emission with the highest (ts, tid)
      val finals = spark.table("cdc_out").as[CdcCurrent].collect()
        .groupBy(_.k).values.map(_.maxBy(c => (c.ts, c.tid)))
      val got = finals.filter(_.alive).map(c => (c.k, c.ts, c.tid, c.v)).toSet
      assert(got === batch, s"streamed ${got.size} vs batch ${batch.size}")
      assert(got.nonEmpty && finals.exists(!_.alive),
        "corpus must exercise both live and deleted keys")
    } finally q.stop()
  }

  test("statefulCdc refuses an unknown op code loudly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.EventStreams.CdcChange
    val input = MemoryStream[CdcChange]
    val q = EventStreams.statefulCdc(input.toDS())
      .writeStream.format("memory").queryName("cdc_bad")
      .outputMode("append").start()
    try {
      input.addData(CdcChange(1L, 0L, 0L, Some("x"), "upsert"))
      val boom = intercept[Exception] { q.processAllAvailable() }
      assert(Iterator.iterate(boom: Throwable)(_.getCause).takeWhile(_ != null)
        .flatMap(t => Option(t.getMessage)).mkString.contains("unknown op code"))
    } finally q.stop()
  }

  test("statefulIntervalUnion refuses a negative-width interval loudly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.EventStreams.IntervalRow
    val input = MemoryStream[IntervalRow]
    val q = EventStreams.statefulIntervalUnion(input.toDS())
      .writeStream.format("memory").queryName("iu_bad")
      .outputMode("append").start()
    try {
      input.addData(IntervalRow(1L, 10L, 5L))
      val boom = intercept[Exception] { q.processAllAvailable() }
      assert(Iterator.iterate(boom: Throwable)(_.getCause).takeWhile(_ != null)
        .flatMap(t => Option(t.getMessage)).mkString.contains("negative-width"))
    } finally q.stop()
  }

  test("stream-stream interval join matches within the bound, across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._

    val clicks = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp)]
    val buys = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp)]
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

    val joined = EventStreams.intervalJoin(
      clicks.toDS().toDF("user_id", "event_time"),
      buys.toDS().toDF("user_id", "event_time"),
      key = "user_id", within = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    try {
      // purchase arrives in an EARLIER batch than the click that joins it
      buys.addData((1L, ts(0)), (2L, ts(0)))
      q.processAllAvailable()
      clicks.addData((1L, ts(5)),   // joins: 5 min after user 1's buy
        (2L, ts(30)),               // no join: 30 min > bound
        (3L, ts(6)))                // no join: no buy for user 3
      q.processAllAvailable()
      val rows = spark.table("ssj_out")
        .select("user_id", "left_time", "right_time")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp)].collect().toSet
      assert(rows === Set((1L, ts(5), ts(0))))
    } finally q.stop()
  }

  test("watermark drops late data in append-mode tumbling windows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._

    // 10-minute watermark, 5-minute tumbling windows over event_time
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp)]
    val agg = input.toDS().toDF("id", "event_time")
      .withWatermark("event_time", "10 minutes")
      .groupBy(window(col("event_time"), "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w"), col("n"))
    val q = agg.writeStream.format("memory").queryName("late_out")
      .outputMode("append").start()
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    try {
      // batch 1: events at 10:00 and 10:01 (window 10:00)
      input.addData((1L, ts(0)), (2L, ts(1)))
      q.processAllAvailable()
      // batch 2: event at 10:30 advances the watermark to 10:20 —
      // the 10:00 window finalizes and is emitted
      input.addData((3L, ts(30)))
      q.processAllAvailable()
      val afterAdvance = spark.table("late_out")
        .as[(java.sql.Timestamp, Long)].collect().toMap
      assert(afterAdvance(java.sql.Timestamp.valueOf("2024-01-01 10:00:00")) === 2L)
      // batch 3: a LATE event for the finalized 10:00 window — dropped
      input.addData((4L, ts(2)))
      q.processAllAvailable()
      val afterLate = spark.table("late_out")
        .as[(java.sql.Timestamp, Long)].collect().toMap
      assert(afterLate(java.sql.Timestamp.valueOf("2024-01-01 10:00:00")) === 2L,
        "late event must not reopen the finalized window")
    } finally q.stop()
  }
}
