package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.operators.EventAnalytics
import graft.sources.Tables
import graft.streaming.StreamingEngagement

/** Incremental engagement: after N micro-batches, the persisted
  * (key, day) pair state must yield EXACTLY the batch retention and
  * active-users tables over the full event set — the batch-parity
  * proof that the pair table is sufficient state and that the shared
  * derivation cores see no difference between the two paths. */
class StreamingEngagementSpec extends SparkSpec {

  private val Epoch0 = 1704067200000000L    // the cohort epoch the queries use
  private val DayUs = 86400000000L

  private def slurp(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("pair state after 3 micro-batches == batch retention + active-users") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val ev = Tables.events(spark, sf("sf0.001"))
    val evUs = ev.select(col("user_id"),
      GraftFunctions.epochMicros(ev.schema("ts").dataType, col("ts")).as("ts_us"))
    val rows = evUs.as[(Long, Long)].collect().sortBy(identity)
    assert(rows.length > 100)
    val thirds = rows.grouped((rows.length + 2) / 3).toSeq

    val base = java.nio.file.Files.createTempDirectory("graft_seng_").toString
    val input = MemoryStream[(Long, Long)]
    val q = StreamingEngagement.start(
      input.toDS().toDF("user_id", "ts_us"),
      keyCol = "user_id", tsCol = "ts_us",
      pairsDir = s"$base/pairs", checkpoint = s"$base/ckpt",
      cfg = StreamingEngagement.Config(epoch0Us = Epoch0, dayUs = DayUs))
    try {
      // mid-stream: after batch 0 the derived views must equal the
      // batch operators over batch 0's events alone (incrementality,
      // not just a final-state coincidence)
      input.addData(thirds.head.toSeq: _*)
      q.processAllAvailable()
      val firstDf = thirds.head.toSeq.toDF("user_id", "ts_us")
      assert(slurp(StreamingEngagement.activeUsers(spark, s"$base/pairs", 7)) ===
        slurp(EventAnalytics.activeUsers(firstDf, "user_id", "ts_us",
          Epoch0, DayUs, 7)))

      thirds.tail.foreach { part =>
        input.addData(part.toSeq: _*)
        q.processAllAvailable()
      }

      assert(slurp(StreamingEngagement.activeUsers(spark, s"$base/pairs", 7)) ===
        slurp(EventAnalytics.activeUsers(evUs, "user_id", "ts_us",
          Epoch0, DayUs, 7)))
      assert(slurp(StreamingEngagement.retentionCohorts(spark, s"$base/pairs", 7)) ===
        slurp(EventAnalytics.retentionCohorts(evUs, "user_id", "ts_us",
          Epoch0, weekUs = DayUs * 7)))

      // the reader-distinct contract: a double-appended state row (what
      // a crash between append and marker leaves behind on replay)
      // carries a COMMITTED batch id and must not change any derived
      // number — the distinct collapses it
      val before = slurp(StreamingEngagement.activeUsers(spark, s"$base/pairs", 7))
      spark.read.schema(StreamingEngagement.PairsSchema)
        .parquet(s"$base/pairs").limit(5)
        .withColumn("ingest_batch", lit(0L))
        .write.mode("append").partitionBy("day").parquet(s"$base/pairs")
      assert(slurp(StreamingEngagement.activeUsers(spark, s"$base/pairs", 7)) === before)

      // the committed-prefix contract: NEW pairs from a batch with no
      // marker (appended, then crashed before commit) must be invisible
      // to readers — nothing may reflect a partial batch
      import spark.implicits._
      Seq(("ghost_user", 123456L, 999L))
        .toDF("key", "day", "ingest_batch")
        .write.mode("append").partitionBy("day").parquet(s"$base/pairs")
      assert(slurp(StreamingEngagement.activeUsers(spark, s"$base/pairs", 7)) === before)
      assert(StreamingEngagement.pairs(spark, s"$base/pairs")
        .filter(col("key") === "ghost_user").count() === 0L)
    } finally q.stop()
  }

  test("kill between append and marker: readers see only the committed " +
      "prefix; a restart recovers exactly-once") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val ev = Tables.events(spark, sf("sf0.001"))
    val evUs = ev.select(col("user_id"),
      GraftFunctions.epochMicros(ev.schema("ts").dataType, col("ts")).as("ts_us"))
    val rows = evUs.as[(Long, Long)].collect().sortBy(identity)
    val (e0, e1) = rows.splitAt(rows.length / 2)

    val base = java.nio.file.Files.createTempDirectory("graft_seng_crash_").toString
    val pairsDir = s"$base/pairs"
    val cfg = StreamingEngagement.Config(epoch0Us = Epoch0, dayUs = DayUs)
    val input = MemoryStream[(Long, Long)]
    def startStream() = StreamingEngagement.start(
      input.toDS().toDF("user_id", "ts_us"),
      keyCol = "user_id", tsCol = "ts_us",
      pairsDir = pairsDir, checkpoint = s"$base/ckpt", cfg = cfg)

    // ---- batch 0 commits normally, then the stream "dies" ----------
    val q1 = startStream()
    try { input.addData(e0.toSeq: _*); q1.processAllAvailable() }
    finally q1.stop()

    // ---- the crash window: a batch-1 attempt appended PART of its
    // pairs (files on disk, tagged ingest_batch=1) and died before its
    // marker — exactly the on-disk state StreamingEngagement.start
    // leaves when killed between the parquet append and commit()
    val e1Pairs = e1.toSeq.toDF("user_id", "ts_us")
      .select(col("user_id").cast("string").as("key"),
        GraftFunctions.longDiv(col("ts_us") - Epoch0, DayUs).as("day"))
      .distinct()
    e1Pairs.limit(3)
      .withColumn("ingest_batch", lit(1L))
      .write.mode("append").partitionBy("day").parquet(pairsDir)

    // readers between the crash and the restart: ONLY batch 0's
    // committed numbers — nothing may reflect the partial batch
    val committedOnly = slurp(EventAnalytics.activeUsers(
      e0.toSeq.toDF("user_id", "ts_us"), "user_id", "ts_us", Epoch0, DayUs, 7))
    assert(slurp(StreamingEngagement.activeUsers(spark, pairsDir, 7)) ===
      committedOnly)

    // ---- restart from the SAME checkpoint: batch 1 runs fresh (the
    // checkpoint committed only batch 0), must ignore the half-
    // committed ingest_batch=1 rows when deciding what already exists,
    // re-append the FULL pair set, and commit the marker
    val q2 = startStream()
    try { input.addData(e1.toSeq: _*); q2.processAllAvailable() }
    finally q2.stop()

    assert(slurp(StreamingEngagement.activeUsers(spark, pairsDir, 7)) ===
      slurp(EventAnalytics.activeUsers(evUs, "user_id", "ts_us", Epoch0, DayUs, 7)))
    assert(slurp(StreamingEngagement.retentionCohorts(spark, pairsDir, 7)) ===
      slurp(EventAnalytics.retentionCohorts(evUs, "user_id", "ts_us",
        Epoch0, weekUs = DayUs * 7)))
    // exactly-once at the PAIR level too: the double-appended overlap
    // collapses in the reader, so each (key, day) surfaces once
    val p = StreamingEngagement.pairs(spark, pairsDir)
    assert(p.count() === p.distinct().count())
  }
}
