package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

/** Structured Streaming end to end: the file-source stream over the
  * sf0.001 events parquet, tumbling-window aggregation with watermark,
  * memory sink — asserted equal to the identical batch computation
  * (same transform function, batch DataFrame input). */
class StreamingSpec extends SparkSpec {

  test("H5 streaming tumbling counts == batch tumbling counts") {
    val dir = sf("sf0.001")
    val streamed = EventStreams.tumblingCounts(
      EventStreams.readEventStream(spark, dir))
    val q = streamed.writeStream
      .format("memory").queryName("tumbling_out").outputMode("complete")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamResult = spark.table("tumbling_out")
      .select("w_start", "event_type", "n", "sum_value")
      .collect().map(_.toSeq).toSet

    val batch = EventStreams.tumblingCounts(
      EventStreams.withEventTime(
        graft.sources.Tables.events(spark, dir)))
      .collect().map(_.toSeq).toSet

    assert(streamResult.nonEmpty)
    assert(streamResult === batch)
  }

  test("H5 stream-static enrichment joins each micro-batch against the dim") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val input = MemoryStream[(Long, Long)]
    val enriched = EventStreams.enrich(
      input.toDS().toDF("event_id", "user_id"), dim, "user_id")
    val q = enriched.writeStream
      .format("memory").queryName("enrich_out").outputMode("append")
      .start()
    try {
      input.addData((10L, 1L), (11L, 3L))
      q.processAllAvailable()
      input.addData((12L, 2L))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("enrich_out")
      .select("event_id", "tier").as[(Long, Option[String])]
      .collect().toMap
    assert(out === Map(10L -> Some("gold"), 11L -> None, 12L -> Some("silver")))
  }

  test("H5 streaming exact dedup drops cross-batch replays within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val deduped = EventStreams.dedupWithinWatermark(
      input.toDS().toDF("event_id", "event_time"), "10 minutes", "event_id")
    val q = deduped.writeStream
      .format("memory").queryName("dedup_out").outputMode("append")
      .start()
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    try {
      input.addData((1L, ts(0)), (2L, ts(1)), (1L, ts(2))) // intra-batch replay
      q.processAllAvailable()
      input.addData((2L, ts(3)), (3L, ts(4)))              // cross-batch replay
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("dedup_out").select("event_id")
      .as[Long].collect().toSeq
    // each id exactly once, replays dropped while their state is live
    assert(out.sorted === Seq(1L, 2L, 3L))
  }

  test("H4×H5 curation expressions run unchanged in a streaming micro-batch") {
    // quality stats, language ID, PII redaction, fingerprints, and the
    // seeded split are pure per-row expressions — the SAME operator
    // calls must lift from batch to readStream with no code change
    // (stateless projections need no watermark or state store)
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    val input = MemoryStream[(Long, String)]
    val curated = graft.operators.Sampling.seededSplit(
      graft.operators.TextAnalysis.withFingerprints(
        graft.operators.TextAnalysis.withTextStats(
          input.toDS().toDF("doc_id", "text")
            .withColumn("text", graft.operators.TextAnalysis.redact(col("text"))),
          col("text")),
        col("text")),
      col("doc_id"), "s1", Seq(("train", 0.8), ("test", 0.2)))
    val q = curated.writeStream
      .format("memory").queryName("curate_out").outputMode("append")
      .start()
    try {
      input.addData(
        (1L, "the quick brown fox mails fox@example.com all day"),
        (2L, "la casa de el perro y la en la casa"))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("curate_out")
    val rows = out.select("doc_id", "text", "n_tokens", "fingerprint", "split")
      .as[(Long, String, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(rows(1L)._2.contains("<EMAIL>") && !rows(1L)._2.contains("example.com"))
    assert(rows.values.forall(r => r._3 > 0))
    assert(rows.values.map(_._5).forall(Set("train", "test")))

    // batch twin on the identical input produces identical values
    val batch = graft.operators.Sampling.seededSplit(
      graft.operators.TextAnalysis.withFingerprints(
        graft.operators.TextAnalysis.withTextStats(
          Seq((1L, "the quick brown fox mails fox@example.com all day"),
            (2L, "la casa de el perro y la en la casa")).toDF("doc_id", "text")
            .withColumn("text", graft.operators.TextAnalysis.redact(col("text"))),
          col("text")),
        col("text")),
      col("doc_id"), "s1", Seq(("train", 0.8), ("test", 0.2)))
      .select("doc_id", "text", "n_tokens", "fingerprint", "split")
      .as[(Long, String, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(batch === rows)
  }

  test("H5 session windows close after the gap (batch mode)") {
    val dir = sf("sf0.001")
    val sessions = EventStreams.sessionCounts(
      EventStreams.withEventTime(graft.sources.Tables.events(spark, dir)))
      .collect()
    assert(sessions.nonEmpty)
    // every session spans at least the gap (end = last event + 30 min)
    assert(sessions.forall { r =>
      r.getAs[java.sql.Timestamp]("s_end").getTime -
        r.getAs[java.sql.Timestamp]("s_start").getTime >= 30 * 60 * 1000
    })
  }
}
