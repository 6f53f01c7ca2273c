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
