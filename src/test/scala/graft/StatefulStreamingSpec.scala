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
}
