package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean
import graft.operators.Sessionize

/** ScalaCheck property tests for sessionization invariants
  * (SURVEY.md §5): for ANY ascending timestamp series and gap,
  *  - session count = 1 + number of deltas > gap,
  *  - sessions tile the series (row counts sum, bounds nested),
  *  - window ids stay within the session's floor-div window count.
  */
object SessionizeProps extends Properties("Sessionize") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .withExtensions(new graft.plans.GraftExtensions)
    .getOrCreate()

  private val seriesGen: Gen[(List[Long], Long, Long)] = for {
    n <- Gen.choose(2, 60)
    deltas <- Gen.listOfN(n, Gen.choose(1L, 2000L))
    gap <- Gen.choose(50L, 1500L)
    width <- Gen.choose(10L, 500L)
  } yield (deltas.scanLeft(1000L)(_ + _), gap, width)

  property("invariants") = Prop.forAll(seriesGen) { case (series, gap, width) =>
    import spark.implicits._
    val df = series.map(ts => (1L, ts)).toDF("k", "ts")
    val sessions = Sessionize
      .sessionBounds(df, Seq(col("k")), col("ts"), gap, width)
      .orderBy("session_id")
      .select("session_id", "session_start", "session_end", "n_rows", "n_windows")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq

    val expectedSessions =
      1 + series.sorted.sliding(2).count { case Seq(a, b) => b - a > gap; case _ => false }

    val rowsTile = sessions.map(_._4).sum == series.length
    val boundsOrdered = sessions.sliding(2).forall {
      case Seq(a, b) => a._3 < b._2 && b._2 - a._3 > gap
      case _ => true
    }
    val windowCounts = sessions.forall { s => s._5 == (s._3 - s._2) / width }

    val windowed = Sessionize
      .withWindows(df, Seq(col("k")), col("ts"), gap, width)
      .select("session_id", "window_id").as[(Long, Long)].collect()
    val windowInRange = windowed.forall { case (sid, wid) =>
      val s = sessions(sid.toInt); wid >= 0 && wid <= s._5
    }

    (sessions.length == expectedSessions) :| s"session count ${sessions.length} != $expectedSessions" &&
      rowsTile :| "rows tile" &&
      boundsOrdered :| "bounds ordered and gap-separated" &&
      windowCounts :| "floor-div window counts" &&
      windowInRange :| "window ids within session range"
  }
}
