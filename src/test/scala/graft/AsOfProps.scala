package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean
import graft.operators.AsOf

/** Property test for the as-of join: for ANY generated left/right
  * timelines, the operator's result equals the brute-force definition
  * "the right row with the greatest ts ≤ left.ts (ties: greatest
  * event_id), per key". */
object AsOfProps extends Properties("AsOf") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .withExtensions(new graft.plans.GraftExtensions)
    .getOrCreate()

  private val gen = for {
    nLeft <- Gen.choose(1, 40)
    nRight <- Gen.choose(0, 40)
    keys <- Gen.choose(1, 3)
    leftTs <- Gen.listOfN(nLeft, Gen.choose(0L, 500L))
    leftKeys <- Gen.listOfN(nLeft, Gen.choose(1L, keys.toLong))
    rightTs <- Gen.listOfN(nRight, Gen.choose(0L, 500L))
    rightKeys <- Gen.listOfN(nRight, Gen.choose(1L, keys.toLong))
  } yield (leftKeys.zip(leftTs), rightKeys.zip(rightTs))

  property("matches brute-force most-recent-at-or-before (incl. NULL observations)") =
    Prop.forAll(gen) { case (left, right) =>
      import spark.implicits._
      // every 5th-ish right row carries a genuinely NULL value: the
      // most recent observation must still win (yielding NULL), never
      // fall back to an older non-null one
      val rightRows = right.zipWithIndex.map { case ((k, ts), i) =>
        val v = if ((ts + i) % 5 == 0) None else Some(ts * 1.5 + i)
        (k, ts, 2000L + i, v)
      }
      val leftDf = left.zipWithIndex
        .map { case ((k, ts), i) => (k, ts, 1000L + i) }
        .toDF("k", "ts", "event_id")
      val rightDf = rightRows.toDF("k", "ts", "event_id", "v")

      val got = AsOf.join(leftDf, rightDf, keys = Seq("k"), ts = "ts",
          valueCol = "v", tieBreak = Seq("event_id"))
        .select("k", "ts", "event_id", "asof_v")
        .as[(Long, Long, Long, Option[Double])].collect()
        .map(r => (r._1, r._2, r._3) -> r._4).toMap

      val expected = left.zipWithIndex.map { case ((k, ts), i) =>
        val candidates = rightRows.filter(r => r._1 == k && r._2 <= ts)
        val best = if (candidates.isEmpty) None
          else candidates.maxBy(r => (r._2, r._3))._4
        (k, ts, 1000L + i.toLong) -> best
      }.toMap

      (got == expected) :| s"got $got\nexpected $expected"
    }

  property("internal column names never collide with user columns") =
    Prop.forAll(Gen.choose(1L, 5L)) { seed =>
      import spark.implicits._
      // left frame already owns _side/_ts/_rv — the operator must pick
      // fresh internal names instead of silently overwriting them
      val leftDf = Seq((1L, 10L, seed, "x", 7L))
        .toDF("k", "ts", "_side", "_rv", "_ts")
      val rightDf = Seq((1L, 5L, 42.0)).toDF("k", "ts", "v")
      val out = AsOf.join(leftDf, rightDf, keys = Seq("k"), ts = "ts",
        valueCol = "v").collect()
      (out.length == 1 &&
        out.head.getAs[Double]("asof_v") == 42.0 &&
        out.head.getAs[Long]("_side") == seed &&
        out.head.getAs[String]("_rv") == "x" &&
        out.head.getAs[Long]("_ts") == 7L) :| out.mkString(",")
    }
}
