package graft

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean
import graft.operators.EventAnalytics

/** Property test for the funnel: for ANY generated event timeline, the
  * chained-window implementation equals the semantic DEFINITION — fold
  * the per-key events in (ts, tie) order, a step-k event completes iff
  * step k−1 completed STRICTLY earlier, earliest completion wins — and
  * the completion chain is monotone (t1 ≤ t2 ≤ t3, a reached step
  * implies all earlier steps reached). */
object FunnelProps extends Properties("Funnel") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .withExtensions(new graft.plans.GraftExtensions)
    .getOrCreate()

  private val Steps = Seq("s1", "s2", "s3")
  private val Types = Steps ++ Seq("noise")

  // small ts domain on purpose: same-timestamp collisions (the tie
  // edge the strict-< law exists for) must actually occur
  private val gen = for {
    n <- Gen.choose(1, 60)
    keys <- Gen.choose(1, 4)
    evs <- Gen.listOfN(n, for {
      k <- Gen.choose(1L, keys.toLong)
      ts <- Gen.choose(0L, 30L)
      tpe <- Gen.oneOf(Types)
    } yield (k, ts, tpe))
  } yield evs.zipWithIndex.map { case ((k, ts, t), i) => (k, ts, i.toLong, t) }

  private def reference(evs: Seq[(Long, Long, Long, String)])
      : Map[Long, Seq[Option[Long]]] =
    evs.groupBy(_._1).view.mapValues { rows =>
      val times = Array.fill[Option[Long]](Steps.size)(None)
      rows.sortBy(e => (e._2, e._3)).foreach { case (_, ts, _, tpe) =>
        val i = Steps.indexOf(tpe)
        if (i == 0) {
          if (times(0).forall(ts < _)) times(0) = Some(ts)
        } else if (i > 0) {
          if (times(i - 1).exists(_ < ts) && times(i).forall(ts < _))
            times(i) = Some(ts)
        }
      }
      times.toSeq
    }.toMap

  property("equals the definitional fold; chain is monotone") =
    Prop.forAll(gen) { evs =>
      import spark.implicits._
      val df = evs.toDF("user_id", "ts_us", "event_id", "event_type")
      val got = EventAnalytics
        .funnelTimes(df, "user_id", "ts_us", "event_type", Steps, "event_id")
        .as[(Long, Option[Long], Option[Long], Option[Long])]
        .collect().map(r => r._1 -> Seq(r._2, r._3, r._4)).toMap
      val want = reference(evs)
      val monotone = got.values.forall { ts =>
        val reached = ts.flatten
        ts.zip(ts.drop(1)).forall {
          case (Some(a), Some(b)) => a <= b
          case (None, Some(_)) => false              // gap in the chain
          case _ => true
        } && reached == reached.sorted
      }
      (got == want: Prop) && (monotone: Prop)
    }
}
