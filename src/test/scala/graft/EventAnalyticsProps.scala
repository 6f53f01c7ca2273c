package graft

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean
import graft.operators.EventAnalytics

/** Property tests for the cohort/engagement operators: for ANY random
  * event set, retention and active-user tables equal brute-force
  * definitions computed driver-side, and their structural invariants
  * hold (offset-0 retention is the cohort census, WAU ≥ DAU). */
object EventAnalyticsProps extends Properties("EventAnalytics") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .withExtensions(new graft.plans.GraftExtensions)
    .getOrCreate()

  private val Week = 100L
  private val gen = for {
    n <- Gen.choose(1, 80)
    keys <- Gen.choose(1, 6)
    evs <- Gen.listOfN(n, for {
      k <- Gen.choose(1L, keys.toLong)
      ts <- Gen.choose(0L, 999L)   // 10 weeks of width 100
    } yield (k, ts))
  } yield evs

  property("retentionCohorts equals the brute-force definition; census law holds") =
    Prop.forAll(gen) { evs =>
      import spark.implicits._
      val got = EventAnalytics.retentionCohorts(
          evs.toDF("user_id", "ts_us"), "user_id", "ts_us",
          epoch0Us = 0L, weekUs = Week)
        .select("cohort_week", "week_offset", "users", "cohort_size")
        .as[(Long, Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4)).toMap

      val weeks = evs.map { case (k, ts) => (k, ts / Week) }.distinct
      val cohort = weeks.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      val want = weeks.groupBy { case (k, w) => (cohort(k), w - cohort(k)) }
        .view.mapValues(_.map(_._1).distinct.size.toLong).toMap
      val census = want.collect { case ((c, 0L), n) => c -> n }

      (got.view.mapValues(_._1).toMap == want: Prop) &&
        (got.forall { case ((c, _), (_, size)) => size == census(c) }: Prop)
    }

  property("activeUsers equals brute force; WAU >= DAU always") =
    Prop.forAll(gen) { evs =>
      import spark.implicits._
      val W = 3
      val got = EventAnalytics.activeUsers(
          evs.toDF("user_id", "ts_us"), "user_id", "ts_us",
          epoch0Us = 0L, dayUs = Week, windowDays = W)
        .select("day", "dau", "wau")
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap

      val pairs = evs.map { case (k, ts) => (k, ts / Week) }.distinct
      val days = pairs.map(_._2).distinct
      val want = days.map { d =>
        val dau = pairs.count(_._2 == d).toLong
        val wau = pairs.filter { case (_, pd) => pd <= d && pd > d - W }
          .map(_._1).distinct.size.toLong
        d -> (dau, wau)
      }.toMap

      (got == want: Prop) &&
        (got.values.forall { case (dau, wau) => wau >= dau }: Prop)
    }
}
