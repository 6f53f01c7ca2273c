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

  // ------------------------------------------------------------------ //
  // PSI and the Markov transition matrix — brute-force symmetry for    //
  // the two members of the family that previously had only oracle +    //
  // unit coverage.                                                     //
  // ------------------------------------------------------------------ //

  private val Bins = 5
  private val psiGen = for {
    n <- Gen.choose(1, 80)
    groups <- Gen.choose(1, 4)    // groups == 1 pins the identity law
    evs <- Gen.listOfN(n, for {
      g <- Gen.choose(1, groups)
      v <- Gen.frequency(
        9 -> Gen.choose(-2.0, 12.0).map(Option(_)),  // includes out-of-range → clamped bins
        1 -> Gen.const(Option.empty[Double]))        // NULL: excluded from the statistic
    } yield (s"g$g", v))
  } yield (groups, evs)

  property("psiDrift equals brute force; PSI >= 0; single group => exactly 0") =
    Prop.forAll(psiGen) { case (groups, evs) =>
      import spark.implicits._
      val got = EventAnalytics.psiDrift(
          evs.toDF("grp", "v"), "grp", org.apache.spark.sql.functions.col("v"),
          lo = 0.0, hi = 10.0, bins = Bins)
        .as[(String, Double)].collect().toMap

      // brute force, same add-1/2 smoothing, NULL values excluded
      val defined = evs.collect { case (g, Some(v)) => (g, v) }
      val width = 10.0 / Bins
      def binOf(v: Double): Int =
        math.min(math.max(math.floor((v - 0.0) / width), 0.0), (Bins - 1).toDouble).toInt
      val cells = defined.groupBy { case (g, v) => (g, binOf(v)) }
        .view.mapValues(_.size.toLong).toMap
      val rt = defined.size.toDouble
      def p(b: Int): Double =
        (cells.collect { case ((_, bb), n) if bb == b => n }.sum + 0.5) / (rt + 0.5 * Bins)
      val want = defined.map(_._1).distinct.map { g =>
        val qt = defined.count(_._1 == g).toDouble
        val psi = (0 until Bins).map { b =>
          val q = (cells.getOrElse((g, b), 0L) + 0.5) / (qt + 0.5 * Bins)
          (q - p(b)) * math.log(q / p(b))
        }.sum
        g -> math.floor(psi * 1e6 + 0.5) / 1e6
      }.toMap

      val eq = got.keySet == want.keySet &&
        want.forall { case (g, w) => math.abs(got(g) - w) <= 2e-6 }
      val nonNeg = got.values.forall(_ >= 0.0)
      val identity = groups > 1 || defined.isEmpty || got.values.forall(_ == 0.0)
      (eq: Prop) && (nonNeg: Prop) && (identity: Prop)
    }

  private val Gap = 50L
  private val markovGen = for {
    n <- Gen.choose(2, 80)
    keys <- Gen.choose(1, 4)
    evs <- Gen.listOfN(n, for {
      k <- Gen.choose(1L, keys.toLong)
      ts <- Gen.choose(0L, 400L)
      t <- Gen.oneOf("a", "b", "c")
    } yield (k, ts, t))
  } yield evs.zipWithIndex.map { case ((k, ts, t), i) => (k, ts, i.toLong, t) }

  property("transitionMatrix equals brute force; rows are stochastic (sum p = 1)") =
    Prop.forAll(markovGen) { evs =>
      import spark.implicits._
      val got = EventAnalytics.transitionMatrix(
          evs.toDF("user_id", "ts_us", "event_id", "event_type"),
          key = "user_id", ts = "ts_us", tie = "event_id",
          typeCol = "event_type", gapUs = Gap)
        .select("prev_type", "next_type", "n", "p")
        .as[(String, String, Long, Double)].collect()

      // brute force: per key order by (ts, tie), session split on
      // delta > gap, count in-session adjacent (prev -> next) pairs
      val pairs = evs.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        val sorted = rows.sortBy(r => (r._2, r._3))
        sorted.zip(sorted.drop(1)).collect {
          case (a, b) if b._2 - a._2 <= Gap => (a._4, b._4)
        }
      }
      val wantN = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val outTotals = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap

      val gotN = got.map(r => (r._1, r._2) -> r._3).toMap
      val countsEq = gotN == wantN
      val pEq = got.forall { case (a, b, n, pv) =>
        math.abs(pv - math.floor(n * 1.0 / outTotals(a) * 1e6 + 0.5) / 1e6) <= 1e-12
      }
      val stochastic = got.groupBy(_._1).forall { case (_, rows) =>
        math.abs(rows.map(_._4).sum - 1.0) <= rows.size * 5e-7 + 1e-9
      }
      (countsEq: Prop) && (pEq: Prop) && (stochastic: Prop)
    }

  private def bruteSessions(evs: Seq[(Long, Long, Long, String)], gap: Long)
      : Seq[(Long, Long, String)] =
    evs.groupBy(_._1).toSeq.flatMap { case (k, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      val sids = sorted.scanLeft((0L, Option.empty[Long])) {
        case ((sid, prev), r) =>
          (if (prev.exists(p => r._2 - p > gap)) sid + 1 else sid, Some(r._2))
      }.drop(1).map(_._1)
      sorted.zip(sids).map { case (r, sid) => (k, sid, r._4) }
    }

  property("associationRules equals the brute-force basket definition") =
    Prop.forAll(markovGen) { evs =>
      import spark.implicits._
      val got = EventAnalytics.associationRules(
          evs.toDF("user_id", "ts_us", "event_id", "event_type"),
          key = "user_id", ts = "ts_us", tie = "event_id",
          typeCol = "event_type", gapUs = Gap)
        .select("antecedent", "consequent", "n_ab", "support", "confidence", "lift")
        .as[(String, String, Long, Double, Double, Double)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6)).toMap

      val baskets = bruteSessions(evs, Gap).distinct
      val nBaskets = baskets.map(b => (b._1, b._2)).distinct.size.toLong
      val itemN = baskets.groupBy(_._3).view.mapValues(_.size.toLong).toMap
      val undirected = baskets.groupBy(b => (b._1, b._2)).toSeq.flatMap {
        case (_, items) =>
          val ts = items.map(_._3).distinct.sorted
          for (i <- ts.indices; j <- i + 1 until ts.length) yield (ts(i), ts(j))
      }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
      val want = undirected.toSeq.flatMap { case ((a, b), n) =>
        Seq((a, b, n), (b, a, n)) }.map { case (a, b, n) =>
        (a, b) -> (n, r6(n * 1.0 / nBaskets), r6(n * 1.0 / itemN(a)),
          r6(n * 1.0 / itemN(a) / (itemN(b) * 1.0 / nBaskets)))
      }.toMap
      got == want
    }

  private val attrGen = for {
    n <- Gen.choose(2, 60)
    keys <- Gen.choose(1, 4)
    evs <- Gen.listOfN(n, for {
      k <- Gen.choose(1L, keys.toLong)
      ts <- Gen.choose(0L, 200L)
      t <- Gen.frequency(2 -> Gen.const("purchase"),
        3 -> Gen.oneOf("ad", "email", "search"))
      v <- Gen.choose(0, 40).map(_ * 0.25)   // exactly-representable values:
                                             // group sums are order-independent
    } yield (k, ts, t, v))
  } yield evs.zipWithIndex.map { case ((k, ts, t, v), i) => (k, ts, i.toLong, t, v) }

  property("lastTouchAttribution equals brute force (at-or-before incl. ties)") =
    Prop.forAll(attrGen) { evs =>
      import spark.implicits._
      val got = EventAnalytics.lastTouchAttribution(
          evs.toDF("user_id", "ts_us", "event_id", "event_type", "value"),
          key = "user_id", ts = "ts_us", typeCol = "event_type",
          conversionType = "purchase", valueCol = "value", tie = "event_id")
        .as[(String, Long, Double)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap

      val touches = evs.filter(_._4 != "purchase")
      val credited = evs.filter(_._4 == "purchase").map { c =>
        val cand = touches.filter(t => t._1 == c._1 && t._2 <= c._2)
        val channel =
          if (cand.isEmpty) "(none)"
          else cand.maxBy(t => (t._2, t._3))._4
        (channel, c._5)
      }
      val want = credited.groupBy(_._1).view.mapValues { rows =>
        (rows.size.toLong, math.floor(rows.map(_._2).sum * 100.0 + 0.5) / 100.0)
      }.toMap
      got == want.toMap
    }
}
