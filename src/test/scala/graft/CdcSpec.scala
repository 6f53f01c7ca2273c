package graft

import org.apache.spark.sql.functions._
import graft.operators.Cdc

/** [[Cdc.applyChangelog]] laws: latest-wins semantics, delete/resurrect,
  * snapshot passthrough, the change-beats-snapshot seq-tie rule, the
  * loud unknown-op refusal, and the associativity (checkpoint-at-any-
  * cut) law q188 proves against DuckDB — here against a plain-Scala
  * fold over seeded random changelogs. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val cols = Seq("k", "ts", "tid", "v")

  private def snap(rows: (Long, Long, Long, String)*) =
    rows.toDF(cols: _*)
  private def chg(rows: (Long, Long, Long, String, String)*) =
    rows.toDF(cols :+ "op": _*)

  private def apply1(s: org.apache.spark.sql.DataFrame,
                     c: org.apache.spark.sql.DataFrame) =
    Cdc.applyChangelog(s, c, Seq("k"), Seq("ts", "tid"), "op")

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "ts", "tid", "v")
      .as[(Long, Long, Long, String)].collect().toSet

  test("latest-wins upsert, delete removes, later upsert resurrects") {
    val s = snap((1L, 0L, 0L, "a"), (2L, 0L, 0L, "b"), (3L, 0L, 0L, "c"))
    val c = chg(
      (1L, 10L, 1L, "a2", "U"), (1L, 20L, 2L, "a3", "U"), // latest wins
      (2L, 10L, 3L, "x", "D"),                            // deleted
      (4L, 10L, 4L, "d", "U"),                            // inserted
      (5L, 10L, 5L, "e", "U"), (5L, 20L, 6L, "e2", "D"),  // in-and-out
      (6L, 10L, 7L, "f", "D"), (6L, 20L, 8L, "f2", "U"))  // resurrected
    assert(collect(apply1(s, c)) === Set(
      (1L, 20L, 2L, "a3"),
      (3L, 0L, 0L, "c"),       // untouched snapshot key passes through
      (4L, 10L, 4L, "d"),
      (6L, 20L, 8L, "f2")))
  }

  test("a change outranks the snapshot on an exact seq tie") {
    val out = collect(apply1(
      snap((1L, 10L, 1L, "old")), chg((1L, 10L, 1L, "new", "U"))))
    assert(out === Set((1L, 10L, 1L, "new")))
    // and a tied DELETE also wins — the snapshot row does not survive
    assert(collect(apply1(
      snap((1L, 10L, 1L, "old")), chg((1L, 10L, 1L, "x", "D")))).isEmpty)
  }

  test("unknown op code refuses loudly — a dropped delete resurrects rows") {
    val boom = intercept[Exception] {
      apply1(snap((1L, 0L, 0L, "a")), chg((1L, 10L, 1L, "b", "upsert")))
        .count()
    }
    assert(Iterator.iterate(boom: Throwable)(_.getCause).takeWhile(_ != null)
      .flatMap(t => Option(t.getMessage)).mkString.contains("unknown op code"))
  }

  test("associativity: apply(a ++ b) == apply(apply(a), b), vs a plain-Scala fold") {
    val rnd = new scala.util.Random(11)
    val log = (0 until 400).map { i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(50).toLong * 10 + rnd.nextInt(3),
        i.toLong, s"v$i", if (rnd.nextInt(4) == 0) "D" else "U")
    }
    // plain-Scala truth: per key, the max (ts, tid) row; keep if U
    val expected = log.groupBy(_._1).flatMap { case (_, rows) =>
      val w = rows.maxBy(r => (r._2, r._3))
      if (w._5 == "U") Some((w._1, w._2, w._3, w._4)) else None
    }.toSet
    val empty = chg().drop("op")
    val onePass = collect(apply1(empty, log.toDF(cols :+ "op": _*)))
    assert(onePass === expected)
    // cut at every quartile: staged apply must equal the one-pass fold
    Seq(100, 200, 300).foreach { cut =>
      val (a, b) = log.splitAt(cut)
      val staged = collect(apply1(
        apply1(empty, a.toDF(cols :+ "op": _*)),
        b.toDF(cols :+ "op": _*)))
      assert(staged === expected, s"cut at $cut diverged")
    }
  }

  test("plan: one map-side-combining aggregation, no window") {
    val s = snap((1L, 0L, 0L, "a"))
    val c = chg((1L, 10L, 1L, "b", "U"))
    val plan = apply1(s, c).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"latest-wins must not be a window:\n$plan")
    // struct max is sort-aggregated in Spark; the scale property is the
    // PARTIAL max below the exchange (one candidate per key per map task)
    assert(plan.contains("partial_max"), plan)
    assert("Exchange".r.findAllIn(plan).size === 1, plan)
  }
}
