package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** Binned point-in-interval join: boundary semantics (lo inclusive,
  * hi exclusive), overlap multiplicity, negative values, empty
  * intervals, and the no-nested-loop plan claim. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  val points = Seq((1L, 0.0), (2L, 10.0), (3L, 25.0), (4L, -5.0), (5L, 30.0))
    .toDF("pid", "v")
  val intervals = Seq(
    (100L, 0.0, 10.0),    // [0,10): catches 1, NOT 2 (hi exclusive)
    (101L, 5.0, 30.0),    // catches 2, 3
    (102L, 20.0, 40.0),   // catches 3, 5 (overlaps 101)
    (103L, -10.0, 0.0),   // negative range: catches 4, NOT 1
    (104L, 50.0, 50.0)    // empty [50,50): catches nothing
  ).toDF("iid", "lo", "hi")

  test("boundary, overlap, and negative-range semantics match the naive join") {
    val got = RangeJoin.pointInInterval(points, col("v"),
        intervals, col("lo"), col("hi"), binWidth = 7.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val expected = Set((1L, 100L), (2L, 101L), (3L, 101L), (3L, 102L),
      (5L, 102L), (4L, 103L))
    assert(got === expected)
    // exactly once per qualifying pair — the point meets each interval
    // only in its own bin, so no dedup pass exists to hide duplicates
    val rows = RangeJoin.pointInInterval(points, col("v"),
      intervals, col("lo"), col("hi"), binWidth = 7.0).count()
    assert(rows === expected.size)
    // differential vs the naive (nested-loop) formulation
    val naive = points.join(intervals,
        col("v") >= col("lo") && col("v") < col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got === naive)
  }

  test("interval overlap: half-open touch excluded, nesting, multi-bin exactly-once") {
    val lefts = Seq(
      (1L, 0.0, 10.0),    // touches 200 at 10 (no overlap), overlaps 201
      (2L, 15.0, 50.0),   // spans many bins; overlaps 200, 201, 202
      (3L, 60.0, 61.0),   // inside 202
      (4L, 70.0, 70.0)    // empty: matches nothing
    ).toDF("lid", "llo", "lhi")
    val rights = Seq(
      (200L, 10.0, 20.0),
      (201L, 5.0, 16.0),
      (202L, 40.0, 65.0)
    ).toDF("rid", "rlo", "rhi")
    val got = RangeJoin.intervalOverlap(lefts, col("llo"), col("lhi"),
        rights, col("rlo"), col("rhi"), binWidth = 7.0)
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    val expected = Set((1L, 201L), (2L, 200L), (2L, 201L), (2L, 202L), (3L, 202L))
    assert(got.toSet === expected)
    // exactly once per pair despite meeting in multiple shared bins
    assert(got.length === expected.size)
    // differential vs the naive nested-loop formulation
    val naive = lefts.join(rights,
        col("llo") < col("rhi") && col("rlo") < col("lhi")
          && col("llo") < col("lhi") && col("rlo") < col("rhi"))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got.toSet === naive)
  }

  test("property: both range joins equal the naive join on seeded random data") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val w = Seq(3.0, 7.5, 20.0)(trial - 1)
      val ps = (1 to 150).map(i => (i.toLong, rnd.nextDouble() * 200 - 50))
        .toDF("pid", "v")
      val ivs = (1 to 40).map { i =>
        val lo = rnd.nextDouble() * 200 - 50
        (i.toLong, lo, lo + rnd.nextDouble() * 30)
      }.toDF("iid", "lo", "hi")
      val gotP = RangeJoin.pointInInterval(ps, col("v"), ivs,
          col("lo"), col("hi"), w)
        .select("pid", "iid").as[(Long, Long)].collect().toSeq
      val naiveP = ps.join(ivs, col("v") >= col("lo") && col("v") < col("hi"))
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(gotP.toSet === naiveP && gotP.length === naiveP.size, s"point trial $trial")

      val ls = (1 to 60).map { i =>
        val lo = rnd.nextDouble() * 200 - 50
        (i.toLong, lo, lo + rnd.nextDouble() * 25)
      }.toDF("lid", "llo", "lhi")
      val gotO = RangeJoin.intervalOverlap(ls, col("llo"), col("lhi"),
          ivs, col("lo"), col("hi"), w)
        .select("lid", "iid").as[(Long, Long)].collect().toSeq
      val naiveO = ls.join(ivs,
          col("llo") < col("hi") && col("lo") < col("lhi")
            && col("llo") < col("lhi") && col("lo") < col("hi"))
        .select("lid", "iid").as[(Long, Long)].collect().toSet
      assert(gotO.toSet === naiveO && gotO.length === naiveO.size, s"overlap trial $trial")
    }
  }

  test("plan: equality join on bins, no nested-loop join") {
    val p = RangeJoin.pointInInterval(points, col("v"),
        intervals, col("lo"), col("hi"), binWidth = 7.0)
      .queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoopJoin"),
      s"the bin rewrite must avoid the nested-loop plan:\n$p")
    val naive = points.join(intervals,
        col("v") >= col("lo") && col("v") < col("hi"))
      .queryExecution.executedPlan.toString
    assert(naive.contains("NestedLoopJoin"),
      s"(sanity) the naive formulation nested-loops:\n$naive")
  }
}
