package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness must surface failures, never absorb them into a
  * better-looking total. */
class BenchSpec extends AnyFunSuite {

  test("timeAll: a crashing query reports -1 and lands in the failed list") {
    val (res, failed) = Bench.timeAll(Seq("ok", "boom"), {
      case "boom" => throw new RuntimeException("deliberately broken")
      case _ => ()
    })
    assert(failed === Seq("boom"))
    val m = res.toMap.view.mapValues(Bench.toStat).toMap
    assert(m("ok").min >= 0.0 && m("ok").med >= m("ok").min)
    assert(m("boom") === Bench.Stat(-1.0, -1.0))
    // the total must exclude the sentinel, not subtract it
    assert(m.values.map(_.min).filter(_ >= 0).sum >= 0.0)
  }

  test("timeAll: all-green run has an empty failed list, median beside min") {
    val (res, failed) = Bench.timeAll(Seq("a", "b"), _ => ())
    assert(failed.isEmpty)
    // median of an odd sample count is an actual sample ≥ the min
    assert(res.map { case (_, ts) => Bench.toStat(ts) }
      .forall(s => s.min >= 0.0 && s.med >= s.min))
  }

  test("toStat: the merged-sample median covers ALL samples, not a subset") {
    // 3 base + 5 extra samples: median of the merged 8 is the mean of
    // the 4th and 5th order statistics
    val merged = Seq(10.0, 9.0, 8.0) ++ Seq(1.0, 2.0, 3.0, 4.0, 5.0)
    assert(Bench.toStat(merged) === Bench.Stat(1.0, (4.0 + 5.0) / 2))
  }

  test("timeAll: passes are interleaved round-robin, not back-to-back") {
    val order = collection.mutable.ArrayBuffer[String]()
    Bench.timeAll(Seq("a", "b", "c"), order += _, passes = 3)
    // 1 warm-up + 3 timed passes, each a full a,b,c sweep
    assert(order.toSeq === Seq.fill(4)(Seq("a", "b", "c")).flatten)
  }
}
