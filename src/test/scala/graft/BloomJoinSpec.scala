package graft

import org.apache.spark.sql.functions._
import graft.operators.BloomJoin

/** Bloom-prefiltered semi-join: exactness vs the plain join, lossless
  * prefiltering (no false negatives), real pruning on disjoint keys,
  * and the degenerate build sides. */
class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private def probeDf = (1L to 1000L).map(i => (i, s"p$i")).toDF("k", "payload")

  test("semiJoin equals the plain left-semi join") {
    val build = (1L to 1000L by 7L).toDF("bk")
    val expected = probeDf.join(build, $"k" === $"bk", "left_semi")
      .select("k").as[Long].collect().sorted
    val got = BloomJoin.semiJoin(probeDf, build, $"k", $"bk")
      .select("k").as[Long].collect().sorted
    assert(got.sameElements(expected))
  }

  test("mightContain has no false negatives") {
    val build = (1L to 500L by 3L).toDF("bk")
    val bloom = BloomJoin.bloomFilterBytes(build, $"bk", expectedItems = 200)
    val members = (1L to 500L by 3L).toDF("k")
    val missed = members.filter(!BloomJoin.mightContain(bloom, $"k")).count()
    assert(missed == 0, s"$missed members rejected by the Bloom filter")
  }

  test("prefilter prunes most non-members before the join") {
    val build = (100000L to 100100L).toDF("bk") // disjoint from probe keys
    val bloom = BloomJoin.bloomFilterBytes(build, $"bk",
      expectedItems = 101, fpp = 0.01)
    val kept = probeDf.filter(BloomJoin.mightContain(bloom, $"k")).count()
    // 1000 non-member probes at fpp=1% → expect ~10; allow generous slack
    assert(kept < 100, s"prefilter kept $kept of 1000 non-members")
    assert(BloomJoin.semiJoin(probeDf, build, $"k", $"bk").count() == 0)
  }

  test("empty build side yields an empty result, not a crash") {
    val build = Seq.empty[Long].toDF("bk")
    assert(BloomJoin.semiJoin(probeDf, build, $"k", $"bk").count() == 0)
  }

  test("null keys never match but never crash the prefilter") {
    val probe = Seq(Some(1L), None, Some(3L)).toDF("k")
    val build = Seq(Some(1L), None).toDF("bk")
    val got = BloomJoin.semiJoin(probe, build, $"k", $"bk")
      .as[Option[Long]].collect()
    assert(got.toSeq == Seq(Some(1L))) // null == null is not a match
  }
}
