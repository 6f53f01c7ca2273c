package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

/** Count-Min Sketch laws: never undercounts, exact when collision-free,
  * shard-mergeable, layout-independent, bounded state. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val width = 64
  private def counts(rows: Seq[(String, Long)]) = rows.toDF("tok", "cnt")

  test("estimates never undercount; tiny key set over a wide sketch is exact") {
    val c = counts(Seq(("alpha", 5L), ("beta", 3L), ("gamma", 1L)))
    val cms = Sketches.cmsFromCounts(c, col("tok"), col("cnt"), width)
    val est = Sketches.cmsEstimate(c, cms, col("tok"), width)
      .select("tok", "cnt", "cms_est").as[(String, Long, Long)]
      .collect().toSeq
    est.foreach { case (tokn, cnt, e) =>
      assert(e >= cnt, s"$tokn undercounted: $e < $cnt") }
    // 3 keys in 3×64 cells: collisions impossible to matter → exact
    assert(est.forall { case (_, cnt, e) => e == cnt }, est)
  }

  test("an absent key estimates from empty cells (possibly zero, never negative)") {
    val c = counts(Seq(("alpha", 5L)))
    val cms = Sketches.cmsFromCounts(c, col("tok"), col("cnt"), width)
    val est = Sketches.cmsEstimate(
        Seq(("nosuchkey", 0L)).toDF("tok", "cnt"), cms, col("tok"), width)
      .select("cms_est").as[Long].head()
    assert(est >= 0L)
  }

  test("sketch state is bounded by depth × width and merges by cell-wise sum") {
    val shard1 = counts(Seq.tabulate(300)(i => (s"tok$i", (i % 7 + 1).toLong)))
    val shard2 = counts(Seq.tabulate(300)(i => (s"tok${i + 150}", (i % 5 + 1).toLong)))
    val cms1 = Sketches.cmsFromCounts(shard1, col("tok"), col("cnt"), width)
    val cms2 = Sketches.cmsFromCounts(shard2, col("tok"), col("cnt"), width)
    assert(cms1.count() <= 3L * width)
    // merged sketch == sketch of the concatenated count stream
    val merged = cms1.unionByName(cms2)
      .groupBy("row_idx", "bucket").agg(sum("cnt").as("cnt"))
    val direct = Sketches.cmsFromCounts(
      shard1.unionByName(shard2), col("tok"), col("cnt"), width)
    val m = merged.as[(Int, Long, Long)].collect().toSet
    val d = direct.as[(Int, Long, Long)].collect().toSet
    assert(m === d)
  }

  test("sketch and estimates are layout-independent") {
    val c = counts(Seq.tabulate(500)(i => (s"w$i", (i % 11 + 1).toLong)))
    def run(df: org.apache.spark.sql.DataFrame) = {
      val cms = Sketches.cmsFromCounts(df, col("tok"), col("cnt"), width)
      Sketches.cmsEstimate(df, cms, col("tok"), width)
        .select("tok", "cms_est").as[(String, Long)].collect().toMap
    }
    assert(run(c) === run(c.repartition(13)))
  }

  test("shape contract refuses bad depth/width loudly") {
    val c = counts(Seq(("a", 1L)))
    intercept[IllegalArgumentException] {
      Sketches.cmsFromCounts(c, col("tok"), col("cnt"), width = 0)
    }
    intercept[IllegalArgumentException] {
      Sketches.cmsFromCounts(c, col("tok"), col("cnt"), width, depth = 9)
    }
  }
}
