package graft

import org.apache.spark.sql.functions._
import graft.operators.Features

/** Feature-aggregation parity with the reference's `ExtractFeatureTest`
  * semantics (FIXTURES.md A1/A2): per-axis mean, UNBIASED sample
  * variance, mean absolute deviation, resultant, and
  * average-time-between-peaks with the 0.9·max threshold, positive-gap
  * filter and <2-peaks → 0.0 fallback. Expected values are computed by
  * an independent in-test Scala implementation (the reference's own CSV
  * fixtures are absent from its repo; SURVEY.md §5). */
class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  // one key, ts 0..9, hand-made axes
  val xs = Seq(-5.1, -5.2, -5.3, -5.15, -5.25, -5.35, -5.2, -5.1, -5.3, -5.33)
  val ys = Seq(8.0, 8.2, 8.1, 8.15, 8.05, 8.25, 8.3, 8.0, 8.1, 8.2)
  val zs = Seq(1.1, 1.2, 1.3, 1.25, 1.15, 1.35, 1.2, 1.1, 1.3, 1.22)
  val ts = Seq(0L, 1000L, 2000L, 3000L, 4000L, 5000L, 6000L, 7000L, 8000L, 9000L)

  def mean(v: Seq[Double]) = v.sum / v.size
  def varSamp(v: Seq[Double]) = {
    val m = mean(v); v.map(x => (x - m) * (x - m)).sum / (v.size - 1)
  }
  def avgAbsDiff(v: Seq[Double]) = { val m = mean(v); mean(v.map(x => math.abs(x - m))) }
  def resultant = mean(xs.lazyZip(ys).lazyZip(zs).map((x, y, z) =>
    math.sqrt(x * x + y * y + z * z)))
  def peakInterval(y: Seq[Double], t: Seq[Long]): Double = {
    val maxY = y.max
    val peaks = t.lazyZip(y).collect { case (tt, yy) if yy > 0.9 * maxY => tt }.toSeq
    val gaps = peaks.sliding(2).collect { case Seq(a, b) if b - a > 0 => (b - a).toDouble }.toSeq
    if (gaps.isEmpty) 0.0 else gaps.sum / gaps.size
  }

  def featurize(y: Seq[Double]) = {
    val df = ts.indices.map(i => (1L, "walk", ts(i), xs(i), y(i), zs(i)))
      .toDF("user", "act", "ts", "x", "y", "z")
    Features.aggregate(df, Seq("user", "act"), col("ts"),
      Features.Axes(col("x"), col("y"), col("z")))
      .collect().head
  }

  test("D2-D6: mean / sample variance / avg abs diff / resultant") {
    val row = featurize(ys)
    assert(row.getAs[Long]("n_samples") === 10L)
    assert(math.abs(row.getAs[Double]("mean_x") - mean(xs)) < 1e-12)
    assert(math.abs(row.getAs[Double]("mean_y") - mean(ys)) < 1e-12)
    assert(math.abs(row.getAs[Double]("var_x") - varSamp(xs)) < 1e-12)
    assert(math.abs(row.getAs[Double]("var_z") - varSamp(zs)) < 1e-12)
    assert(math.abs(row.getAs[Double]("avg_abs_diff_y") - avgAbsDiff(ys)) < 1e-12)
    assert(math.abs(row.getAs[Double]("res") - resultant) < 1e-12)
  }

  test("D7: avg time between peaks (0.9*max threshold, positive gaps)") {
    val row = featurize(ys)
    // peaks: y > 0.9*8.3 = 7.47 → every sample is a peak → gaps all 1000
    assert(row.getAs[Double]("peak_avg_interval") === peakInterval(ys, ts))
    assert(row.getAs[Double]("peak_avg_interval") === 1000.0)
  }

  test("D7 edge: fewer than 2 peaks → 0.0") {
    // one dominant y value → single peak above 0.9*max (others at 1.0 < 0.9*50)
    val spiky = Seq(1.0, 1.0, 50.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0)
    val row = featurize(spiky)
    assert(row.getAs[Double]("peak_avg_interval") === 0.0)
  }

  test("D7 edge: duplicate timestamps produce zero gaps that are dropped") {
    val dupTs = Seq(0L, 0L, 2000L, 2000L, 4000L, 4000L, 6000L, 6000L, 8000L, 8000L)
    val df = dupTs.indices.map(i => (1L, "walk", dupTs(i), xs(i), 8.0 + (i % 2) * 0.001, zs(i)))
      .toDF("user", "act", "ts", "x", "y", "z")
    val row = Features.aggregate(df, Seq("user", "act"), col("ts"),
      Features.Axes(col("x"), col("y"), col("z"))).collect().head
    // all samples are peaks (y within 10% of max); consecutive-peak gaps
    // alternate 0 (dropped) and 2000 → mean of kept gaps is 2000
    assert(row.getAs[Double]("peak_avg_interval") === 2000.0)
  }

  test("single-row groups: variance normalized to 0.0, not NaN") {
    val df = Seq((1L, "walk", 0L, 1.0, 2.0, 3.0)).toDF("user", "act", "ts", "x", "y", "z")
    val row = Features.aggregate(df, Seq("user", "act"), col("ts"),
      Features.Axes(col("x"), col("y"), col("z"))).collect().head
    assert(row.getAs[Double]("var_x") === 0.0)
    assert(row.getAs[Double]("peak_avg_interval") === 0.0)
  }

  test("portable variance equals var_samp within float noise") {
    val df = ts.indices.map(i => (1L, "walk", ts(i), xs(i), ys(i), zs(i)))
      .toDF("user", "act", "ts", "x", "y", "z")
    val a = Features.aggregate(df, Seq("user", "act"), col("ts"),
      Features.Axes(col("x"), col("y"), col("z")), portableVariance = false)
      .collect().head.getAs[Double]("var_y")
    val b = Features.aggregate(df, Seq("user", "act"), col("ts"),
      Features.Axes(col("x"), col("y"), col("z")), portableVariance = true)
      .collect().head.getAs[Double]("var_y")
    assert(math.abs(a - b) < 1e-9)
  }

  test("withWinsorized: clamp into exact interpolated bounds; NULL group/value laws") {
    // group g: 1..100 -> p01 = 1.99, p99 = 99.01 (rank 0.01*(n-1) = 0.99)
    val rows = (1 to 100).map(i => (Some("g"), Some(i.toDouble))) ++
      Seq((Some("g"), None),                       // NULL value: untouched
        (None, Some(5.0)), (None, Some(500.0)),    // NULL group: own stratum
        (None, Some(1000.0)))
    val out = Features.withWinsorized(
        rows.toDF("grp", "value"), col("grp"), col("value"))
      .select(col("grp"), col("value"), col("value_w"))
      .as[(Option[String], Option[Double], Option[Double])].collect()
    val g = out.filter(_._1.contains("g"))
    assert(g.find(_._2.contains(1.0)).get._3.get === 1.99)
    assert(g.find(_._2.contains(100.0)).get._3.get === 99.01)
    assert(g.find(_._2.contains(50.0)).get._3.get === 50.0)
    assert(g.find(_._2.isEmpty).get._3.isEmpty)
    // the NULL stratum clamps among its own three values:
    // p01 of {5, 500, 1000}: rank 0.02 -> 5 + 0.02*495 = 14.9;
    // p99: rank 1.98 -> 500 + 0.98*500 = 990.0
    val n = out.filter(_._1.isEmpty)
    assert(n.find(_._2.contains(5.0)).get._3.get === 14.9)
    assert(n.find(_._2.contains(500.0)).get._3.get === 500.0)
    assert(n.find(_._2.contains(1000.0)).get._3.get === 990.0)
  }
}
