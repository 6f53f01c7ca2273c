package graft

import org.apache.spark.sql.functions._
import graft.operators.Features
import graft.ml.Models

/** End-to-end flagship parity test on synthesized raw accelerometer
  * samples shaped like the reference's Cassandra table (FIXTURES.md A4):
  * known session/window structure in → exact feature-table shape out →
  * a decision tree trains on it. */
class PipelineE2ESpec extends SparkSpec {
  import spark.implicits._

  val gap = 300000L      // reference Constants.jump default scale
  val width = 15000L     // reference Constants.interval

  // 2 users × 2 activities; per key: 2 sessions of 150 samples at
  // 100-tick spacing (session span 14900 < width → 1 window each)
  def raw = (for {
    user <- Seq(1L, 2L)
    activity <- Seq("Walking", "Jogging")
    session <- 0 to 1
    i <- 0 until 150
  } yield {
    val ts = session * 10000000L + i * 100L
    val base = if (activity == "Walking") 2.0 else 8.0
    (user, activity, ts,
      base + (i % 7) * 0.1, base + (i % 5) * 0.2, base - (i % 3) * 0.1)
  }).toDF("user_id", "activity", "ts", "acc_x", "acc_y", "acc_z")

  test("raw samples → sessionize → window → 11 features, exact structure") {
    val feats = Features.pipeline(raw,
      user = "user_id", activity = "activity", tsName = "ts",
      axes = Features.Axes(col("acc_x"), col("acc_y"), col("acc_z")),
      gap = gap, width = width)
    val rows = feats.collect()
    // 2 users × 2 activities × 2 sessions × 1 window
    assert(rows.length === 8)
    assert(rows.forall(_.getAs[Long]("n_samples") === 150L))
    // Walking mean_y = 2.0 + avg((i%5)*0.2) = 2.0 + 0.4
    val walking = feats.filter(col("activity") === "Walking")
      .select(avg(col("mean_y"))).as[Double].collect().head
    assert(math.abs(walking - 2.4) < 1e-9)
    // y-peaks: y > 0.9*max(y) = 2.52 (Walking) → i%5 ∈ {3,4} are peaks:
    // 60 peaks/window at ticks 3,4,8,9,…; 59 gaps = 30×100 + 29×400
    val peak = feats.filter(col("activity") === "Walking")
      .select(avg(col("peak_avg_interval"))).as[Double].collect().head
    assert(math.abs(peak - (30 * 100.0 + 29 * 400.0) / 59.0) < 1e-9)
  }

  test("feature table trains and scores a decision tree (reference flagship)") {
    val feats = Features.pipeline(raw,
      user = "user_id", activity = "activity", tsName = "ts",
      axes = Features.Axes(col("acc_x"), col("acc_y"), col("acc_z")),
      gap = gap, width = width)
      .withColumn("label",
        Models.encodeLabel(col("activity"),
          Seq("Walking", "Jogging", "Standing", "Sitting", "Upstairs", "Downstairs")))
      .cache()
    val eval = Models.trainEval(feats, Models.decisionTree)
    // activities are linearly separable by construction → perfect test accuracy
    assert(eval.accuracy === 1.0)
    assert(eval.nTrain + eval.nTest === 8L)
  }

  test("seeded cross-validation selects a depth and refits (model selection)") {
    val feats = Features.pipeline(raw,
      user = "user_id", activity = "activity", tsName = "ts",
      axes = Features.Axes(col("acc_x"), col("acc_y"), col("acc_z")),
      gap = gap, width = width)
      .withColumn("label",
        Models.encodeLabel(col("activity"),
          Seq("Walking", "Jogging", "Standing", "Sitting", "Upstairs", "Downstairs")))
      .cache()
    val e = Models.crossValidateTree(feats, depths = Seq(2, 3), folds = 2)
    assert(Seq(2, 3).contains(e.bestMaxDepth))
    assert(e.avgMetrics.size === 2)          // one mean metric per grid point
    // linearly separable by construction → the refit winner is perfect
    assert(e.testAccuracy === 1.0)
    // determinism: the seeded CV picks the same depth on a second run
    assert(Models.crossValidateTree(feats, depths = Seq(2, 3), folds = 2)
      .bestMaxDepth === e.bestMaxDepth)
  }

  test("GBT trains end-to-end on a binary label (F4's runnable surface)") {
    // spark.ml GBT is binary-only (as was the reference's MLlib GBT);
    // the two synthesized activities give it a legitimate binary task
    val feats = Features.pipeline(raw,
      user = "user_id", activity = "activity", tsName = "ts",
      axes = Features.Axes(col("acc_x"), col("acc_y"), col("acc_z")),
      gap = gap, width = width)
      .withColumn("label", when(col("activity") === "Walking", 0.0).otherwise(1.0))
      .cache()
    val eval = Models.trainEval(feats, Models.gradientBoostedTrees)
    assert(eval.accuracy === 1.0)
    assert(eval.nTrain + eval.nTest === 8L)
  }
}
