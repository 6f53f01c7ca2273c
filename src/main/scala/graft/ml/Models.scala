package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification._
import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's model zoo (`SURVEY.md` §2 F) on spark.ml DataFrame
  * pipelines (the RDD-based spark.mllib API it used is deprecated).
  *
  * Reference parity choices:
  *  - DecisionTree: gini / maxDepth 9 / maxBins 32
  *    (`model/DecisionTrees.java:27-31`)
  *  - RandomForest: 10 trees, gini, depth 9, bins 32, "auto" feature
  *    subset, seed 12345 (`model/RandomForests.java:29-36`)
  *  - LogisticRegression: multinomial (LBFGS under the hood)
  *    (`model/MultinomialLogisticRegression.java:30`)
  *  - NaiveBayes: smoothing 1.0 — but spark.ml multinomial NB requires
  *    nonnegative features and the reference's accelerometer means are
  *    negative (`SURVEY.md` §7.4), so the usable surface here is
  *    gaussian NB; multinomial remains constructible for parity.
  *  - GBT: defined but never invoked by the reference main, and
  *    multiclass would throw (binary-only) — surfaced as a constructor,
  *    gated exactly like the reference leaves it unused.
  *  - 60/40 random split, SEEDED (the reference's unseeded split,
  *    `RecognizeActivity.java:133`, makes its error rates
  *    irreproducible — we fix that).
  *  - error rate = 1 − accuracy via MulticlassClassificationEvaluator
  *    (the reference's filter(pred≠label)/count,
  *    `DecisionTrees.java:39-43`).
  *
  * Scale: training data stays a distributed DataFrame end to end (the
  * reference collected every feature row to a driver list,
  * `RecognizeActivity.java:115-117`). Cache the feature table once
  * before the multi-model fan-out. Dirty corpora: training and scoring
  * consume the [[observed]] slice (all features non-null) — at 100 TB
  * a single all-null window must not kill an hours-long fit, and the
  * drop is an explicit narrow filter, not a library side effect.
  */
object Models {

  val FeatureCols: Seq[String] = Seq(
    "mean_x", "mean_y", "mean_z", "var_x", "var_y", "var_z",
    "avg_abs_diff_x", "avg_abs_diff_y", "avg_abs_diff_z", "res",
    "peak_avg_interval")

  val Seed = 12345L

  /** F8 label encoding: fixed string→ordinal map (reference's `when`
    * chain, `RecognizeActivity.java:187-200`). Unknown strings → max+1
    * (the reference defaulted unknowns to 0, conflating them with the
    * first class — fixed here). A NULL label stays NULL — missing data
    * is not an unknown CLASS; without the explicit guard the
    * null-valued `===` comparisons would fall through every `when` and
    * silently train a phantom class from missing rows. */
  def encodeLabel(c: Column, vocab: Seq[String]): Column =
    when(c.isNull, lit(null).cast("double")).otherwise(
      vocab.zipWithIndex.foldLeft(lit(vocab.size.toDouble)) {
        case (acc, (v, i)) => when(c === v, i.toDouble).otherwise(acc)
      })

  private def assembler = new VectorAssembler()
    .setInputCols(FeatureCols.toArray).setOutputCol("features")

  /** The trainable/scorable slice of a feature table: rows where every
    * feature was OBSERVED. On a dirty corpus a window whose axis values
    * were all NULL aggregates to NULL means — no signal was ever seen,
    * so there is nothing to train on or score; such rows drop HERE,
    * explicitly, instead of crashing mid-fit. Deliberately NOT
    * `na.drop`, which also swallows NaN rows: a NaN is not missing
    * data, it is a computed-garbage signal from an upstream bug, and
    * it must still reach the assembler's handleInvalid=error backstop
    * and fail loudly rather than train on the remainder. On a clean
    * corpus this is a no-op. */
  def observed(features: DataFrame): DataFrame =
    features.filter(FeatureCols.map(col(_).isNotNull).reduce(_ && _))

  def decisionTree: DecisionTreeClassifier = new DecisionTreeClassifier()
    .setImpurity("gini").setMaxDepth(9).setMaxBins(32).setSeed(Seed)

  def randomForest: RandomForestClassifier = new RandomForestClassifier()
    .setNumTrees(10).setImpurity("gini").setMaxDepth(9).setMaxBins(32)
    .setFeatureSubsetStrategy("auto").setSeed(Seed)

  def logisticRegression: LogisticRegression = new LogisticRegression()
    .setFamily("multinomial").setMaxIter(100)

  def naiveBayes: NaiveBayes = new NaiveBayes()
    .setSmoothing(1.0).setModelType("gaussian")

  /** Binary-only in spark.ml, exactly as in MLlib — surface parity
    * with `model/GradientBoostedTree.java`. Not wired into the
    * multiclass flagship (would throw, as the reference's would have),
    * but fully runnable on a binary label through [[trainEval]] —
    * demonstrated end-to-end in PipelineE2ESpec. */
  def gradientBoostedTrees: GBTClassifier = new GBTClassifier()
    .setMaxIter(3).setMaxDepth(5).setSeed(Seed)

  final case class Eval(model: PipelineModel, accuracy: Double,
                        errorRate: Double, nTrain: Long, nTest: Long)

  /** Train + evaluate one classifier on a feature DataFrame with a
    * `label` column: seeded 60/40 split, fit on train, accuracy on
    * test. The feature table should be cached by the caller when
    * several models share it. */
  def trainEval(features: DataFrame,
                stage: org.apache.spark.ml.Estimator[_ <: org.apache.spark.ml.Model[_]]): Eval = {
    // unobserved features and missing labels cannot train (see
    // [[observed]] / [[encodeLabel]]: a NULL label is missing data,
    // not a class; a NaN label stays loud downstream, same principle
    // as observed()) — drop BEFORE the split so nTrain/nTest report
    // the rows the models actually saw
    val usable = observed(features).filter(col("label").isNotNull)
    val Array(train, test) = usable.randomSplit(Array(0.6, 0.4), Seed)
    val pipeline = new Pipeline().setStages(Array(assembler, stage))
    val model = pipeline.fit(train)
    val predictions = model.transform(test)
    val acc = new MulticlassClassificationEvaluator()
      .setMetricName("accuracy").evaluate(predictions)
    Eval(model, acc, 1.0 - acc, train.count(), test.count())
  }

  /** Unigram + adjacent-bigram token stream for hashed text features —
    * the fastText-style feature recipe. Pure expressions
    * (`graft_pos_shingles` for the bigrams), so feature extraction
    * rides whole-stage codegen and never shuffles. */
  def withClassifierTokens(df: DataFrame, text: Column,
                           out: String = "clf_toks"): DataFrame = {
    import graft.functions.GraftFunctions.{positionedShingles, tokens}
    require(!df.columns.contains("_clf_tk"),
      "withClassifierTokens: input already has a _clf_tk column — it " +
        "would be silently overwritten and dropped; rename it first")
    // tokenize ONCE into a bound column — referencing tokens(text) in
    // both arms of the concat would split every document twice. NULL
    // text coalesces to an empty token array: tokens(null) is null,
    // null would propagate through the concat, and HashingTF throws an
    // NPE on a null feature row — a null document must mean "no
    // features", not a crashed fit.
    df.withColumn("_clf_tk",
        coalesce(tokens(text), array().cast("array<string>")))
      .withColumn(out,
        concat(col("_clf_tk"),
          transform(positionedShingles(col("_clf_tk"), 2), p => p.getField("ng"))))
      .drop("_clf_tk")
  }

  /** fastText-style text classifier: hashed unigram+bigram
    * term-frequency features (`HashingTF`, feature hashing — no vocab
    * table, no driver state, fixed width at any corpus size) into
    * binomial logistic regression. This is the classifier-based
    * curation filter of the GPT-3/LLaMA lineage: train on "looks like
    * the trusted corpus" vs "random crawl" labels, then score every
    * document — the learned alternative to [[graft.operators.TextAnalysis.dsirLogRatio]]'s
    * fixed unigram ratio.
    *
    * Scale: tokenize+hash is a per-row map; LR training is
    * spark.ml's distributed LBFGS (gradient aggregation, no
    * per-feature driver state beyond the 2^`hashBits`-dim coefficient
    * vector); scoring is a broadcast of that vector. */
  def textClassifier(hashBits: Int = 12): (org.apache.spark.ml.feature.HashingTF, LogisticRegression) = {
    val tf = new org.apache.spark.ml.feature.HashingTF()
      .setInputCol("clf_toks").setOutputCol("features")
      .setNumFeatures(1 << hashBits)
    val lr = new LogisticRegression()
      .setFamily("binomial").setMaxIter(50).setRegParam(1e-3)
    (tf, lr)
  }

  /** Train + evaluate the text classifier on (text, label): seeded
    * 60/40 split, accuracy on the held-out side, and the scored
    * corpus (prediction per document) from the fitted model. */
  def trainTextClassifier(df: DataFrame, text: Column, label: Column,
                          hashBits: Int = 12): (Eval, DataFrame) = {
    val prepared = withClassifierTokens(
      df.withColumn("label", label.cast("double")), text)
    // a NULL label (e.g. null lang upstream) is missing data, not a
    // class — it cannot train or be evaluated, so it drops from the
    // split; the SCORED output still covers the WHOLE corpus
    // (transform never reads the label, and null text already
    // tokenizes to "no features" in withClassifierTokens)
    val labeled = prepared.filter(col("label").isNotNull)
    val Array(train, test) = labeled.randomSplit(Array(0.6, 0.4), Seed)
    val (tf, lr) = textClassifier(hashBits)
    val pipeline = new Pipeline().setStages(Array(tf, lr))
    val model = pipeline.fit(train)
    val acc = new MulticlassClassificationEvaluator()
      .setMetricName("accuracy").evaluate(model.transform(test))
    (Eval(model, acc, 1.0 - acc, train.count(), test.count()),
      model.transform(prepared))
  }

  /** A7/A8 parity: MLWriter round-trip. */
  def saveLoad(model: PipelineModel, path: String): PipelineModel = {
    model.write.overwrite().save(path)
    PipelineModel.load(path)
  }

  final case class CvEval(model: org.apache.spark.ml.tuning.CrossValidatorModel,
                          bestMaxDepth: Int, avgMetrics: Seq[Double],
                          testAccuracy: Double)

  /** Seeded k-fold model selection over the decision tree's depth —
    * the model-selection surface the reference lacked entirely (it
    * trained each model once on one unseeded split). Grid and folds
    * are deliberately small: selection cost is folds × grid × one
    * fit, all distributed; nothing driver-bound grows with data. The
    * winning depth is refit on the full train split by CrossValidator
    * itself; accuracy is reported on the held-out 40%. */
  def crossValidateTree(features: DataFrame,
                        depths: Seq[Int] = Seq(3, 6, 9),
                        folds: Int = 3): CvEval = {
    import org.apache.spark.ml.tuning.{CrossValidator, ParamGridBuilder}
    // same unobserved-feature / missing-label drop as [[trainEval]]
    val usable = observed(features).filter(col("label").isNotNull)
    val Array(train, test) = usable.randomSplit(Array(0.6, 0.4), Seed)
    val tree = decisionTree
    val pipeline = new Pipeline().setStages(Array(assembler, tree))
    val grid = new ParamGridBuilder()
      .addGrid(tree.maxDepth, depths).build()
    val cv = new CrossValidator()
      .setEstimator(pipeline)
      .setEvaluator(new MulticlassClassificationEvaluator()
        .setMetricName("accuracy"))
      .setEstimatorParamMaps(grid)
      .setNumFolds(folds)
      .setSeed(Seed)
    val model = cv.fit(train)
    val best = model.bestModel.asInstanceOf[PipelineModel]
      .stages.last.asInstanceOf[org.apache.spark.ml.classification.DecisionTreeClassificationModel]
    val acc = new MulticlassClassificationEvaluator()
      .setMetricName("accuracy").evaluate(model.transform(test))
    CvEval(model, best.getMaxDepth, model.avgMetrics.toSeq, acc)
  }
}
