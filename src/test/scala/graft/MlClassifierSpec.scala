package graft

import org.apache.spark.sql.functions._
import graft.ml.Models

/** The fastText-style hashed-n-gram text classifier: separable
  * vocabularies must classify near-perfectly, feature extraction must
  * stay an expression (no UDF), and word ORDER must matter (the bigram
  * half of the feature stream). */
class MlClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(seed: Int): Seq[(Long, String, Double)] = {
    val rnd = new scala.util.Random(seed)
    val a = Vector("alpha", "beta", "gamma", "delta")
    val b = Vector("omega", "psi", "chi", "phi")
    (0 until 200).map { i =>
      val v = if (i % 2 == 0) a else b
      val words = Seq.fill(12)(v(rnd.nextInt(v.size)))
      (i.toLong, words.mkString(" "), (i % 2).toDouble)
    }
  }

  test("separable vocabularies classify near-perfectly") {
    val docs = corpus(11).toDF("doc_id", "text", "y")
    val (eval, scored) = Models.trainTextClassifier(
      docs, col("text"), col("y"))
    assert(eval.accuracy >= 0.95, s"accuracy ${eval.accuracy}")
    assert(eval.nTrain + eval.nTest == 200)
    // scored output covers the whole corpus, not just the test split
    assert(scored.count() == 200)
  }

  test("classifier tokens are unigrams + adjacent bigrams, as expressions") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val toks = Models.withClassifierTokens(docs, col("text"))
      .select(col("clf_toks")).as[Seq[String]].head()
    assert(toks == Seq("a", "b", "c", "a b", "b c"))
    // the feature column is pure expressions — no ScalaUDF in the plan
    val plan = Models.withClassifierTokens(docs, col("text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), s"feature extraction must be codegen'd:\n$plan")
  }

  test("null documents contribute no features instead of crashing the fit") {
    // a null text row: tokens(null) is null — without the coalesce the
    // concat propagates null and HashingTF NPEs at fit time
    val docs = (corpus(13) :+ ((200L, null: String, 0.0)))
      .toDF("doc_id", "text", "y")
    val toks = Models.withClassifierTokens(docs, col("text"))
      .filter(col("doc_id") === 200L)
      .select(col("clf_toks")).as[Seq[String]].head()
    assert(toks == Seq.empty, s"null text must yield zero tokens, got $toks")
    val (eval, scored) = Models.trainTextClassifier(docs, col("text"), col("y"))
    assert(eval.nTrain + eval.nTest == 201)
    assert(scored.count() == 201)
  }

  test("bigram features separate order-only classes where unigrams cannot") {
    // both classes use the SAME unigram multiset; only order differs
    val docs = (0 until 200).map { i =>
      val text = if (i % 2 == 0) "up down " * 6 else "down up " * 6
      (i.toLong, text.trim, (i % 2).toDouble)
    }.toDF("doc_id", "text", "y")
    val (eval, _) = Models.trainTextClassifier(docs, col("text"), col("y"))
    assert(eval.accuracy >= 0.95,
      s"order-only separation needs the bigram stream: ${eval.accuracy}")
  }
}
