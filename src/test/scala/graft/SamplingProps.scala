package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.operators.Sampling

/** Property tests for the training-mix samplers: for ANY generated
  * corpus the token-budget mix equals the brute-force "largest
  * rank-prefix whose inclusive token sum fits the quota" per stratum —
  * never overruns, keeps exactly a prefix of the quality ranking, and
  * treats NULL token counts as absent documents. */
object SamplingProps extends Properties("Sampling") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .withExtensions(new graft.plans.GraftExtensions)
    .getOrCreate()

  // (stratum, id, tokens [None = dirty row], score); ids unique
  private val corpusGen: Gen[List[(String, Long, Option[Long], Double)]] = for {
    n <- Gen.choose(0, 80)
    rows <- Gen.listOfN(n, for {
      s <- Gen.oneOf("en", "es", "de", "xx")      // xx: unlisted stratum
      t <- Gen.frequency(9 -> Gen.choose(1L, 40L).map(Some(_)),
                         1 -> Gen.const(Option.empty[Long]))
      q <- Gen.choose(0, 50).map(_.toDouble)      // coarse: forces ties
    } yield (s, t, q))
  } yield rows.zipWithIndex.map { case ((s, t, q), i) => (s, i.toLong, t, q) }

  private val Shares = Seq(("en", 0.5), ("es", 0.3), ("de", 0.2))

  property("token mix == brute-force largest fitting rank-prefix per stratum") =
    Prop.forAll(corpusGen, Gen.choose(1L, 120L)) { (corpus, budget) =>
      import spark.implicits._
      val df = corpus.toDF("src", "id", "n_tok", "score")
      val got = Sampling.trainingMixTokens(df, col("src"), col("n_tok"),
          rankBy = col("score"), tieBreak = col("id"), budgetTokens = budget,
          shares = Shares)
        .select(col("id"), col("cum_tokens")).as[(Long, Long)].collect().toMap

      // brute force: per stratum, sort by (score desc, id asc) over the
      // NON-NULL-token rows, keep while the inclusive sum fits the quota
      val expect = Shares.flatMap { case (s, p) =>
        val quota = math.round(p * budget)
        val ranked = corpus.filter(r => r._1 == s && r._3.nonEmpty)
          .sortBy(r => (-r._4, r._2))
        val sums = ranked.scanLeft(0L)(_ + _._3.get).tail
        ranked.zip(sums).takeWhile(_._2 <= quota)
          .map { case (r, c) => r._2 -> c }
      }.toMap
      (got == expect) :| s"budget=$budget got=$got expect=$expect"
    }

  property("row mix keeps exactly the top-quota rank-prefix per stratum") =
    Prop.forAll(corpusGen, Gen.choose(1L, 40L)) { (corpus, budget) =>
      import spark.implicits._
      val df = corpus.toDF("src", "id", "n_tok", "score")
      val got = Sampling.trainingMix(df, col("src"), col("score"), col("id"),
          budget, Shares)
        .select(col("id")).as[Long].collect().toSet
      val expect = Shares.flatMap { case (s, p) =>
        corpus.filter(_._1 == s).sortBy(r => (-r._4, r._2))
          .take(math.round(p * budget).toInt).map(_._2)
      }.toSet
      (got == expect) :| s"budget=$budget got=$got expect=$expect"
    }
}
