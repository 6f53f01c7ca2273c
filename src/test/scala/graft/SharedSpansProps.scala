package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean
import graft.operators.TextAnalysis

/** Property test for [[TextAnalysis.sharedSpans]]: for ANY random
  * corpus over a tiny alphabet (so cross-document n-gram collisions
  * are common), the engine's maximal spans equal a driver-side
  * brute-force restatement of the contract — n-gram document
  * frequencies, flagged start positions, consecutive-position island
  * grouping, and gram-overlap text reconstruction. */
object SharedSpansProps extends Properties("SharedSpans") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .withExtensions(new graft.plans.GraftExtensions)
    .getOrCreate()

  private val genCorpus: Gen[List[(Long, String)]] = for {
    nDocs <- Gen.choose(2, 8)
    docs <- Gen.sequence[List[(Long, String)], (Long, String)](
      (1 to nDocs).map { id =>
        for {
          len <- Gen.choose(0, 25)
          toks <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d"))
        } yield (id.toLong, toks.mkString(" "))
      }.toList)
  } yield docs

  /** The operator's contract in plain Scala. */
  private def brute(docs: Seq[(Long, String)], n: Int, minDocs: Int,
                    minSpanTokens: Int): Set[(Long, Long, Long, Long, String)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
    val grams = toks.view.mapValues(ts =>
      if (ts.length < n) Seq.empty
      else (0 to ts.length - n).map(p => p -> ts.slice(p, p + n).mkString(" ")))
      .toMap
    val df = grams.values.flatMap(_.map(_._2).distinct)
      .groupBy(identity).view.mapValues(_.size).toMap
    grams.flatMap { case (id, gs) =>
      val flagged = gs.filter { case (_, g) => df(g) >= minDocs }.map(_._1).sorted
      // islands of consecutive start positions
      val runs = flagged.foldLeft(List.empty[List[Int]]) {
        case (acc, p) if acc.nonEmpty && acc.head.head == p - 1 =>
          (p :: acc.head) :: acc.tail
        case (acc, p) => List(p) :: acc
      }.map(_.reverse).reverse
      runs.map { run =>
        val start = run.head
        val spanTok = run.last - run.head + n
        val text = toks(id).slice(start, start + spanTok).mkString(" ")
        (id, start.toLong, spanTok.toLong, run.size.toLong, text)
      }.filter(_._3 >= minSpanTokens)
    }.toSet
  }

  property("sharedSpans equals the brute-force contract on random tiny-alphabet corpora") =
    Prop.forAll(genCorpus, Gen.choose(2, 4), Gen.oneOf(2, 3),
      Gen.choose(0, 6)) { (docs, n, minDocs, minSpan) =>
      import spark.implicits._
      val got = TextAnalysis.sharedSpans(
          docs.toDF("doc_id", "text"), col("doc_id"), col("text"),
          n = n, minDocs = minDocs.toLong, minSpanTokens = minSpan)
        .as[(Long, Long, Long, Long, String)].collect().toSet
      val want = brute(docs, n, minDocs, minSpan)
      (got == want: Prop) :| s"engine $got\nvs brute $want\ndocs=$docs n=$n minDocs=$minDocs minSpan=$minSpan"
    }
}
