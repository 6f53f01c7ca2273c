package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean
import graft.operators.CorpusQuality

/** Property tests for [[CorpusQuality]]: the repetition fractions and
  * the JS divergence equal driver-side brute-force restatements of
  * their contracts on random small-alphabet corpora (tiny alphabet so
  * duplicate grams/lines and vocabulary overlap are common). */
object CorpusQualityProps extends Properties("CorpusQuality") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .withExtensions(new graft.plans.GraftExtensions)
    .getOrCreate()

  private val genDoc: Gen[String] = for {
    len <- Gen.choose(0, 30)
    toks <- Gen.listOfN(len, Gen.oneOf("a", "b", "cc", "ddd"))
  } yield toks.mkString(" ")

  private val genCorpus: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(1, 8)
    docs <- Gen.listOfN(n, genDoc)
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def grams(text: String, n: Int): Seq[String] = {
    val ts = text.split(" ", -1).toSeq
    if (ts.length < n) Seq.empty
    else (0 to ts.length - n).map(p => ts.slice(p, p + n).mkString(" "))
  }

  property("dupNgramCharFrac == brute occurrence-sum") =
    Prop.forAll(genCorpus, Gen.choose(1, 3)) { (docs, n) =>
      val sp = spark
      import sp.implicits._
      val out = CorpusQuality.dupNgramCharFrac(
        docs.toDF("doc_id", "text"), col("doc_id"), col("text"), n)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      Prop.all(docs.map { case (id, text) =>
        val gc = grams(text, n).groupBy(identity).view.mapValues(_.size)
        val dupChars = gc.collect {
          case (g, c) if c >= 2 => c.toLong * g.length
        }.sum
        val expect =
          if (text.isEmpty || gc.isEmpty) 0.0
          else math.min(1.0, dupChars.toDouble / text.length)
        (math.abs(out(id) - expect) < 1e-12) :| s"doc $id: ${out(id)} vs $expect"
      }: _*)
    }

  property("topNgramCharFrac == brute max-count coverage") =
    Prop.forAll(genCorpus, Gen.choose(1, 3)) { (docs, n) =>
      val sp = spark
      import sp.implicits._
      val out = CorpusQuality.topNgramCharFrac(
        docs.toDF("doc_id", "text"), col("doc_id"), col("text"), n)
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
      Prop.all(docs.map { case (id, text) =>
        // the operator pins WHICH gram wins a count tie by portable
        // hash; the brute side therefore accepts the coverage value of
        // ANY count-maximal gram (coverage is tie-invariant only when
        // tied grams share a length)
        val gc = grams(text, n).groupBy(identity).view.mapValues(_.size).toMap
        val cands: Seq[Double] =
          if (gc.isEmpty || text.isEmpty) Seq(0.0)
          else {
            val maxC = gc.values.max
            gc.collect { case (g, c) if c == maxC =>
              math.min(1.0, c.toLong * g.length.toDouble / text.length)
            }.toSeq
          }
        out(id).exists(v => cands.exists(e => math.abs(v - e) < 1e-12)) :|
          s"doc $id: ${out(id)} not among tied candidates $cands"
      }: _*)
    }

  property("withLineStats == brute line dedup arithmetic") =
    Prop.forAll(genCorpus) { docs =>
      val sp = spark
      import sp.implicits._
      // turn some tokens into line breaks to get multi-line docs
      val lined = docs.map { case (id, t) => (id, t.replace(" b ", "\n")) }
      val out = CorpusQuality.withLineStats(
        lined.toDF("doc_id", "text"), col("text"))
        .select("doc_id", "n_lines", "n_distinct_lines", "dup_line_frac",
          "dup_line_char_frac")
        .collect().map(r => r.getLong(0) -> r).toMap
      Prop.all(lined.map { case (id, text) =>
        val lines = text.split("\n", -1).toSeq
        val dist = lines.distinct
        val tot = lines.map(_.length.toLong).sum
        val dc = dist.map(_.length.toLong).sum
        val r = out(id)
        (r.getLong(1) == lines.length.toLong) :| s"n_lines $id" &&
        (r.getLong(2) == dist.length.toLong) :| s"n_distinct $id" &&
        (math.abs(r.getDouble(3) -
          (1.0 - dist.length.toDouble / lines.length)) < 1e-12) :| s"frac $id" &&
        (math.abs(r.getDouble(4) -
          (if (tot == 0L) 0.0 else 1.0 - dc.toDouble / tot)) < 1e-12) :|
          s"charfrac $id"
      }: _*)
    }

  property("jsDivergence == brute, symmetric-by-construction, in [0, ln 2]") =
    Prop.forAll(genCorpus) { docs =>
      val sp = spark
      import sp.implicits._
      val sourced = docs.map { case (id, t) => (s"s${id % 3}", t) }
      val out = CorpusQuality.jsDivergence(
        sourced.toDF("source", "text"), col("source"), col("text"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
        .toMap
      val dists = sourced.groupBy(_._1).view.mapValues { ds =>
        val toks = ds.flatMap(_._2.split(" ", -1))
        val c = toks.groupBy(identity).view.mapValues(_.size.toDouble).toMap
        c.view.mapValues(_ / toks.size).toMap
      }.toMap
      def js(a: String, b: String): Double = {
        val (p, q) = (dists(a), dists(b))
        (p.keySet ++ q.keySet).toSeq.map { t =>
          val (pa, pb) = (p.getOrElse(t, 0.0), q.getOrElse(t, 0.0))
          0.5 * ((if (pa > 0) pa * math.log(2 * pa / (pa + pb)) else 0.0)
            + (if (pb > 0) pb * math.log(2 * pb / (pa + pb)) else 0.0))
        }.sum
      }
      val names = dists.keys.toSeq.sorted
      val expectedPairs = (for {
        a <- names; b <- names if a < b
      } yield (a, b)).toSet
      (out.keySet == expectedPairs) :| s"pairs ${out.keySet} vs $expectedPairs" &&
        Prop.all(out.toSeq.map { case ((a, b), v) =>
          (math.abs(v - js(a, b)) < 1e-9) :| s"js($a,$b) $v vs ${js(a, b)}" &&
            (v >= -1e-12 && v <= math.log(2.0) + 1e-12) :| s"bounds $v"
        }: _*)
    }
}
