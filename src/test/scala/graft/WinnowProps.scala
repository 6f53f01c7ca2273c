package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean
import graft.functions.GraftFunctions

/** Property test for the native winnowing kernel: the selection law
  * restated in plain Scala (no Spark HOFs — independent of the
  * declarative twin the differential test already pins) on random
  * small-alphabet corpora with null tokens mixed in. Also pins the
  * structural invariants the q167/q168 oracles lean on: positions
  * strictly increase (so sorted-distinct ≡ the selection sequence)
  * and the Schleimer density/guarantee bounds. */
object WinnowProps extends Properties("Winnow") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .withExtensions(new graft.plans.GraftExtensions)
    .getOrCreate()

  private val Mod = 1000000007L

  private def polyHash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  /** The kernel's contract in plain Scala. */
  private def brute(toks: Seq[String], k: Int, w: Int): Seq[(Int, Long)] = {
    if (toks.length < k) return Seq.empty
    val hs = (0 to toks.length - k).map { i =>
      // concat_ws law: null tokens skip, single-space join of the rest
      polyHash(toks.slice(i, i + k).filter(_ != null).mkString(" "))
    }
    val m = hs.length
    val nw = math.max(1, m - w + 1)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    var last = -1
    for (i <- 0 until nw) {
      val end = math.min(i + w, m)
      var best = i
      for (j <- i + 1 until end) if (hs(j) <= hs(best)) best = j
      if (best != last) { out += (best -> hs(best)); last = best }
    }
    out.toSeq
  }

  private val genToks: Gen[List[String]] = for {
    len <- Gen.choose(0, 30)
    toks <- Gen.listOfN(len,
      Gen.frequency(9 -> Gen.oneOf("a", "b", "cc", "ddd"), 1 -> Gen.const(null: String)))
  } yield toks

  property("native winnow == brute selection law (with null tokens)") =
    Prop.forAll(Gen.nonEmptyListOf(genToks), Gen.choose(1, 4), Gen.choose(1, 5)) {
      (docs, k, w) =>
        val sp = spark
        import sp.implicits._
        val out = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("id", "toks")
          .withColumn("f", GraftFunctions.winnowFingerprints(col("toks"), k, w))
          .select("id", "f")
          .as[(Long, Seq[(Int, Long)])].collect().toMap
        Prop.all(docs.zipWithIndex.map { case (t, i) =>
          val expect = brute(t, k, w)
          (out(i.toLong) == expect) :|
            s"doc $i k=$k w=$w: ${out(i.toLong)} vs $expect"
        }: _*)
    }

  property("selections strictly increase in position (the oracle's sorted-distinct basis)") =
    Prop.forAll(genToks, Gen.choose(1, 4), Gen.choose(1, 5)) { (t, k, w) =>
      val sel = brute(t, k, w).map(_._1)
      sel.zip(sel.drop(1)).forall { case (a, b) => a < b } :| s"$sel"
    }

  property("density: at most one selection per window start, at least one per full window span") =
    Prop.forAll(genToks, Gen.choose(1, 4), Gen.choose(1, 5)) { (t, k, w) =>
      val m = math.max(0, t.length - k + 1)
      val sel = brute(t, k, w)
      if (m == 0) (sel.isEmpty :| "no grams -> no selections")
      else {
        val nw = math.max(1, m - w + 1)
        (sel.nonEmpty && sel.length <= nw) :| s"${sel.length} vs nw=$nw" &&
          // every window [i, i+w) contains a selection (coverage — the
          // detection guarantee's mechanical half)
          Prop.all((0 until nw).map { i =>
            sel.exists(s => s._1 >= i && s._1 < math.min(i + w, m)) :|
              s"window $i uncovered: $sel"
          }: _*)
      }
    }
}
