package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.operators.Sketches

/** Property tests for the sketch family: for ANY generated count table
  * the CMS never undercounts and merges exactly; for ANY generated sets
  * the KMV bottom-k equals the brute-force k smallest distinct and the
  * Jaccard estimate is exact whenever the union fits in k. */
object SketchesProps extends Properties("Sketches") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .withExtensions(new graft.plans.GraftExtensions)
    .getOrCreate()

  private val countsGen = for {
    n <- Gen.choose(1, 120)
    toks <- Gen.listOfN(n, Gen.choose(0, 400).map(i => s"tok$i"))
    cnts <- Gen.listOfN(n, Gen.choose(1L, 50L))
  } yield toks.zip(cnts).groupMapReduce(_._1)(_._2)(_ + _).toSeq

  property("CMS never undercounts, at any width") =
    Prop.forAll(countsGen, Gen.oneOf(4, 16, 64)) { (counts, width) =>
      import spark.implicits._
      val df = counts.toDF("tok", "cnt")
      val cms = Sketches.cmsFromCounts(df, col("tok"), col("cnt"), width)
      val est = Sketches.cmsEstimate(df, cms, col("tok"), width)
        .select("tok", "cnt", "cms_est").as[(String, Long, Long)].collect()
      est.forall { case (_, cnt, e) => e >= cnt } :| s"undercount in $est"
    }

  property("CMS of a split stream merges to the CMS of the whole") =
    Prop.forAll(countsGen) { counts =>
      import spark.implicits._
      val width = 32
      val (a, b) = counts.splitAt(counts.length / 2)
      val whole = Sketches.cmsFromCounts(
        counts.toDF("tok", "cnt"), col("tok"), col("cnt"), width)
      val merged = Sketches.cmsFromCounts(a.toDF("tok", "cnt"), col("tok"), col("cnt"), width)
        .unionByName(Sketches.cmsFromCounts(b.toDF("tok", "cnt"), col("tok"), col("cnt"), width))
        .groupBy("row_idx", "bucket").agg(sum("cnt").as("cnt"))
      val w = whole.as[(Int, Long, Long)].collect().toSet
      val m = merged.as[(Int, Long, Long)].collect().toSet
      (w == m) :| s"whole=$w merged=$m"
    }

  private val setsGen = for {
    na <- Gen.choose(0, 60)
    nb <- Gen.choose(0, 60)
    a <- Gen.listOfN(na, Gen.choose(0L, 200L))
    b <- Gen.listOfN(nb, Gen.choose(0L, 200L))
  } yield (a.distinct, b.distinct)

  property("bottomK == brute-force k smallest distinct, per group") =
    Prop.forAll(setsGen, Gen.choose(1, 20)) { case ((a, b), k) =>
      import spark.implicits._
      val rows = (a.map(("a", _)) ++ b.map(("b", _))).toDF("grp", "h")
      val got = Sketches.bottomK(rows, col("grp"), col("h"), k)
        .as[(String, Seq[Long])].collect().toMap
      val want = Map("a" -> a.distinct.sorted.take(k),
        "b" -> b.distinct.sorted.take(k)).filter(_._2.nonEmpty)
      (got == want) :| s"got=$got want=$want"
    }

  property("kmvJaccard is EXACT whenever |A ∪ B| <= k") =
    Prop.forAll(setsGen) { case (a, b) =>
      import spark.implicits._
      val k = 256 // generated unions are at most ~120 distinct values
      val union = (a ++ b).distinct
      (a.nonEmpty && b.nonEmpty) ==> {
        val lists = Sketches.bottomK(
          (a.map(("a", _)) ++ b.map(("b", _))).toDF("grp", "h"),
          col("grp"), col("h"), k)
        val est = Sketches.kmvJaccard(lists, k)
          .as[(String, String, Double)].collect().head._3
        val exact = a.toSet.intersect(b.toSet).size.toDouble / union.size
        (math.abs(est - exact) < 1e-12) :| s"est=$est exact=$exact"
      }
    }
}
