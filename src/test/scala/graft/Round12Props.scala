package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

/** Round-12 differentials. The portable rounding helper `r` must equal
  * the DOUBLE-ONLY floor sequence DuckDB executes (`floor` stays
  * DOUBLE there; Scala's `math.floor` has the same semantics) for ANY
  * magnitude — the r11→r12 bug was Spark's long-returning floor
  * silently clamping everything past ~9.2e12·10^-d at Long.MaxValue,
  * a regime the clean fixtures never reached (pre-epoch µs gaps and
  * ×1e6 dirt do). */
object Round12Props extends Properties("Round12Ops") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(30)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .withExtensions(new graft.plans.GraftExtensions)
    .getOrCreate()

  // mantissa × 10^e sweeps ~27 decades, crossing 2^53 and the long
  // clamp boundary from both sides, both signs
  private val xGen = for {
    m <- Gen.choose(-1.0, 1.0)
    e <- Gen.choose(-6, 21)
  } yield m * math.pow(10.0, e)

  property("r(x, d) equals the double-only floor replay at any magnitude") =
    Prop.forAll(xGen, Gen.oneOf(2, 4, 6)) { (x, d) =>
      import spark.implicits._
      val got = Seq(x).toDF("x")
        .select(graft.functions.GraftFunctions.r(col("x"), d).as("r"))
        .as[Double].head()
      val k = math.pow(10.0, d)
      val want = math.floor(x * k + 0.5) / k // DuckDB: floor stays DOUBLE
      (java.lang.Double.compare(got, want) == 0: Prop) :|
        s"x=$x d=$d got=$got want=$want"
    }

  // ---- binned quantile normalization ≡ exact, on the grid ----------- //

  private val qnGen = for {
    n <- Gen.choose(1, 40)
    rows <- Gen.listOfN(n, for {
      // NULL strata included: the exact twin's window partitions group
      // NULLs, so the binned path's stratum joins must be null-safe
      g <- Gen.oneOf(Option("a"), Option("b"), Option("c"),
        Option.empty[String])
      x <- Gen.choose(0L, 30L)   // narrow range → plenty of tick ties
    } yield (g, x))
  } yield rows.zipWithIndex.map { case ((g, x), i) => (i.toLong, g, x) }

  property("quantileNormalizeBinned(scale=1) EQUALS the exact operator " +
      "on integer scores") =
    Prop.forAll(qnGen) { rows =>
      import spark.implicits._
      def slurp(df: org.apache.spark.sql.DataFrame) = df
        .select("id", "stratum", "score", "pct", "normalized")
        .as[(Long, Option[String], Double, Option[Double], Option[Double])]
        .collect().toSet
      val df = rows.toDF("id", "g", "x")
      val exact = slurp(graft.operators.Sampling.quantileNormalize(
        df, col("id"), col("g"), col("x")))
      val binned = slurp(graft.operators.Sampling.quantileNormalizeBinned(
        df, col("id"), col("g"), col("x"), scale = 1L))
      // bit-equal, not approximately: on a lossless grid the two paths
      // execute the SAME IEEE sequence (min-rank percentile, pooled
      // consecutive-order-statistic interpolation)
      (binned == exact: Prop) :| s"binned=$binned exact=$exact"
    }
}
