package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

/** Round-13 differentials: the OFF-GRID error law of
  * `quantileNormalizeBinned` (Round12Props pins grid-exact equality at
  * scale = 1; these pin what the operator promises for everything
  * else).
  *
  * The sharp general law is a REDUCTION: binned at scale s on ANY
  * scores equals the EXACT operator run on the pre-quantized scores
  * `floorSafe(x·s + 0.5)/s` — bit-for-bit, because both then execute
  * the same min-rank percentile and pooled consecutive-order-statistic
  * interpolation over the same value multiset. Everything the exact
  * twin's own brute-force differential (Round11Props) proves therefore
  * transfers to the binned path with quantized inputs. The generator's
  * scale-1 arm sweeps ~25 decades ACROSS the long-saturation boundary,
  * so this property also pins the floorSafe guard: the pre-guard code
  * collapsed every |x| ≥ ~9.2e18 into one Long.MaxValue tick, which
  * fails this reduction (the exact twin keeps distinct huge scores
  * distinct).
  *
  * The stated user-facing trade ("ties at tick granularity") follows
  * as the second property: when quantization is INJECTIVE on the
  * input's distinct scores (tick-distinct inputs), ranks are
  * unchanged, so `pct` is bit-exact vs the exact operator and
  * `normalized` differs by at most the half-tick quantization error
  * 1/(2s) — each pooled order statistic moves by |x − q(x)| ≤ 1/(2s)
  * and the output is a convex combination of two of them. */
object Round13Props extends Properties("Round13Ops") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(25)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .withExtensions(new graft.plans.GraftExtensions)
    .getOrCreate()

  /** The tick-value model — MUST replay floorSafe's guarded branch
    * (plain math.floor would agree anyway since Scala floor stays
    * DOUBLE; the branch is written out so the model documents the
    * regime split the Spark side actually executes). */
  private def quantize(x: Double, s: Long): Double = {
    val v = x * s + 0.5
    (if (math.abs(v) >= graft.functions.GraftFunctions.FloorSafeBound) v
     else math.floor(v)) / s
  }

  private val stratumGen: Gen[Option[String]] =
    Gen.oneOf(Option("a"), Option("b"), Option("c"), Option.empty[String])

  // Two regimes, both chosen so tick → tick/s is injective (a distinct
  // double for every distinct tick — the ONLY precondition the
  // reduction needs, and one any sane (score-range, scale) pairing
  // satisfies): scale 1 across ~25 decades incl. both sides of the
  // long-saturation boundary (t/1 = t); finer grids at magnitudes
  // where |t| < 2^53 so t/s keeps distinct ticks distinct.
  private val anyGen: Gen[(Long, List[(Long, Option[String], Option[Double])])] = {
    // ~1 in 8 scores NULL: both paths share the drop-NULL-scores law,
    // so NULL rows must vanish identically from both outputs
    def rows(n: Int, xGen: Gen[Double]) = Gen.listOfN(n, for {
      g <- stratumGen
      x <- Gen.frequency(7 -> xGen.map(Option(_)),
        1 -> Gen.const(Option.empty[Double]))
    } yield (g, x)).map(_.zipWithIndex.map { case ((g, x), i) => (i.toLong, g, x) })
    val wide = for {
      m <- Gen.choose(-1.0, 1.0); e <- Gen.choose(-3, 21)
    } yield m * math.pow(10.0, e)
    Gen.oneOf(
      for { n <- Gen.choose(1, 30); r <- rows(n, wide) } yield (1L, r),
      for {
        s <- Gen.oneOf(2L, 10L, 100L)
        n <- Gen.choose(1, 30)
        r <- rows(n, Gen.choose(-1.0e9, 1.0e9))
      } yield (s, r))
  }

  private def slurp(df: org.apache.spark.sql.DataFrame) = df
    .select("id", "stratum", "pct", "normalized")
    .as[(Long, Option[String], Option[Double], Option[Double])](
      org.apache.spark.sql.Encoders.product[
        (Long, Option[String], Option[Double], Option[Double])])
    .collect().toSet

  property("quantileNormalizeBinned(s) REDUCES to the exact operator " +
      "on pre-quantized scores — any magnitude, incl. past long saturation") =
    Prop.forAll(anyGen) { case (s, rowsList) =>
      import spark.implicits._
      val raw = rowsList.toDF("id", "g", "x")
      val binned = slurp(graft.operators.Sampling.quantileNormalizeBinned(
        raw, col("id"), col("g"), col("x"), scale = s))
      val pre = rowsList.map { case (i, g, x) => (i, g, x.map(quantize(_, s))) }
        .toDF("id", "g", "x")
      val exactOnQuantized = slurp(graft.operators.Sampling.quantileNormalize(
        pre, col("id"), col("g"), col("x")))
      (binned == exactOnQuantized: Prop) :|
        s"s=$s binned=$binned exactOnQuantized=$exactOnQuantized"
    }

  // tick-distinct inputs by construction: distinct ticks t, scores
  // (t + j)/s with |j| ≤ 0.4 — x·s + 0.5 lands in (t+0.1, t+0.9), so
  // the tick is t even after the division round trip's ulp
  private val tickDistinctGen: Gen[(Long, List[(Long, Option[String], Double)])] =
    for {
      s <- Gen.oneOf(1L, 4L, 100L)
      ticks <- Gen.listOfN(25, Gen.choose(-2000L, 2000L)).map(_.distinct)
      gs <- Gen.listOfN(25, stratumGen)
      js <- Gen.listOfN(25, Gen.choose(-0.4, 0.4))
    } yield (s, ticks.zip(gs).zip(js).zipWithIndex.map {
      case (((t, g), j), i) => (i.toLong, g, (t + j) / s.toDouble)
    })

  property("tick-distinct scores: pct bit-exact vs the exact operator; " +
      "|normalized − exact| ≤ 1/(2s)") =
    Prop.forAll(tickDistinctGen) { case (s, rowsList) =>
      import spark.implicits._
      val df = rowsList.toDF("id", "g", "x")
      def byId(r: org.apache.spark.sql.DataFrame) =
        slurp(r).map { case (i, _, p, nz) => i -> (p, nz) }.toMap
      val exact = byId(graft.operators.Sampling.quantileNormalize(
        df, col("id"), col("g"), col("x")))
      val binned = byId(graft.operators.Sampling.quantileNormalizeBinned(
        df, col("id"), col("g"), col("x"), scale = s))
      val halfTick = 0.5 / s
      val bad = exact.keys.filter { i =>
        val (pe, ne) = exact(i); val (pb, nb) = binned(i)
        val pctOk = (pe, pb) match {
          case (Some(a), Some(b)) => java.lang.Double.compare(a, b) == 0
          case (None, None)       => true
          case _                  => false
        }
        val normOk = (ne, nb) match {
          case (Some(a), Some(b)) =>
            math.abs(a - b) <= halfTick + 1e-9 * (1.0 + math.abs(a))
          case (None, None) => true
          case _            => false
        }
        !(pctOk && normOk)
      }
      (bad.isEmpty: Prop) :| s"s=$s bad ids=$bad exact=$exact binned=$binned"
    }
}
