package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries (Queries.benchNames) on
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query seconds.
  * Each query is forced with .count() (full plan execution, no result
  * materialization on the driver beyond the count).
  *
  * Failures are NEVER silently absorbed into a better-looking total: a
  * query that throws is timed as -1, listed in the `failed` array, and
  * makes the process exit nonzero — a crashing bench query must look
  * like a failure, not like a speedup. */
object Bench {

  /** Warm-up once (JIT + codegen + file listing), then timed passes
    * INTERLEAVED round-robin — the full query list three times
    * (q1..qN, q1..qN, q1..qN), reporting each query's min. This host
    * shows ±50% noisy-neighbor swings lasting seconds-to-minutes;
    * back-to-back passes of one query land all its samples inside a
    * single noisy window (round 3→4 showed 3.7× swings on identical
    * code), while round-robin spreads the three samples across the
    * whole run so at most one is likely contaminated. Returns
    * (per-query seconds in input order, -1 for failures; failed
    * names). */
  def timeAll(names: Seq[String], runOne: String => Unit, passes: Int = 3)
      : (Seq[(String, Double)], Seq[String]) = {
    names.foreach { n =>
      try runOne(n)
      catch { case _: Throwable => () }              // timed passes report it
    }
    def timeOnce(n: String): Double = {
      val t0 = System.nanoTime()
      val ok = try { runOne(n); true } catch { case _: Throwable => false }
      if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
    }
    val samples = Seq.fill(passes)(names.map(n => n -> timeOnce(n))).flatten
    val byName = samples.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val results = names.map { n =>
      val ts = byName(n)
      n -> (if (ts.exists(_ < 0)) -1.0 else ts.min)
    }
    (results, results.collect { case (n, t) if t < 0 => n })
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val (results, failed) =
      timeAll(Queries.benchNames, n => { Queries.queries(n)(spark, sfDir).count(); () })
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fs,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
