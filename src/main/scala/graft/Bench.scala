package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries (Queries.benchNames) on
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query seconds.
  * Each query is forced with .count() (full plan execution, no result
  * materialization on the driver beyond the count). */
object Bench {
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

    val names = Queries.benchNames
    // one warm-up pass (JIT + codegen + file listing), then two timed
    // passes per query, reporting the min (GC/scheduling noise damping)
    names.foreach { n =>
      try Queries.queries(n)(spark, sfDir).count()
      catch { case _: Throwable => () }
    }
    def timeOnce(n: String): Double = {
      val t0 = System.nanoTime()
      val ok = try { Queries.queries(n)(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
      // failures are reported as -1, never as a timing
      if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
    }
    val results = names.map { n =>
      val (a, b) = (timeOnce(n), timeOnce(n))
      n -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
