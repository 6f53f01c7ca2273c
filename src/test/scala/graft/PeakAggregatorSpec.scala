package graft

import org.apache.spark.sql.functions._
import graft.functions.PeakIntervalAggregator
import graft.operators.Features

/** The typed-Aggregator (UDAF) form of avg-time-between-peaks must
  * agree exactly with the window-function form in Features.aggregate,
  * including the <2-peaks and duplicate-timestamp edge cases. */
class PeakAggregatorSpec extends SparkSpec {
  import spark.implicits._

  val peakUdaf = udaf(PeakIntervalAggregator)

  def compare(rows: Seq[(Long, Long, Double)]): Unit = {
    val df = rows.toDF("k", "ts", "y")
    val viaUdaf = df.groupBy(col("k"))
      .agg(peakUdaf(col("ts"), col("y")).as("p"))
      .select("k", "p").as[(Long, Double)].collect().toMap
    val viaWindow = Features.aggregate(
      df.withColumn("x", col("y")).withColumn("z", col("y")),
      Seq("k"), col("ts"),
      Features.Axes(col("x"), col("y"), col("z")))
      .select(col("k"), col("peak_avg_interval"))
      .as[(Long, Double)].collect().toMap
    assert(viaUdaf === viaWindow)
  }

  test("agrees with the window form on a normal series") {
    compare((0 until 20).map(i => (1L, i * 1000L, 5.0 + (i % 4) * 0.5)))
  }

  test("agrees on <2 peaks (single spike) and duplicate timestamps") {
    compare(Seq((1L, 0L, 1.0), (1L, 1000L, 50.0), (1L, 2000L, 1.0)))
    compare(Seq((2L, 0L, 9.0), (2L, 0L, 9.5), (2L, 2000L, 9.6), (2L, 2000L, 9.4)))
  }

  test("registrable as a SQL UDAF") {
    spark.udf.register("graft_peak_interval", peakUdaf)
    Seq((1L, 0L, 9.0), (1L, 1000L, 9.5), (1L, 2000L, 9.6)).toDF("k", "ts", "y")
      .createOrReplaceTempView("peak_in")
    val r = spark.sql(
      "SELECT graft_peak_interval(ts, y) FROM peak_in GROUP BY k")
      .as[Double].collect().head
    assert(r === 1000.0)
  }
}
