package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.AsOf
import graft.sources.Tables

class AsOfCsvSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join picks the most recent right value at or before ts") {
    val left = Seq((1L, 100L, 10L), (1L, 250L, 11L), (1L, 50L, 12L), (2L, 100L, 13L))
      .toDF("k", "ts", "lid")
    val right = Seq((1L, 90L, 1.0, 20L), (1L, 200L, 2.0, 21L), (1L, 100L, 1.5, 22L))
      .toDF("k", "ts", "v", "rid")
    val out = AsOf.join(
        left.withColumnRenamed("lid", "event_id"),
        right.withColumnRenamed("rid", "event_id"),
        keys = Seq("k"), ts = "ts", valueCol = "v",
        tieBreak = Seq("event_id"))
      .select("k", "ts", "asof_v").as[(Long, Long, Option[Double])]
      .collect().toSet
    assert(out === Set(
      (1L, 100L, Some(1.5)),   // tie at 100 → right row included ("at or before")
      (1L, 250L, Some(2.0)),
      (1L, 50L, None),         // no earlier right row
      (2L, 100L, None)))       // other key
  }

  test("A5: schema'd CSV scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/fixture.csv"),
      "-5.1,8.0,1.1\n-5.2,8.2,1.2\n")
    val schema = StructType(Seq(
      StructField("acc_x", DoubleType), StructField("acc_y", DoubleType),
      StructField("acc_z", DoubleType)))
    val df = Tables.csv(spark, s"$dir/fixture.csv", schema)
    assert(df.count() === 2)
    assert(df.agg(sum("acc_y")).as[Double].collect().head === 16.2)
  }
}
