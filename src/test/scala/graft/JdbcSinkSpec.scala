package graft

import org.apache.spark.sql.functions._
import graft.sources.Sinks

/** A6 end to end: the distributed batched JDBC sink against an
  * embedded in-memory Derby database (on the Spark classpath) — the
  * integration the reference did row-at-a-time against MySQL
  * (`data/SampledDataDump.java`). */
class JdbcSinkSpec extends SparkSpec {
  import spark.implicits._

  test("writeJdbc round-trips rows through a real database") {
    val url = "jdbc:derby:memory:graftdb;create=true"
    val df = (1 to 100).map(i => (i.toLong, s"name_$i", i * 1.5))
      .toDF("id", "label", "score")

    Sinks.writeJdbc(df, url, "features", user = "", password = "",
      batchSize = 25, numPartitions = 4,
      mode = org.apache.spark.sql.SaveMode.Overwrite)

    val back = spark.read
      .format("jdbc")
      .option("url", url)
      .option("dbtable", "features")
      .load()
    assert(back.count() === 100)
    assert(back.agg(sum(col("score"))).as[Double].collect().head
      === (1 to 100).map(_ * 1.5).sum)
    // distributed write: reread preserves every id exactly once
    assert(back.select("id").distinct().count() === 100)
  }
}
