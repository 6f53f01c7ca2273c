package graft

/** Driver-contract smoke: every registered query runs at sf0.001 and
  * the flagship entry returns rows. */
class EntrySmokeSpec extends SparkSpec {

  test("entry (flagship feature pipeline) returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query/oracle pair is consistently registered") {
    assert(SparkEntry.queries.nonEmpty)
    // every oracle key has a query
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    // bench set is a subset of queries
    assert(Queries.benchNames.toSet.subsetOf(SparkEntry.queries.keySet))
  }

  test("external sessions without the nanos flag self-heal (driver contract)") {
    // the driver smoke-calls entry() with a session this library did not
    // build — if the flag is missing, the events read must set it (with
    // a warning) rather than fail
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    try {
      val n = graft.sources.Tables.events(spark, sf("sf0.001")).count()
      assert(n > 0)
      assert(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") === "true")
    } finally
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
  }
}
