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
}
