package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's full named-query surface (one entry per
  * implemented operator from SURVEY.md §2, defined in [[Queries]]);
  * `oracleSql` carries each query's DuckDB twin for the driver's
  * hash-compare at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: the reference's whole
    * sessionize → window → 11-feature pipeline as one DataFrame chain.
    * Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.queries("q20_feature_pipeline")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.queries

  def oracleSql: Map[String, String] = Queries.oracleSql
}
