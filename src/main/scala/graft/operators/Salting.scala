package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.longDiv

/** Skew mitigation by key salting (`SURVEY.md` §7.4 "salting for
  * skew"): a two-phase aggregation that splits each hot key across
  * `saltBuckets` sub-keys, partially aggregates per (key, salt), then
  * merges per key. Identical results to a direct groupBy — the oracle
  * proves it — but at scale the first shuffle spreads a hot key over
  * `saltBuckets` reducers instead of melting one.
  *
  * The salt must be DETERMINISTIC for the oracle (and for retries/
  * speculative execution): derived from a stable row attribute, not
  * rand(). AQE's skew-join handling covers joins; salting remains the
  * tool for skewed AGGREGATION keys with expensive merge states.
  */
object Salting {

  /** Two-phase sum/count by `key` with a deterministic salt from
    * `saltSource` (any well-distributed numeric column, e.g. an id). */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
                     saltSource: Column, saltBuckets: Int): DataFrame =
    df.withColumn("_salt", pmod(saltSource, lit(saltBuckets.toLong)))
      .groupBy(key.as("k"), col("_salt"))
      .agg(sum(value).as("_psum"), count(lit(1)).as("_pn"))
      .groupBy(col("k"))
      .agg(sum(col("_psum")).as("sum_value"), sum(col("_pn")).as("n"))

  /** Salted shuffle equi-join for a skewed fact key: the fact side gets
    * a deterministic salt in [0, saltBuckets), the dimension side is
    * replicated once per salt value, and the join runs on
    * (key, salt) — a hot fact key's rows spread over `saltBuckets`
    * reducers instead of melting one. Results are identical to the
    * plain join (the oracle proves it).
    *
    * Trade-off vs AQE's skew-join splitting: AQE needs no dim
    * replication and is the first tool to reach for; manual salting
    * still wins when the skew is inside a single map task's output or
    * the engine must plan statically (streaming joins, AQE off). The
    * dim side is replicated ×saltBuckets, so keep saltBuckets modest
    * and the dim the smaller side. */
  def saltedEquiJoin(fact: DataFrame, dim: DataFrame, factKey: Column,
                     dimKey: Column, saltSource: Column,
                     saltBuckets: Int): DataFrame = {
    val f = fact.withColumn("_fsalt",
      pmod(saltSource, lit(saltBuckets.toLong)).cast("int"))
    val d = dim.withColumn("_dsalt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    f.join(d.hint("merge"),
        col("_fsalt") === col("_dsalt") && factKey === dimKey)
      .drop("_fsalt", "_dsalt")
  }
}
