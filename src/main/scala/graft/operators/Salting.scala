package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
                     saltSource: Column, saltBuckets: Int): DataFrame = {
    require(saltBuckets >= 1, s"saltBuckets must be >= 1: $saltBuckets")
    df.withColumn("_salt", pmod(saltSource, lit(saltBuckets.toLong)))
      .groupBy(key.as("k"), col("_salt"))
      .agg(sum(value).as("_psum"), count(lit(1)).as("_pn"))
      .groupBy(col("k"))
      .agg(sum(col("_psum")).as("sum_value"), sum(col("_pn")).as("n"))
  }

  /** Salted shuffle equi-join for a skewed fact key: hot fact rows get
    * a deterministic salt in [0, saltBuckets), the dimension rows for
    * those hot keys are replicated once per salt value, and the join
    * runs on (key, salt) — a hot key's rows spread over `saltBuckets`
    * reducers instead of melting one. Results are identical to the
    * plain join (the oracle proves it).
    *
    * `hotKeys` TARGETS the salt: only the named keys are salted and
    * replicated (the production shape — hot keys are known from AQE
    * stats or a pre-count, and replicating the whole dim ×saltBuckets
    * would cost more than the skew). Empty `hotKeys` salts every key:
    * the blunt fallback when the hot set is unknown, priced at a full
    * ×saltBuckets dim blow-up.
    *
    * Trade-off vs AQE's skew-join splitting: AQE needs no replication
    * and is the first tool to reach for; manual salting is the static-
    * plan insurance when AQE can't help (streaming joins, skew inside
    * a single map task's output, engines planning without runtime
    * stats). */
  def saltedEquiJoin(fact: DataFrame, dim: DataFrame, factKey: Column,
                     dimKey: Column, saltSource: Column,
                     saltBuckets: Int, hotKeys: Seq[Long] = Nil): DataFrame = {
    require(saltBuckets >= 1, s"saltBuckets must be >= 1: $saltBuckets")
    // NULL salt sources fall into bucket 0 — a null salt would null the
    // join condition and silently DROP fact rows the plain join keeps
    val salt = pmod(coalesce(saltSource, lit(0L)), lit(saltBuckets.toLong)).cast("int")
    val allSalts = sequence(lit(0), lit(saltBuckets - 1))
    val (fSalt, dSalts) =
      if (hotKeys.isEmpty) (salt, allSalts)
      else (
        when(factKey.isin(hotKeys: _*), salt).otherwise(lit(0)),
        when(dimKey.isin(hotKeys: _*), allSalts).otherwise(array(lit(0))))
    val f = fact.withColumn("_fsalt", fSalt)
    val d = dim.withColumn("_dsalt", explode(dSalts))
    f.join(d.hint("merge"),
        col("_fsalt") === col("_dsalt") && factKey === dimKey)
      .drop("_fsalt", "_dsalt")
  }
}
