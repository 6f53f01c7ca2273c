package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark SQL lacks natively,
  * composed from built-ins per the preference order (compose > custom
  * plan): enrich each left row with the most recent right-side value at
  * or before its timestamp, per key.
  *
  * Plan shape: tag both sides, UNION, one hash partition on the key,
  * one sort by (ts, side, tie), then `last(value, ignoreNulls)` over
  * the unbounded-preceding frame; left rows are then filtered back out.
  * That is ONE shuffle + ONE sort regardless of the right side's size —
  * the classic scalable as-of plan (vs a range join, which explodes, or
  * a per-row subquery, which is quadratic). Right rows at an equal
  * timestamp sort BEFORE left rows, so "at or before" includes ties.
  */
object AsOf {

  /** @param left      rows to enrich
    * @param right     timeline providing the value
    * @param keys      equality keys present on both sides
    * @param ts        timestamp column name (both sides, long)
    * @param valueCol  right-side column to carry (as `asof_<valueCol>`)
    * @param tieBreak  extra ordering column for full determinism */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String], ts: String,
           valueCol: String, tieBreak: Seq[String] = Nil): DataFrame = {
    val keyCols = keys.map(col)
    val lCols = left.columns
    val unioned = left
      .withColumn("_side", lit(1))
      .withColumn("_rv", lit(null).cast(right.schema(valueCol).dataType))
      .select((keys.map(col) ++ Seq(col(ts).as("_ts"), col("_side"), col("_rv"))
        ++ tieBreak.map(col) ++ lCols.filterNot(c => keys.contains(c) || c == ts || tieBreak.contains(c)).map(col)): _*)
      .unionByName(
        right
          .withColumn("_side", lit(0))
          .withColumn("_rv", col(valueCol))
          .select((keys.map(col) ++ Seq(col(ts).as("_ts"), col("_side"), col("_rv"))
            ++ tieBreak.map(col)): _*),
        allowMissingColumns = true)

    val order = Seq(col("_ts"), col("_side")) ++ tieBreak.map(col)
    val w = Window.partitionBy(keyCols: _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned
      .withColumn(s"asof_$valueCol", last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_side", "_rv")
      .withColumnRenamed("_ts", ts)
  }
}
