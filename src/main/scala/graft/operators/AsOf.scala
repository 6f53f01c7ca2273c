package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (point-in-time) join — an operator Spark SQL lacks natively,
  * composed from built-ins per the preference order (compose > custom
  * plan): enrich each left row with the most recent right-side value at
  * or before its timestamp, per key.
  *
  * Plan shape: tag both sides, UNION, one hash partition on the key,
  * one sort by (ts, side, tie), then `last(marker, ignoreNulls)` over
  * the unbounded-preceding frame; left rows are then filtered back out.
  * That is ONE shuffle + ONE sort regardless of the right side's size —
  * the classic scalable as-of plan (vs a range join, which explodes, or
  * a per-row subquery, which is quadratic). Right rows at an equal
  * timestamp sort BEFORE left rows, so "at or before" includes ties.
  *
  * The carried marker is a one-field STRUCT wrapping the value, not the
  * value itself: a right row whose value is genuinely NULL still wins
  * as "the most recent observation" (its struct is non-null), instead
  * of being skipped in favor of an older non-null value. Internal
  * column names are uniquified against both inputs, so left frames that
  * already have `_side`/`_ts`-style columns can't silently collide. */
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
    // the OUTPUT name is part of the contract, not an internal — a left
    // frame that already carries asof_<valueCol> (e.g. a previous
    // enrichment being re-joined) must fail loudly, not have its data
    // silently replaced by withColumn
    require(!lCols.contains(s"asof_$valueCol"),
      s"AsOf.join: left already has a column 'asof_$valueCol' — the " +
        "output would silently overwrite it; rename it first")

    // internal names, uniquified against every user column on either side
    val taken = (left.columns ++ right.columns).toSet
    def fresh(base: String): String =
      if (!taken.contains(base)) base
      else Iterator.from(0).map(i => s"$base$i").filterNot(taken).next()
    val sideC = fresh("_side")
    val tsC = fresh("_ts")
    val rvC = fresh("_rv")

    val markerType = new StructType().add("v", right.schema(valueCol).dataType)
    val unioned = left
      .withColumn(sideC, lit(1))
      .withColumn(rvC, lit(null).cast(markerType))
      .select((keys.map(col) ++ Seq(col(ts).as(tsC), col(sideC), col(rvC))
        ++ tieBreak.map(col) ++ lCols.filterNot(c => keys.contains(c) || c == ts || tieBreak.contains(c)).map(col)): _*)
      .unionByName(
        right
          .withColumn(sideC, lit(0))
          .withColumn(rvC, struct(col(valueCol).as("v")))
          .select((keys.map(col) ++ Seq(col(ts).as(tsC), col(sideC), col(rvC))
            ++ tieBreak.map(col)): _*),
        allowMissingColumns = true)

    val order = Seq(col(tsC), col(sideC)) ++ tieBreak.map(col)
    val w = Window.partitionBy(keyCols: _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned
      .withColumn(s"asof_$valueCol",
        last(col(rvC), ignoreNulls = true).over(w).getField("v"))
      .filter(col(sideC) === 1)
      .drop(sideC, rvC)
      .withColumnRenamed(tsC, ts)
  }
}
