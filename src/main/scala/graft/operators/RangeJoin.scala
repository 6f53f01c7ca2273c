package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range join — the scale path for point-in-interval joins,
  * an operator Spark SQL lacks (`SURVEY.md` §4.3): a plain
  * `p >= lo AND p < hi` join has no equality conjunct, so Catalyst
  * plans a nested-loop join — O(points × intervals) compared rows, the
  * classic 100 TB cliff.
  *
  * The rewrite maps both sides onto fixed-width bins: an interval
  * [lo, hi) is exploded to one row per bin it overlaps
  * (floor(lo/w) .. floor(hi/w)), a point p lands in bin floor(p/w),
  * and the join becomes an EQUALITY join on the bin id plus the exact
  * residual filter. A qualifying (point, interval) pair meets in
  * exactly one bin — the point's own — so no dedup pass is needed.
  *
  * Scale properties: the interval side replicates by
  * ceil(width/binWidth)+1 (bounded, chosen by `binWidth`); the join is
  * hash-partitioned on the bin id (broadcastable when the interval
  * side is small, AQE decides); comparisons drop from points×intervals
  * to points×(intervals per bin). Pick `binWidth` near the median
  * interval width: wider bins → fewer interval replicas but more
  * residual-filter misses, narrower → the reverse.
  */
object RangeJoin {

  /** Join `points` to the `intervals` whose [lo, hi) contains `p`.
    * Returns all columns of both sides. `lo`/`hi`/`p` are doubles;
    * intervals must satisfy lo <= hi (empty intervals match nothing).
    */
  def pointInInterval(points: DataFrame, p: Column,
                      intervals: DataFrame, lo: Column, hi: Column,
                      binWidth: Double): DataFrame = {
    require(binWidth > 0.0, s"binWidth must be positive: $binWidth")
    val binned = intervals
      .withColumn("_lo", lo).withColumn("_hi", hi)
      .filter(col("_lo") <= col("_hi"))
      .withColumn("_bin", explode(sequence(
        floor(col("_lo") / binWidth).cast("long"),
        floor(col("_hi") / binWidth).cast("long"))))
    points
      .withColumn("_p", p)
      .withColumn("_bin", floor(col("_p") / binWidth).cast("long"))
      .join(binned, Seq("_bin"))
      .filter(col("_p") >= col("_lo") && col("_p") < col("_hi"))
      .drop("_bin", "_p", "_lo", "_hi")
  }
}
