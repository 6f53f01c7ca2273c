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

  /** Internal working columns are namespaced AND guarded — silently
    * overwriting (then dropping) a caller column of the same name
    * would corrupt the documented all-columns-of-both-sides output. */
  private def guardReserved(cols: Seq[String], reserved: Seq[String],
                            op: String): Unit =
    cols.intersect(reserved).foreach(c =>
      throw new IllegalArgumentException(
        s"$op: input column '$c' collides with an internal working " +
          "column — rename it before the join"))

  /** Explode `df` to one row per bin its [lo, hi] interval overlaps;
    * `strict` drops empty half-open intervals (lo >= hi). */
  /** Per-interval replication cap: an interval spanning more bins than
    * this fails LOUDLY (named error, actionable fix) instead of dying
    * deep in a task on sequence()'s array limit — or silently
    * monopolizing the job — when one corrupt interval spans 10⁹ bins.
    * The guardBlocks policy of the dedup family, applied here. */
  val MaxBinsPerInterval: Long = 1000000L

  private def binRange(df: DataFrame, lo: Column, hi: Column,
                       loName: String, hiName: String, strict: Boolean,
                       binWidth: Double): DataFrame = {
    val b0 = floor(col(loName) / binWidth).cast("long")
    val b1 = floor(col(hiName) / binWidth).cast("long")
    df
      .withColumn(loName, lo).withColumn(hiName, hi)
      .filter(if (strict) col(loName) < col(hiName) else col(loName) <= col(hiName))
      // span checked in DOUBLE math, BEFORE any long cast/subtraction:
      // an extreme corrupt bound (±6e18) overflows b1 - b0, which under
      // ANSI throws an opaque ARITHMETIC_OVERFLOW pre-empting this
      // guard's named error, and under non-ANSI WRAPS NEGATIVE — the
      // wrapped guard passes and sequence() dies deep in a task, the
      // exact failure this guard exists to name (same double-side
      // pre-check law as dyadicEwma's overflow envelope)
      .filter(coalesce(assert_true(
        (col(hiName) - col(loName)) / binWidth < MaxBinsPerInterval.toDouble,
        concat(
        lit(s"RangeJoin: an interval spans >= $MaxBinsPerInterval bins ([" ),
        col(loName), lit(", "), col(hiName),
        lit(s"] at binWidth=$binWidth) — corrupt bound or binWidth far " +
          "too small; widen the bins or pre-filter the interval"))),
        lit(true)))
      .withColumn("__rj_bin", explode(sequence(b0, b1)))
  }

  /** Join `points` to the `intervals` whose [lo, hi) contains `p`.
    * Returns all columns of both sides. `lo`/`hi`/`p` are doubles;
    * intervals must satisfy lo <= hi (empty intervals match nothing).
    */
  def pointInInterval(points: DataFrame, p: Column,
                      intervals: DataFrame, lo: Column, hi: Column,
                      binWidth: Double): DataFrame = {
    require(binWidth > 0.0, s"binWidth must be positive: $binWidth")
    guardReserved(points.columns.toSeq ++ intervals.columns,
      Seq("__rj_bin", "__rj_p", "__rj_lo", "__rj_hi"), "pointInInterval")
    points
      .withColumn("__rj_p", p)
      .withColumn("__rj_bin", floor(col("__rj_p") / binWidth).cast("long"))
      .join(binRange(intervals, lo, hi, "__rj_lo", "__rj_hi",
        strict = false, binWidth), Seq("__rj_bin"))
      .filter(col("__rj_p") >= col("__rj_lo") && col("__rj_p") < col("__rj_hi"))
      .drop("__rj_bin", "__rj_p", "__rj_lo", "__rj_hi")
  }

  /** Interval × interval overlap join: pairs whose half-open intervals
    * [lLo, lHi) and [rLo, rHi) intersect (`lLo < rHi AND rLo < lHi` —
    * again no equality conjunct, again a nested-loop plan naively).
    * Both sides bin-explode; an overlapping pair meets in every shared
    * bin, so instead of a dedup shuffle the join keeps only the FIRST
    * overlapping bin — `bin == floor(max(lLo, rLo) / w)`, which both
    * sides provably cover — making each qualifying pair appear exactly
    * once. Empty intervals (lo >= hi) match nothing. */
  def intervalOverlap(left: DataFrame, lLo: Column, lHi: Column,
                      right: DataFrame, rLo: Column, rHi: Column,
                      binWidth: Double): DataFrame = {
    require(binWidth > 0.0, s"binWidth must be positive: $binWidth")
    guardReserved(left.columns.toSeq ++ right.columns,
      Seq("__rj_bin", "__rj_llo", "__rj_lhi", "__rj_rlo", "__rj_rhi"),
      "intervalOverlap")
    binRange(left, lLo, lHi, "__rj_llo", "__rj_lhi", strict = true, binWidth)
      .join(binRange(right, rLo, rHi, "__rj_rlo", "__rj_rhi",
        strict = true, binWidth), Seq("__rj_bin"))
      .filter(col("__rj_llo") < col("__rj_rhi")
        && col("__rj_rlo") < col("__rj_lhi")
        && col("__rj_bin") === floor(
          greatest(col("__rj_llo"), col("__rj_rlo")) / binWidth).cast("long"))
      .drop("__rj_bin", "__rj_llo", "__rj_lhi", "__rj_rlo", "__rj_rhi")
  }
}
