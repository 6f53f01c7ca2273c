package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.longDiv

/** Gap-detection sessionization + fixed-width windowing, the reference's
  * core "query" (`SURVEY.md` §2 E1-E4), re-expressed as window functions.
  *
  * The reference finds session boundaries by zipping a sorted,
  * single-partition RDD with itself shifted by one
  * (`data/PrepareData.java:17-25` `boudariesDiff`), filtering deltas
  * above a jump threshold (`:27-31` `defineJump`), then *collecting*
  * the boundaries to the driver and assembling `[start, end, n_windows]`
  * triples in a Java loop (`:34-56` `defineInterval`,
  * `job/RecognizeActivity.java:150-165`). That design forces 1-partition
  * sorts (`PrepareData.java:36`) and O(sessions) driver memory.
  *
  * Here each step is a distributed expression over a partitioned,
  * ordered window — no collect, no single-partition constraint:
  *
  *   delta      = ts - lag(ts)                 (E1; replaces the zip idiom C1)
  *   is_jump    = delta > gap                  (E2)
  *   session_id = running sum of is_jump       (E3; classic sessionization)
  *   window_id  = (ts - session_start) div w   (E4; floor division, exactly
  *                the reference's Math.round(long/long) = integer floor-div
  *                semantics, `PrepareData.java:44-52`)
  *
  * Scale: one shuffle on `keys` (hash partition), one sort per partition;
  * every window spec below shares that same partitioning so Catalyst
  * plans a single Exchange. Timestamps stay `long` throughout — integer
  * arithmetic is exact where double math would lose precision above 2^53.
  * High-cardinality keys (user × activity) keep partitions balanced at
  * 100 TB; there is no per-key driver loop (`RecognizeActivity.java:56-57`)
  * to serialize execution.
  */
object Sessionize {

  /** Per-key ordered window; `tieBreak` makes the order total (and hence
    * lag/cumsum deterministic) when timestamps can collide. */
  private def ordered(keys: Seq[Column], orderCols: Seq[Column]) =
    Window.partitionBy(keys: _*).orderBy(orderCols: _*)

  /** E1: successive-difference. Adds `delta` = ts - previous ts per key
    * (null for the first row of each key). */
  def withDelta(df: DataFrame, keys: Seq[Column], ts: Column,
                tieBreak: Seq[Column] = Nil): DataFrame =
    df.withColumn("delta", ts - lag(ts, 1).over(ordered(keys, ts +: tieBreak)))

  /** E2+E3: gap detection and session assignment. Adds `is_jump` and
    * `session_id` (0-based per key). A row opens a new session when its
    * gap to the previous row exceeds `gap`; the first row of a key has
    * null delta → not a jump → session 0. */
  def withSessions(df: DataFrame, keys: Seq[Column], ts: Column, gap: Long,
                   tieBreak: Seq[Column] = Nil): DataFrame = {
    // same loud-degenerate-input law as withWindows' width guard: a
    // non-positive gap (a seconds-vs-microseconds unit slip, say)
    // fragments every key into per-row sessions — plausible-looking,
    // meaningless output with no error anywhere downstream
    require(gap > 0, s"session gap must be positive: $gap")
    val w = ordered(keys, ts +: tieBreak)
    withDelta(df, keys, ts, tieBreak)
      .withColumn("is_jump", when(col("delta") > gap, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("is_jump")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** E4: fixed-width windows inside each session. Adds `session_start`
    * (min ts of the session) and `window_id` = (ts - session_start) div
    * width — integer floor division, reproducing the reference's
    * `Math.round(long/long)` truncation (`PrepareData.java:44`). */
  def withWindows(df: DataFrame, keys: Seq[Column], ts: Column, gap: Long,
                  width: Long, tieBreak: Seq[Column] = Nil): DataFrame = {
    require(width > 0, s"window width must be positive: $width " +
      "(div by zero silently NULLs every window_id under non-ANSI)")
    val sessioned = withSessions(df, keys, ts, gap, tieBreak)
    val perSession = Window.partitionBy((keys :+ col("session_id")): _*)
    sessioned
      .withColumn("session_start", min(ts).over(perSession))
      .withColumn("window_id", longDiv(ts - col("session_start"), width))
  }

  /** E3 rollup: one row per session — [start, end, n_rows, n_windows],
    * the distributed equivalent of the reference's driver-side interval
    * list (`PrepareData.java:34-56`). `n_windows` uses the same floor-div
    * width count. */
  def sessionBounds(df: DataFrame, keys: Seq[Column], ts: Column, gap: Long,
                    width: Long, tieBreak: Seq[Column] = Nil): DataFrame = {
    // the same guard withWindows carries — without it the n_windows
    // floor-div throws DIVIDE_BY_ZERO mid-job under ANSI (or silently
    // NULLs under non-ANSI) instead of failing at the API boundary
    require(width > 0, s"window width must be positive: $width " +
      "(div by zero silently NULLs every n_windows under non-ANSI)")
    withSessions(df, keys, ts, gap, tieBreak)
      .groupBy((keys :+ col("session_id")): _*)
      .agg(
        min(ts).as("session_start"),
        max(ts).as("session_end"),
        count(lit(1)).as("n_rows"),
        longDiv(max(ts) - min(ts), width).as("n_windows"))
  }
}
