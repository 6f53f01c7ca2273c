package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's per-window statistical feature extraction
  * (`SURVEY.md` §2 D2-D7), fused into ONE distributed group-by.
  *
  * The reference computes each feature as a separate MLlib
  * `Statistics.colStats` job per (user, activity, window) slice inside
  * nested driver loops (`job/RecognizeActivity.java:80-119` — ≥8 Spark
  * jobs per window). Here the whole 11-feature vector is a single
  * `groupBy(keys).agg(...)` preceded by two window passes that share
  * the same hash partitioning, so the physical plan is: one Exchange on
  * the group keys → sort → two Window operators → partial+final
  * HashAggregate. Map-side partial aggregation and whole-stage codegen
  * apply throughout; nothing touches the driver.
  *
  * Feature semantics, matched to the reference:
  *  - mean_x/y/z              `ExtractFeature.java:33-41` (colStats mean)
  *  - var_x/y/z               `:46-48` — MLlib variance is the UNBIASED
  *                            (n-1) sample variance → `var_samp`; a
  *                            1-row group yields NaN in Spark / NULL in
  *                            DuckDB, normalized to 0.0.
  *  - avg_abs_diff_x/y/z      `:53-65` — mean(|v - mean_v|): the group
  *                            mean is attached via an unordered window
  *                            (same partitioning, no extra shuffle),
  *                            then aggregated in the main groupBy.
  *  - res(ultant)             `:70-82` — mean(sqrt(x²+y²+z²)).
  *  - peak_avg_interval       `:87-116` — peaks are rows with
  *                            y > 0.9·max(y) over the group (`:93`);
  *                            feature = mean of positive gaps between
  *                            successive peak timestamps, 0.0 when < 2
  *                            peaks (`:97,115`). Zero/negative gaps
  *                            (duplicate timestamps) are dropped
  *                            (`:108`). Computed with a running
  *                            `max(peak_ts)` over the ordered window —
  *                            equivalent to lag-over-peaks but a single
  *                            window pass, no self-join.
  */
object Features {

  case class Axes(x: Column, y: Column, z: Column)

  /** Adds the feature-support columns, then aggregates to one row per
    * key with the 11 reference features (+ n_samples).
    *
    * `df` must already carry the grouping-key columns (e.g. the output
    * of `Sessionize.withWindows`: user, activity, session_id,
    * window_id). `keyNames` are column names so the result keeps them. */
  def aggregate(df: DataFrame, keyNames: Seq[String], ts: Column,
                axes: Axes, portableVariance: Boolean = false,
                tieBreak: Seq[Column] = Nil): DataFrame = {
    val keys = keyNames.map(col)
    val byKey = Window.partitionBy(keys: _*)
    // tieBreak makes the peak-interval scan deterministic when
    // timestamps collide (equal-ts rows otherwise order arbitrarily,
    // flipping which peak counts as "previous")
    val ordered = byKey.orderBy(ts +: tieBreak: _*)

    // group means via unordered window over the SAME partitioning the
    // groupBy below shuffles on — Catalyst reuses one Exchange.
    val withSupport = df
      .withColumn("_mx", avg(axes.x).over(byKey))
      .withColumn("_my", avg(axes.y).over(byKey))
      .withColumn("_mz", avg(axes.z).over(byKey))
      .withColumn("_max_y", max(axes.y).over(byKey))
      .withColumn("_peak_ts", when(axes.y > lit(0.9) * col("_max_y"), ts))
      // most recent preceding peak timestamp (ts ascending → max works
      // as "last non-null", and is portable SQL)
      .withColumn("_prev_peak",
        max(col("_peak_ts")).over(ordered.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("_peak_gap",
        when(col("_peak_ts").isNotNull && (col("_peak_ts") - col("_prev_peak")) > 0,
          col("_peak_ts") - col("_prev_peak")))

    // MLlib-parity unbiased variance. `var_samp` (single-pass central
    // moments) is the numerically stable default; the portable form is
    // the explicit (Σx² − (Σx)²/n)/(n−1), whose op sequence a SQL
    // oracle can reproduce bit-for-bit across engines.
    // guard + denominators on the per-axis NON-NULL count: a group
    // row count would pass the n>1 gate on (null, 5.0) while var_samp
    // sees one value (NaN out) and the portable sums skip nulls
    // against a too-large n (silently wrong variance) — the
    // normalize-to-0.0 contract is over actual observations
    def varOrZero(c: Column): Column = {
      val nn = count(c)
      if (portableVariance)
        when(nn > 1, (sum(c * c) - sum(c) * sum(c) / nn) / (nn - 1)).otherwise(0.0)
      else when(nn > 1, var_samp(c)).otherwise(0.0)
    }

    withSupport.groupBy(keys: _*).agg(
      count(lit(1)).as("n_samples"),
      avg(axes.x).as("mean_x"),
      avg(axes.y).as("mean_y"),
      avg(axes.z).as("mean_z"),
      varOrZero(axes.x).as("var_x"),
      varOrZero(axes.y).as("var_y"),
      varOrZero(axes.z).as("var_z"),
      avg(abs(axes.x - col("_mx"))).as("avg_abs_diff_x"),
      avg(abs(axes.y - col("_my"))).as("avg_abs_diff_y"),
      avg(abs(axes.z - col("_mz"))).as("avg_abs_diff_z"),
      avg(sqrt(pow(axes.x, 2) + pow(axes.y, 2) + pow(axes.z, 2))).as("res"),
      coalesce(avg(col("_peak_gap")), lit(0.0)).as("peak_avg_interval"))
  }

  /** End-to-end flagship pipeline: sessionize → window → 11-feature
    * aggregation, keyed by (user, activity, session, window). The
    * single-DataFrame replacement for `RecognizeActivity.main`'s nested
    * loops (§3.1). */
  def pipeline(df: DataFrame, user: String, activity: String, tsName: String,
               axes: Axes, gap: Long, width: Long,
               tieBreak: Seq[Column] = Nil,
               portableVariance: Boolean = false): DataFrame = {
    val windowed = Sessionize.withWindows(
      df, Seq(col(user), col(activity)), col(tsName), gap, width, tieBreak)
    aggregate(windowed,
      Seq(user, activity, "session_id", "window_id"), col(tsName), axes,
      portableVariance, tieBreak)
  }

  /** Per-group WINSORIZATION — the robust feature-scaling step every
    * ML-prep pipeline runs before a model sees a heavy-tailed column
    * (a fat-fingered 10⁹ event value would otherwise own the
    * gradient): per group, values clamp into the group's own
    * [p_lo, p_hi] exact interpolated percentiles (Spark `percentile`
    * ≡ DuckDB `quantile_cont`, the q27-proven portable pair). Unlike
    * the MAD gate ([[graft.Queries]] q93's median→MAD→flag chain)
    * this REPAIRS rather than flags — the two are the complementary
    * outlier responses.
    *
    * Shape at 100 TB: one group-bounded percentile aggregation (the
    * per-group exact sort lives inside the agg buffer — the q174
    * caveat; q151's mergeable sketch is the billion-row-per-group
    * path), bounds BROADCAST back onto the rows (null-safe join, so
    * a NULL group is its own stratum rather than silently dropping
    * rows), and the clamp is a pure projection. NULL values pass
    * through NULL (nothing to repair; percentiles ignored them).
    *
    * Returns the input plus (_lo, _hi, value_w). */
  def withWinsorized(df: DataFrame, group: Column, value: Column,
                     pLo: Double = 0.01, pHi: Double = 0.99): DataFrame = {
    require(pLo >= 0.0 && pLo < pHi && pHi <= 1.0,
      s"need 0 <= pLo < pHi <= 1: $pLo/$pHi")
    val d0 = df.withColumn("_wv", value.cast("double"))
    val bounds = d0.groupBy(group.as("_wg"))
      .agg(expr(s"percentile(_wv, $pLo)").as("_lo"),
        expr(s"percentile(_wv, $pHi)").as("_hi"))
    d0.join(broadcast(bounds), group <=> col("_wg"), "left")
      .withColumn("value_w",
        when(col("_wv") < col("_lo"), col("_lo"))
          .when(col("_wv") > col("_hi"), col("_hi"))
          .otherwise(col("_wv")))
      .drop("_wg", "_wv")
  }
}
