package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.EventAnalytics
import graft.streaming.StreamingDrift

/** Incremental drift monitor: after N micro-batches the summed cell
  * deltas must yield EXACTLY the batch KS and Mann–Whitney rows over
  * the full input — cell counts are additive, the derivations share
  * the batch `…FromCells` cores, so parity is by construction and
  * this spec pins it. Plus the additive-state crash law: a partial
  * uncommitted delta must be INVISIBLE (sums, unlike the engagement
  * stream's distinct pairs, cannot tolerate partial batches), and a
  * restart overwrites it exactly-once. */
class StreamingDriftSpec extends SparkSpec {

  private def slurp(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("cells after 3 micro-batches == batch KS and Mann-Whitney, exactly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    // q192's input: purchase values split by hash variant
    val ev = graft.sources.Tables.load(spark, sf("sf0.001"), "events")
      .filter(col("event_type") === "purchase")
      .select(pmod(graft.functions.GraftFunctions.polyHash(
        col("user_id").cast("string")), lit(2)).as("g"), col("value"))
    val rows = ev.as[(Long, Double)].collect().sortBy(identity)
    assert(rows.length > 100)
    val thirds = rows.grouped((rows.length + 2) / 3).toSeq

    val base = java.nio.file.Files.createTempDirectory("graft_sdrift_").toString
    val input = MemoryStream[(Long, Double)]
    val q = StreamingDrift.start(
      input.toDS().toDF("g", "value"), groupCol = "g", valueCol = "value",
      dir = s"$base/cells", checkpoint = s"$base/ckpt",
      cfg = StreamingDrift.Config(scale = 100L))
    try {
      // mid-stream incrementality: after batch 0 the monitor equals
      // the batch tests over batch 0's rows alone
      input.addData(thirds.head.toSeq: _*)
      q.processAllAvailable()
      val firstDf = thirds.head.toSeq.toDF("g", "value")
      assert(slurp(StreamingDrift.ks(spark, s"$base/cells")) ===
        slurp(EventAnalytics.twoSampleKs(firstDf, col("g"), col("value"))))

      thirds.tail.foreach { part =>
        input.addData(part.toSeq: _*)
        q.processAllAvailable()
      }
      val allDf = rows.toSeq.toDF("g", "value")
      assert(slurp(StreamingDrift.ks(spark, s"$base/cells")) ===
        slurp(EventAnalytics.twoSampleKs(allDf, col("g"), col("value"))))
      assert(slurp(StreamingDrift.mannWhitneyU(spark, s"$base/cells")) ===
        slurp(EventAnalytics.mannWhitneyU(allDf, col("g"), col("value"))))
    } finally q.stop()
  }

  test("daily cells after 3 micro-batches == batch cusumChangepoint, exactly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val Epoch0 = 1704067200000000L
    val DayUs = 86400000000L
    val ev = graft.sources.Tables.load(spark, sf("sf0.001"), "events")
    val evUs = ev.filter(col("event_type") === "purchase")
      .select(graft.functions.GraftFunctions.epochMicros(
        ev.schema("ts").dataType, col("ts")).as("ts_us"), col("value"))
    val rows = evUs.as[(Long, Double)].collect().sortBy(identity)
    assert(rows.length > 100)
    val thirds = rows.grouped((rows.length + 2) / 3).toSeq

    val base = java.nio.file.Files.createTempDirectory("graft_sdrift_cp_").toString
    val cfg = StreamingDrift.DailyConfig(Epoch0, DayUs, 100L)
    val input = MemoryStream[(Long, Double)]
    val q = StreamingDrift.startDaily(
      input.toDS().toDF("ts_us", "value"), "ts_us", "value",
      s"$base/days", s"$base/ckpt", cfg)
    try {
      // mid-stream: the monitor's verdict equals the batch locator
      // over the prefix alone — and may legitimately MOVE later
      input.addData(thirds.head.toSeq: _*)
      q.processAllAvailable()
      assert(slurp(StreamingDrift.changepoint(spark, s"$base/days", cfg)) ===
        slurp(EventAnalytics.cusumChangepoint(
          thirds.head.toSeq.toDF("ts_us", "value"), "ts_us", "value",
          Epoch0, DayUs)))
      thirds.tail.foreach { p => input.addData(p.toSeq: _*); q.processAllAvailable() }
      assert(slurp(StreamingDrift.changepoint(spark, s"$base/days", cfg)) ===
        slurp(EventAnalytics.cusumChangepoint(
          rows.toSeq.toDF("ts_us", "value"), "ts_us", "value",
          Epoch0, DayUs)))
      // the SAME persisted day cells serve the rate-anomaly reader
      assert(slurp(StreamingDrift.rateAnomaly(spark, s"$base/days", cfg)) ===
        slurp(EventAnalytics.dailyRateAnomaly(
          rows.toSeq.toDF("ts_us", "value"), "ts_us", "value",
          Epoch0, DayUs, scale = 100L)))
    } finally q.stop()
  }

  test("categorical cells after 3 micro-batches == batch chi-square, exactly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val ev = graft.sources.Tables.load(spark, sf("sf0.001"), "events")
      .select(pmod(graft.functions.GraftFunctions.polyHash(
        col("user_id").cast("string")), lit(2)).as("g"), col("event_type"))
    val rows = ev.as[(Long, String)].collect().sortBy(identity)
    val thirds = rows.grouped((rows.length + 2) / 3).toSeq

    val base = java.nio.file.Files.createTempDirectory("graft_sdrift_chi_").toString
    val input = MemoryStream[(Long, String)]
    val q = StreamingDrift.startCategorical(
      input.toDS().toDF("g", "k"), "g", "k", s"$base/cats", s"$base/ckpt")
    try {
      thirds.foreach { p => input.addData(p.toSeq: _*); q.processAllAvailable() }
      assert(slurp(StreamingDrift.chiSquare(spark, s"$base/cats")) ===
        slurp(EventAnalytics.chiSquareIndependence(
          rows.toSeq.toDF("g", "k"), col("g"), col("k"))))
    } finally q.stop()
  }

  test("season cells after 3 micro-batches == batch seasonalityProfile, exactly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val ev = graft.sources.Tables.load(spark, sf("sf0.001"), "events")
    val evUs = ev.select(graft.functions.GraftFunctions.epochMicros(
      ev.schema("ts").dataType, col("ts")).as("ts_us"))
    val rows = evUs.as[Long].collect().sorted
    assert(rows.length > 100)
    val thirds = rows.grouped((rows.length + 2) / 3).toSeq

    val base = java.nio.file.Files.createTempDirectory("graft_sdrift_sea_").toString
    val input = MemoryStream[Long]
    val q = StreamingDrift.startSeasonality(
      input.toDS().toDF("ts_us"), "ts_us", s"$base/season", s"$base/ckpt")
    try {
      // mid-stream: residuals re-derive against batch-0 margins alone
      input.addData(thirds.head.toSeq: _*)
      q.processAllAvailable()
      assert(slurp(StreamingDrift.seasonality(spark, s"$base/season")) ===
        slurp(EventAnalytics.seasonalityProfile(
          thirds.head.toSeq.toDF("ts_us"), col("ts_us"))))

      thirds.tail.foreach { p => input.addData(p.toSeq: _*); q.processAllAvailable() }
      assert(slurp(StreamingDrift.seasonality(spark, s"$base/season")) ===
        slurp(EventAnalytics.seasonalityProfile(
          rows.toSeq.toDF("ts_us"), col("ts_us"))))
    } finally q.stop()
  }

  test("digit cells after 3 micro-batches == batch benfordDigits, exactly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val ev = graft.sources.Tables.load(spark, sf("sf0.001"), "events")
      .filter(col("value").isNotNull)
      .select(floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
    val rows = ev.as[Long].collect().sorted
    assert(rows.length > 100)
    val thirds = rows.grouped((rows.length + 2) / 3).toSeq

    val base = java.nio.file.Files.createTempDirectory("graft_sdrift_bf_").toString
    val input = MemoryStream[Long]
    val q = StreamingDrift.startBenford(
      input.toDS().toDF("c"), "c", s"$base/digits", s"$base/ckpt")
    try {
      thirds.foreach { p => input.addData(p.toSeq: _*); q.processAllAvailable() }
      assert(slurp(StreamingDrift.benford(spark, s"$base/digits")) ===
        slurp(EventAnalytics.benfordDigits(rows.toSeq.toDF("c"), col("c"))))
    } finally q.stop()
  }

  test("ALL monitors: a partial uncommitted delta is invisible; restart " +
      "overwrites it exactly-once (one law, the whole monitor list)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.{Column, DataFrame}
    import org.apache.spark.sql.streaming.StreamingQuery

    // the monitors share ONE delta discipline (StreamingDrift.monitor/
    // readCells), so the crash-window law is pinned UNIFORMLY: every
    // verdict reader must (a) ignore a poisoned, uncommitted batch-1
    // delta directory and (b) see it overwritten exactly-once on
    // restart. Each harness maps the common (g, value) feed onto its
    // monitor's input columns, poisons with a WRONG row in its own
    // cell schema, and names its batch oracle.
    val cfg = StreamingDrift.Config(scale = 100L)
    val dailyCfg = StreamingDrift.DailyConfig(0L, 86400000000L, 100L)
    // value → a fake epoch-µs spread across hours/days (3.7e9 µs ≈ 1h)
    def tsUs(c: Column): Column = (c * 3.7e9).cast("long")
    def toCat(df: DataFrame): DataFrame =
      df.select(col("g"), floor(col("value")).cast("long")
        .cast("string").as("k"))
    def toSeason(df: DataFrame): DataFrame =
      df.select(tsUs(col("value")).as("ts_us"))
    def toCents(df: DataFrame): DataFrame =
      df.select(floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
    def toDaily(df: DataFrame): DataFrame =
      df.select(tsUs(col("value")).as("ts_us"), col("value"))

    final case class H(
        name: String,
        start: (DataFrame, String, String) => StreamingQuery,
        poison: DataFrame,
        verdict: String => DataFrame,
        oracle: DataFrame => DataFrame)

    val harnesses = Seq(
      H("ks",
        (df, dir, ck) => StreamingDrift.start(df, "g", "value", dir, ck, cfg),
        Seq((100L, 7L, 7L)).toDF("_x", "_a0", "_a1"),
        dir => StreamingDrift.ks(spark, dir),
        df => EventAnalytics.twoSampleKs(df, col("g"), col("value"))),
      H("mannwhitney",
        (df, dir, ck) => StreamingDrift.start(df, "g", "value", dir, ck, cfg),
        Seq((100L, 7L, 7L)).toDF("_x", "_a0", "_a1"),
        dir => StreamingDrift.mannWhitneyU(spark, dir),
        df => EventAnalytics.mannWhitneyU(df, col("g"), col("value"))),
      H("chisquare",
        (df, dir, ck) =>
          StreamingDrift.startCategorical(toCat(df), "g", "k", dir, ck),
        Seq(("zz", 7L, 7L)).toDF("_k", "_o0", "_o1"),
        dir => StreamingDrift.chiSquare(spark, dir),
        df => EventAnalytics.chiSquareIndependence(
          toCat(df), col("g"), col("k"))),
      H("seasonality",
        (df, dir, ck) =>
          StreamingDrift.startSeasonality(toSeason(df), "ts_us", dir, ck),
        Seq((3L, 3L, 7L)).toDF("_dw", "_hr", "_n"),
        dir => StreamingDrift.seasonality(spark, dir),
        df => EventAnalytics.seasonalityProfile(toSeason(df), col("ts_us"))),
      H("benford",
        (df, dir, ck) => StreamingDrift.startBenford(toCents(df), "c", dir, ck),
        Seq((9L, 7L)).toDF("_d", "_o"),
        dir => StreamingDrift.benford(spark, dir),
        df => EventAnalytics.benfordDigits(toCents(df), col("c"))),
      H("changepoint",
        (df, dir, ck) => StreamingDrift.startDaily(toDaily(df), "ts_us",
          "value", dir, ck, dailyCfg),
        Seq((5L, 7L, 7L)).toDF("_d", "_c", "_s"),
        dir => StreamingDrift.changepoint(spark, dir, dailyCfg),
        df => EventAnalytics.cusumChangepoint(toDaily(df), "ts_us", "value",
          dailyCfg.epoch0Us, dailyCfg.dayUs, dailyCfg.scale)),
      H("rate_anomaly",
        (df, dir, ck) => StreamingDrift.startDaily(toDaily(df), "ts_us",
          "value", dir, ck, dailyCfg),
        Seq((5L, 7L, 7L)).toDF("_d", "_c", "_s"),
        dir => StreamingDrift.rateAnomaly(spark, dir, dailyCfg),
        df => EventAnalytics.dailyRateAnomaly(toDaily(df), "ts_us", "value",
          dailyCfg.epoch0Us, dailyCfg.dayUs, dailyCfg.scale)))

    // values spread across digits, days, and hours so every monitor's
    // cell table is non-degenerate
    val b0 = Seq((0L, 1.0), (0L, 2.0), (1L, 2.0), (1L, 3.0),
      (0L, 13.0), (1L, 123.0), (0L, 47.0))
    val b1 = Seq((0L, 3.0), (1L, 1.0), (1L, 21.0))

    harnesses.foreach { h =>
      val base = java.nio.file.Files
        .createTempDirectory(s"graft_sdrift_crash_${h.name}_").toString
      val dir = s"$base/cells"
      val input = MemoryStream[(Long, Double)]
      def startStream() =
        h.start(input.toDS().toDF("g", "value"), dir, s"$base/ckpt")

      val q1 = startStream()
      try { input.addData(b0: _*); q1.processAllAvailable() } finally q1.stop()

      // crash window: a batch-1 attempt wrote PART of its delta (a
      // wrong, partial cell table) and died before its marker — an
      // additive reader summing it would be silently wrong forever
      h.poison.write.mode("overwrite").parquet(s"$dir/ingest_batch=1")
      assert(slurp(h.verdict(dir)) === slurp(h.oracle(b0.toDF("g", "value"))),
        s"${h.name}: uncommitted partial delta leaked into the additive sum")

      // restart from the same checkpoint: batch 1 re-runs, OVERWRITES
      // the poisoned directory with the true delta, and commits
      val q2 = startStream()
      try { input.addData(b1: _*); q2.processAllAvailable() } finally q2.stop()
      assert(slurp(h.verdict(dir)) ===
        slurp(h.oracle((b0 ++ b1).toDF("g", "value"))),
        s"${h.name}: restart must overwrite the poisoned delta exactly-once")
    }
  }
}
