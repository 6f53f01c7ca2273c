package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.EventAnalytics

/** Incremental distribution-drift monitor — the streaming twin of the
  * [[EventAnalytics.twoSampleKs]] / [[EventAnalytics.mannWhitneyU]]
  * pair. Both batch tests reduce the corpus to the per-tick cell table
  * `(_x, _a0, _a1)` before any statistics, and cell COUNTS are purely
  * additive — so that table is the sufficient state: each micro-batch
  * persists its own cell DELTA, and the readers sum committed deltas
  * and derive KS / U through the SAME `…FromCells` cores the batch
  * operators use. Parity is by construction (Σ per-batch cells ≡ the
  * one-shot cells over the union corpus), and the spec pins it anyway.
  *
  * At-least-once replay: additive counts are NOT idempotent under
  * re-append, so each batch's delta lands in its OWN
  * `ingest_batch=<id>` directory with `SaveMode.Overwrite` (a replay
  * REWRITES the identical delta, never doubles it), the commit marker
  * publishes LAST, and readers sum only committed batches — the
  * [[StreamProtocol]] snapshot discipline with per-batch directories
  * instead of a chain. Run-identity + config-fingerprint guards as in
  * every other persistent-state stream (`scale` shapes the grid and
  * is pinned; resuming with a different scale would mix incompatible
  * tick bases).
  *
  * Scale: per-batch work is one map-side-combining aggregation of the
  * batch to its bounded delta (ticks touched by THIS batch); state
  * grows with batches × touched ticks, readers aggregate it back to
  * one bounded cell table — the corpus is never re-read. */
object StreamingDrift {

  final case class Config(scale: Long)

  private def fingerprint(cfg: Config): String = s"scale=${cfg.scale}"

  /** Persisted delta schema (+ the `ingest_batch` partition column at
    * read time) — fixed so empty and first reads are typed. */
  val CellsSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("_x",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("_a0",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("_a1",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ingest_batch",
        org.apache.spark.sql.types.LongType)))

  private def emptyCells(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], CellsSchema)
      .select(col("_x"), col("_a0"), col("_a1"))

  /** The accumulated cell table — committed deltas summed. The
    * `isin(committed)` filter (not `<= max`) is load-bearing here:
    * a batch that wrote files but crashed before its marker must not
    * leak PARTIAL counts into an additive sum (the engagement stream
    * tolerates that with `distinct()`; sums cannot). */
  def cells(spark: SparkSession, dir: String): DataFrame = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val committed = StreamProtocol.committedIds(fs, p, "_batch_")
    if (committed.isEmpty) emptyCells(spark)
    else
      spark.read.schema(CellsSchema).option("basePath", dir).parquet(
          committed.map(b => s"$dir/ingest_batch=$b"): _*)
        .groupBy(col("_x"))
        .agg(sum(col("_a0")).as("_a0"), sum(col("_a1")).as("_a1"))
  }

  /** Running KS verdict — identical output to
    * [[EventAnalytics.twoSampleKs]] over all rows ingested so far
    * (shared core). */
  def ks(spark: SparkSession, dir: String): DataFrame =
    EventAnalytics.ksFromCells(cells(spark, dir))

  /** Running Mann–Whitney U — identical output to
    * [[EventAnalytics.mannWhitneyU]] over all rows ingested so far. */
  def mannWhitneyU(spark: SparkSession, dir: String): DataFrame =
    EventAnalytics.mannWhitneyUFromCells(cells(spark, dir))

  // ------------------------------------------------------------------
  // the CATEGORICAL twin: incremental χ² independence
  // ------------------------------------------------------------------

  val CatCellsSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("_k",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_o0",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("_o1",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ingest_batch",
        org.apache.spark.sql.types.LongType)))

  /** Accumulated per-category count table — same committed-delta sum
    * discipline as [[cells]]. Categories persist as STRING (injective
    * for the engine's string/long categories, same convention as the
    * engagement stream's key). */
  def catCells(spark: SparkSession, dir: String): DataFrame = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val committed = StreamProtocol.committedIds(fs, p, "_batch_")
    if (committed.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], CatCellsSchema)
        .select(col("_k"), col("_o0"), col("_o1"))
    else
      spark.read.schema(CatCellsSchema).option("basePath", dir).parquet(
          committed.map(b => s"$dir/ingest_batch=$b"): _*)
        .groupBy(col("_k"))
        .agg(sum(col("_o0")).as("_o0"), sum(col("_o1")).as("_o1"))
  }

  /** Running χ² verdict — identical output to
    * [[EventAnalytics.chiSquareIndependence]] over all rows ingested
    * so far (shared core). */
  def chiSquare(spark: SparkSession, dir: String): DataFrame =
    EventAnalytics.chiSquareFromCells(catCells(spark, dir))

  def startCategorical(df: DataFrame, groupCol: String, catCol: String,
                       dir: String, checkpoint: String): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val dirPath = new Path(dir)
        val fs = dirPath.getFileSystem(spark.sessionState.newHadoopConf())
        // no state-shaping knobs: the categorical grid IS the data's
        val (done, _) = StreamProtocol.replayGuardsWithCommitted(
          fs, dirPath, checkpoint, "categorical=v1", batchId, "_batch_",
          "StreamingDrift.categorical")
        if (!done) {
          EventAnalytics.catCells(batch, col(groupCol),
              col(catCol).cast("string"))
            .write.mode(SaveMode.Overwrite)
            .parquet(s"$dir/ingest_batch=$batchId")
          StreamProtocol.commit(fs, dirPath, "_batch_", batchId)
        }
        ()
      }
      .start()

  // ------------------------------------------------------------------
  // the SEASONALITY twin: incremental (dow, hour) traffic residuals
  // ------------------------------------------------------------------

  val SeasonCellsSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("_dw",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("_hr",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("_n",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ingest_batch",
        org.apache.spark.sql.types.LongType)))

  /** Accumulated (dow, hour) count table — same committed-delta sum
    * discipline as [[cells]]. Bounded at 7×24 cells regardless of
    * ingest volume. */
  def seasonCells(spark: SparkSession, dir: String): DataFrame = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val committed = StreamProtocol.committedIds(fs, p, "_batch_")
    if (committed.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        SeasonCellsSchema)
        .select(col("_dw"), col("_hr"), col("_n"))
    else
      spark.read.schema(SeasonCellsSchema).option("basePath", dir).parquet(
          committed.map(b => s"$dir/ingest_batch=$b"): _*)
        .groupBy(col("_dw"), col("_hr"))
        .agg(sum(col("_n")).as("_n"))
  }

  /** Running seasonality profile — identical output to
    * [[EventAnalytics.seasonalityProfile]] over all rows ingested so
    * far (shared core); residuals re-derive against the CURRENT
    * margins on every read, so a cell's surprise legitimately moves
    * as the week fills in. */
  def seasonality(spark: SparkSession, dir: String): DataFrame =
    EventAnalytics.seasonalityFromCells(seasonCells(spark, dir))

  /** `df` must carry an epoch-µs long column `tsUsCol`; NULLs drop —
    * the batch operator's law, enforced by the shared cell
    * reduction. The dow/hour grid is fixed (UTC, dow 0 = Monday), so
    * the fingerprint carries only a version tag. */
  def startSeasonality(df: DataFrame, tsUsCol: String,
                       dir: String, checkpoint: String): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val dirPath = new Path(dir)
        val fs = dirPath.getFileSystem(spark.sessionState.newHadoopConf())
        val (done, _) = StreamProtocol.replayGuardsWithCommitted(
          fs, dirPath, checkpoint, "seasonality=v1", batchId, "_batch_",
          "StreamingDrift.seasonality")
        if (!done) {
          EventAnalytics.seasonCells(batch, col(tsUsCol))
            .write.mode(SaveMode.Overwrite)
            .parquet(s"$dir/ingest_batch=$batchId")
          StreamProtocol.commit(fs, dirPath, "_batch_", batchId)
        }
        ()
      }
      .start()

  // ------------------------------------------------------------------
  // the BENFORD twin: incremental first-digit census
  // ------------------------------------------------------------------

  val DigitCellsSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("_d",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("_o",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ingest_batch",
        org.apache.spark.sql.types.LongType)))

  /** Accumulated first-digit count table — same committed-delta sum
    * discipline as [[cells]]. Bounded at 9 cells. */
  def digitCells(spark: SparkSession, dir: String): DataFrame = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val committed = StreamProtocol.committedIds(fs, p, "_batch_")
    if (committed.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        DigitCellsSchema)
        .select(col("_d"), col("_o"))
    else
      spark.read.schema(DigitCellsSchema).option("basePath", dir).parquet(
          committed.map(b => s"$dir/ingest_batch=$b"): _*)
        .groupBy(col("_d"))
        .agg(sum(col("_o")).as("_o"))
  }

  /** Running Benford census — identical output to
    * [[EventAnalytics.benfordDigits]] over all rows ingested so far
    * (shared core). */
  def benford(spark: SparkSession, dir: String): DataFrame =
    EventAnalytics.benfordFromCells(digitCells(spark, dir))

  /** `df` must carry a long integer-cent column `centsCol`;
    * non-positive and NULL cents drop — the batch operator's law,
    * enforced by the shared cell reduction. The digit grid is fixed,
    * so the fingerprint carries only a version tag. */
  def startBenford(df: DataFrame, centsCol: String,
                   dir: String, checkpoint: String): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val dirPath = new Path(dir)
        val fs = dirPath.getFileSystem(spark.sessionState.newHadoopConf())
        val (done, _) = StreamProtocol.replayGuardsWithCommitted(
          fs, dirPath, checkpoint, "benford=v1", batchId, "_batch_",
          "StreamingDrift.benford")
        if (!done) {
          EventAnalytics.digitCells(batch, col(centsCol))
            .write.mode(SaveMode.Overwrite)
            .parquet(s"$dir/ingest_batch=$batchId")
          StreamProtocol.commit(fs, dirPath, "_batch_", batchId)
        }
        ()
      }
      .start()

  // ------------------------------------------------------------------
  // the DAILY twin: incremental CUSUM changepoint
  // ------------------------------------------------------------------

  /** All three values shape the persisted day grid / tick basis and
    * are pinned in the stream-config fingerprint. */
  final case class DailyConfig(epoch0Us: Long, dayUs: Long, scale: Long)

  private def fingerprintDaily(cfg: DailyConfig): String =
    s"epoch0Us=${cfg.epoch0Us};dayUs=${cfg.dayUs};scale=${cfg.scale}"

  val DayCellsSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("_d",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("_c",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("_s",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ingest_batch",
        org.apache.spark.sql.types.LongType)))

  /** Accumulated daily (count, tick-sum) table — same committed-delta
    * sum discipline as [[cells]]. */
  def dayCells(spark: SparkSession, dir: String): DataFrame = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val committed = StreamProtocol.committedIds(fs, p, "_batch_")
    if (committed.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], DayCellsSchema)
        .select(col("_d"), col("_c"), col("_s"))
    else
      spark.read.schema(DayCellsSchema).option("basePath", dir).parquet(
          committed.map(b => s"$dir/ingest_batch=$b"): _*)
        .groupBy(col("_d"))
        .agg(sum(col("_c")).as("_c"), sum(col("_s")).as("_s"))
  }

  /** Running changepoint verdict — identical output to
    * [[EventAnalytics.cusumChangepoint]] over all rows ingested so
    * far (shared core); re-locates the split on every read, which is
    * the point: the monitor's answer may MOVE as evidence accrues. */
  def changepoint(spark: SparkSession, dir: String,
                  cfg: DailyConfig): DataFrame =
    EventAnalytics.cusumFromDays(dayCells(spark, dir), cfg.scale)

  def startDaily(df: DataFrame, tsCol: String, valueCol: String,
                 dir: String, checkpoint: String,
                 cfg: DailyConfig): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val dirPath = new Path(dir)
        val fs = dirPath.getFileSystem(spark.sessionState.newHadoopConf())
        val (done, _) = StreamProtocol.replayGuardsWithCommitted(
          fs, dirPath, checkpoint, fingerprintDaily(cfg), batchId, "_batch_",
          "StreamingDrift.daily")
        if (!done) {
          EventAnalytics.dayCells(batch, tsCol, valueCol,
              cfg.epoch0Us, cfg.dayUs, cfg.scale)
            .write.mode(SaveMode.Overwrite)
            .parquet(s"$dir/ingest_batch=$batchId")
          StreamProtocol.commit(fs, dirPath, "_batch_", batchId)
        }
        ()
      }
      .start()

  /** `df` must carry the group (0/1) and value columns; NULLs drop and
    * out-of-domain groups refuse loudly — the batch operators' laws,
    * enforced by the shared cell reduction. */
  def start(df: DataFrame, groupCol: String, valueCol: String,
            dir: String, checkpoint: String, cfg: Config): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val dirPath = new Path(dir)
        val fs = dirPath.getFileSystem(spark.sessionState.newHadoopConf())
        val (done, _) = StreamProtocol.replayGuardsWithCommitted(
          fs, dirPath, checkpoint, fingerprint(cfg), batchId, "_batch_",
          "StreamingDrift")
        if (!done) {
          EventAnalytics.drift2Cells(batch, col(groupCol), col(valueCol),
              cfg.scale, "StreamingDrift")
            .write.mode(SaveMode.Overwrite)
            .parquet(s"$dir/ingest_batch=$batchId")
          StreamProtocol.commit(fs, dirPath, "_batch_", batchId)
        }
        ()
      }
      .start()
}
