package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.GraftFunctions.{polyHash, shingles, tokens}
import graft.operators.Sketches

/** Incremental corpus statistics — the running per-source dashboard a
  * training-data ingest keeps current as documents stream in: document
  * and token counts, a Count-Min sketch of token frequencies, and a
  * bottom-k (KMV) distinct-shingle sketch per source. The point is the
  * MERGEABILITY of the sketch family ([[graft.operators.Sketches]]):
  * each micro-batch computes ITS OWN bounded summaries and merges them
  * into the previous snapshot by pure algebra — cell-wise sum for CMS,
  * concat → re-cut for bottom-k, addition for counts — so per-batch
  * work scales with the batch, never with corpus history, and the
  * whole state is a few bounded DataFrames.
  *
  * State layout: a SNAPSHOT CHAIN. Version `v=<batchId>` holds the
  * full merged state after that batch, written with Overwrite into its
  * own directory and committed by a marker file written LAST:
  *  - a replayed batch rewrites its own version directory (idempotent);
  *  - readers (and the next batch) resolve the latest COMMITTED
  *    version from the markers, never a half-written one;
  *  - the same run-identity / batchId-regression guards as the other
  *    streams fail loudly when a fresh checkpoint replays over
  *    retained state.
  * Old versions are retained for time travel (they are the corpus
  * manifest history); a retention sweep can delete any prefix.
  *
  * Tables per version (all bounded):
  *  - `counts`: (source, n_docs, n_tokens)
  *  - `cms`:    (row_idx, bucket, cnt) — global token CMS
  *  - `kmv`:    (grp, hs) — per-source bottom-k distinct shingle hashes
  */
object StreamingCorpusStats {

  final case class Config(cmsWidth: Int = 2048, cmsDepth: Int = 3,
                          kmvK: Int = 128, shingleN: Int = 3)

  private def committedVersions(spark: SparkSession, statsDir: String): Seq[Long] = {
    val p = new Path(statsDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    StreamProtocol.committedIds(fs, p, "_v_")
  }

  private def fingerprint(cfg: Config): String =
    s"cmsWidth=${cfg.cmsWidth};cmsDepth=${cfg.cmsDepth};" +
      s"kmvK=${cfg.kmvK};shingleN=${cfg.shingleN}"

  /** The latest committed snapshot's tables, or None before the first
    * commit. Public: this is also the read API for consumers. */
  def latest(spark: SparkSession, statsDir: String)
      : Option[(Long, DataFrame, DataFrame, DataFrame)] =
    committedVersions(spark, statsDir).maxOption.map { v =>
      (v,
        spark.read.parquet(s"$statsDir/v=$v/counts"),
        spark.read.parquet(s"$statsDir/v=$v/cms"),
        spark.read.parquet(s"$statsDir/v=$v/kmv"))
    }

  /** Per-batch summaries of a (source, text) document set — shared by
    * the stream and by the batch twin the spec compares against. */
  private[graft] def summarize(docs: DataFrame, cfg: Config)
      : (DataFrame, DataFrame, DataFrame) = {
    val toks = docs.select(col("source"), explode(tokens(col("text"))).as("tok"))
    val counts = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(tokens(col("text"))).cast("long")).as("n_tokens"))
    val cms = Sketches.cmsFromCounts(
      toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt")),
      col("tok"), col("cnt"), cfg.cmsWidth, cfg.cmsDepth)
    val sh = docs
      .select(col("source"), explode(shingles(tokens(col("text")), cfg.shingleN)).as("ng"))
      .select(col("source"), polyHash(col("ng")).as("h"))
    val kmv = Sketches.bottomK(sh, col("source"), col("h"), cfg.kmvK)
    (counts, cms, kmv)
  }

  /** Merge two snapshots — pure sketch algebra, no corpus data. */
  private[graft] def merge(a: (DataFrame, DataFrame, DataFrame),
                           b: (DataFrame, DataFrame, DataFrame),
                           cfg: Config): (DataFrame, DataFrame, DataFrame) = {
    val counts = a._1.unionByName(b._1)
      .groupBy(col("source"))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
    val cms = a._2.unionByName(b._2)
      .groupBy(col("row_idx"), col("bucket")).agg(sum(col("cnt")).as("cnt"))
    val kmv = Sketches.bottomK(
      a._3.unionByName(b._3).select(col("grp"), explode(col("hs")).as("h")),
      col("grp"), col("h"), cfg.kmvK)
    (counts, cms, kmv)
  }

  def start(docs: DataFrame, sourceCol: String, textCol: String,
            statsDir: String, checkpoint: String,
            cfg: Config = Config()): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val dirPath = new Path(statsDir)
        val fs = dirPath.getFileSystem(spark.sessionState.newHadoopConf())
        val done = StreamProtocol.replayGuards(fs, dirPath, checkpoint,
          fingerprint(cfg), batchId, "_v_", "StreamingCorpusStats")
        if (!done) {
          // the three snapshot writes are three jobs: cache the
          // projected batch so the source micro-batch is read once,
          // not once per table
          val projected = batch
            .select(col(sourceCol).as("source"), col(textCol).as("text"))
            .cache()
          try {
            val fresh = summarize(projected, cfg)
            val merged = committedVersions(spark, statsDir)
              .filter(_ < batchId).maxOption match {
              case None => fresh
              case Some(prev) =>
                merge(
                  (spark.read.parquet(s"$statsDir/v=$prev/counts"),
                    spark.read.parquet(s"$statsDir/v=$prev/cms"),
                    spark.read.parquet(s"$statsDir/v=$prev/kmv")),
                  fresh, cfg)
            }
            // full snapshot, Overwrite into this batch's own version
            // dir: a replay rewrites it; the marker commits LAST
            merged._1.write.mode(SaveMode.Overwrite)
              .parquet(s"$statsDir/v=$batchId/counts")
            merged._2.write.mode(SaveMode.Overwrite)
              .parquet(s"$statsDir/v=$batchId/cms")
            merged._3.write.mode(SaveMode.Overwrite)
              .parquet(s"$statsDir/v=$batchId/kmv")
            StreamProtocol.commit(fs, dirPath, "_v_", batchId)
          } finally projected.unpersist()
        }
        ()
      }
      .start()
}
