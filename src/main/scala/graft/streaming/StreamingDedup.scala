package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.operators.Dedup

/** Incremental (streaming) near-duplicate detection: a `foreachBatch`
  * pipeline that maintains a persistent MinHash band index and flags
  * each arriving document against EVERYTHING previously ingested.
  *
  * Per micro-batch:
  *  1. signatures + LSH bands for the batch (`Dedup.withMinHash` /
  *     `withLshBands` — the same operators as the batch path);
  *  2. band-equality join against the persisted index → candidates;
  *     signature-agreement fraction ≥ `minAgreement` confirms a dup;
  *  3. confirmed dup (new_id, indexed_id) pairs OVERWRITE
  *     `dupDir/batch=<id>` (retry-safe: a replayed batch rewrites its
  *     own directory instead of appending duplicates);
  *  4. non-duplicate docs' band rows append to `indexDir` tagged with
  *     their `ingest_batch`, and a marker file commits the batch LAST
  *     — the same at-least-once protocol as [[StreamingSimilarity]]:
  *     the marker skips a fully committed replay, the
  *     `ingest_batch < batchId` read filter keeps a half-committed
  *     attempt of the same batch from self-matching, and a
  *     run-identity file plus a committed-marker bound fail fast when
  *     a fresh checkpoint replays over a retained index (batch ids
  *     restarting at 0 would otherwise silently swallow batches).
  *
  * Scale: the index parquet is PARTITIONED by (band_idx, band_bucket)
  * — band_bucket = band_hash mod [[BucketCount]] — and each batch
  * reads ONLY the partitions its own band keys touch (the touched key
  * set is tiny and driver-known: at most bands × BucketCount values),
  * so per-batch work scales with the batch, not with the accumulated
  * index. State grows with unique docs only. All filesystem probes go
  * through the Hadoop FileSystem API, so the same code runs on local
  * disk, HDFS, or object stores. Intra-batch duplicates are both
  * admitted (checked only against the index); run the batch dedup
  * inside the micro-batch first if that matters.
  */
object StreamingDedup {

  /** Partition fan-out per band for the persisted index: band_hash mod
    * 64 — enough selectivity that a batch prunes most of a large
    * index, few enough directories that listing stays cheap. */
  val BucketCount = 64

  val IndexSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("band_idx", IntegerType),
    StructField("band_bucket", IntegerType),
    StructField("band_hash", LongType),
    StructField("minhash", ArrayType(LongType)),
    StructField("ingest_batch", LongType)))

  def start(docs: DataFrame, textCol: String, idCol: String,
            indexDir: String, dupDir: String, checkpoint: String,
            k: Int = 16, bands: Int = 4, shingleN: Int = 3,
            minAgreement: Double = 0.8): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // Hadoop FS probe — java.io.File would always miss on HDFS/S3
        // and silently disable cross-batch detection
        val indexPath = new Path(indexDir)
        val fs = indexPath.getFileSystem(spark.sessionState.newHadoopConf())
        // ---- replay guards (StreamProtocol, BEFORE any work) -------
        // k/bands/shingleN shape the persisted signatures and band
        // keys: resuming with different values would band-join
        // incompatible hash spaces and silently stop matching — the
        // config guard fails fast instead. minAgreement only filters
        // results and is deliberately NOT pinned.
        // bucketMod: band_bucket = band_hash mod BucketCount is BAKED
        // into the persisted partition values — resuming with a
        // different modulus would prune against mismatched buckets and
        // silently stop flagging roughly (1 - 1/mod) of true candidates
        // legacy: the pre-bucketMod fingerprint — BucketCount is a
        // compile-time constant that has never changed value, so state
        // claimed under the old rendering is byte-compatible
        val dedupCfg = s"k=$k;bands=$bands;shingleN=$shingleN;bucketMod=$BucketCount"
        val dedupLegacy = Seq(s"k=$k;bands=$bands;shingleN=$shingleN")
        val done = StreamProtocol.replayGuards(fs, indexPath, checkpoint,
          dedupCfg, batchId, "_batch_", "StreamingDedup",
          legacyConfigs = dedupLegacy)
        if (done) ()
        else {
        // the per-batch verdict output is AUXILIARY state committed
        // through indexDir's markers: fence it too, or a re-ingest
        // that wiped index+checkpoint but kept dupDir silently mixes
        // the dead run's higher-numbered batch=N verdicts into the new
        // run's output until the new run passes them
        val dupPath = new Path(dupDir)
        StreamProtocol.claimAuxiliary(
          dupPath.getFileSystem(spark.sessionState.newHadoopConf()),
          dupPath, checkpoint, dedupCfg, "StreamingDedup (dup output)",
          legacyConfigs = dedupLegacy)
        val banded = Dedup.withLshBands(
            Dedup.withMinHash(batch, col(textCol), k, shingleN), k, bands)
          // shingle-less documents band to NULL hashes: they can match
          // nothing, would write useless null partitions, and a null
          // band_bucket would NPE the driver-side prune collect below
          .filter(col("band_hash").isNotNull)
          .select(col(idCol).cast("long").as("doc_id"),
            col("band_idx"),
            pmod(col("band_hash"), lit(BucketCount.toLong)).cast("int")
              .as("band_bucket"),
            col("band_hash"), col("minhash"))
          .withColumn("ingest_batch", lit(batchId))
          .cache()
        try {
          // layout + ingest_batch validation is the shared
          // StreamProtocol guard; the prune below is this stream's own:
          // the touched (band_idx, band_bucket) set is at most
          // bands × BucketCount values — a tiny, bounded driver-side
          // collect
          val index = StreamProtocol.validatedIndex(spark, fs, indexPath,
              "band_idx", IndexSchema, "StreamingDedup",
              "partitioned by (band_idx, band_bucket)") match {
            case None =>
              spark.createDataFrame(spark.sparkContext.emptyRDD[Row], IndexSchema)
            case Some(reader) =>
              val touched = banded
                .select(col("band_idx"), col("band_bucket")).distinct()
                .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
              val prune = touched
                .map { case (bi, bb) =>
                  col("band_idx") === bi && col("band_bucket") === bb }
                .reduceOption(_ || _).getOrElse(lit(false))
              reader.filter(prune)
                // replay guard: rows a half-committed earlier attempt
                // of THIS batch appended must never match. (A crash
                // between index append and marker can leave the
                // replay double-appending; the duplicate band rows
                // only duplicate candidates, which the dups distinct
                // collapses — wasted bytes, never wrong answers.)
                .filter(col("ingest_batch") < batchId)
          }

          val dups = banded.alias("n")
            .join(index.alias("i"), Seq("band_idx", "band_hash"))
            .filter(col("n.doc_id") =!= col("i.doc_id"))
            .withColumn("agreement",
              graft.functions.HashExpressions
                .arrayEqCountNative(col("n.minhash"), col("i.minhash"))
                .cast("double") / k.toDouble)
            .filter(col("agreement") >= minAgreement)
            .select(col("n.doc_id").as("new_id"),
              col("i.doc_id").as("matched_id"), col("agreement"))
            .distinct()
            .cache()

          try {
            dups.write.mode(SaveMode.Overwrite)
              .parquet(s"$dupDir/batch=$batchId")
            banded
              .join(dups.select(col("new_id")).distinct(),
                col("doc_id") === col("new_id"), "left_anti")
              .write.mode(SaveMode.Append)
              .partitionBy("band_idx", "band_bucket")
              .parquet(indexDir)
            StreamProtocol.commit(fs, indexPath, "_batch_", batchId)
          } finally dups.unpersist()   // a failed write must not leak the cache
        } finally banded.unpersist()
        }
        ()
      }
      .start()
}
