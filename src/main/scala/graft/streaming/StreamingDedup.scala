package graft.streaming

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
  *  3. confirmed dup (new_id, indexed_id) pairs append to `dupDir`;
  *  4. non-duplicate docs' band rows append to `indexDir`.
  *
  * Scale: the index is parquet partitioned by band key on read
  * (equality join), state grows with unique docs only, and each batch
  * touches index rows sharing a band with the batch — the streaming
  * twin of the batch LSH plan. Intra-batch duplicates are both
  * admitted (checked only against the index); run the batch dedup
  * inside the micro-batch first if that matters.
  */
object StreamingDedup {

  val IndexSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("band_idx", IntegerType),
    StructField("band_hash", LongType),
    StructField("minhash", ArrayType(LongType))))

  def start(docs: DataFrame, textCol: String, idCol: String,
            indexDir: String, dupDir: String, checkpoint: String,
            k: Int = 16, bands: Int = 4, shingleN: Int = 3,
            minAgreement: Double = 0.8): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val banded = Dedup.withLshBands(
            Dedup.withMinHash(batch, col(textCol), k, shingleN), k, bands)
          .select(col(idCol).cast("long").as("doc_id"),
            col("band_idx"), col("band_hash"), col("minhash"))
          .cache()
        try {
          val index =
            if (new java.io.File(indexDir).exists())
              spark.read.schema(IndexSchema).parquet(indexDir)
            else spark.createDataFrame(
              spark.sparkContext.emptyRDD[Row], IndexSchema)

          val dups = banded.alias("n")
            .join(index.alias("i"), Seq("band_idx", "band_hash"))
            .filter(col("n.doc_id") =!= col("i.doc_id"))
            .withColumn("agreement",
              size(filter(zip_with(col("n.minhash"), col("i.minhash"),
                (x, y) => when(x === y, lit(1))), c => c.isNotNull))
                .cast("double") / k.toDouble)
            .filter(col("agreement") >= minAgreement)
            .select(col("n.doc_id").as("new_id"),
              col("i.doc_id").as("matched_id"), col("agreement"))
            .distinct()
            .cache()

          dups.write.mode(SaveMode.Append).parquet(dupDir)
          banded
            .join(dups.select(col("new_id")).distinct(),
              col("doc_id") === col("new_id"), "left_anti")
            .write.mode(SaveMode.Append).parquet(indexDir)
          dups.unpersist()
        } finally banded.unpersist()
        ()
      }
      .start()
}
