package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Sinks (`SURVEY.md` §2 A6/A7).
  *
  * The reference's MySQL sink is a driver-side loop creating one
  * `PreparedStatement` per row (`data/SampledDataDump.java:25-40`) —
  * O(rows) round-trips through one connection. [[writeJdbc]] is the
  * distributed replacement: every partition opens one connection and
  * writes batched inserts in parallel (`spark.write.jdbc` semantics),
  * so throughput scales with executors × batch size. Model persistence
  * (A7/A8) lives in `graft.ml.Models.saveLoad` (MLWriter).
  */
object Sinks {

  /** The one shared body of the three format sinks. */
  private def write(df: DataFrame, path: String, format: String,
                    partitionBy: Seq[String], mode: SaveMode): Unit = {
    val w = df.write.mode(mode).format(format)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .save(path)
  }

  /** Parquet sink — the driver-contract output format. Optional
    * partition columns give directory-pruned layouts for downstream
    * readers (the 100 TB default: partition by a low-cardinality
    * predicate column, never by a high-cardinality key). */
  def writeParquet(df: DataFrame, path: String,
                   partitionBy: Seq[String] = Nil,
                   mode: SaveMode = SaveMode.Overwrite): Unit =
    write(df, path, "parquet", partitionBy, mode)

  /** ORC sink — parquet's sibling columnar format, same partitioned
    * layout options. */
  def writeOrc(df: DataFrame, path: String,
               partitionBy: Seq[String] = Nil,
               mode: SaveMode = SaveMode.Overwrite): Unit =
    write(df, path, "orc", partitionBy, mode)

  /** JSON-lines sink — the interchange/export format (one object per
    * line, splittable, append-friendly). For data the ENGINE will
    * re-read, prefer parquet: JSON re-parses every byte and prunes
    * nothing. */
  def writeJson(df: DataFrame, path: String,
                partitionBy: Seq[String] = Nil,
                mode: SaveMode = SaveMode.Overwrite): Unit =
    write(df, path, "json", partitionBy, mode)

  /** Size-targeted parquet sink — the small-files guard. A 100 TB
    * pipeline that writes through whatever partitioning the last
    * shuffle left behind produces either thousands of KB-sized files
    * (metadata pressure, slow listings, tiny row groups that defeat
    * min/max pruning) or a handful of multi-GB ones (no read
    * parallelism, whole-file retries). This sink sizes the file count
    * from the OPTIMIZER'S estimate of the output bytes
    * (`optimizedPlan.stats.sizeInBytes` — free: no extra scan, no
    * count job, available on any plan) and round-robin repartitions to
    * ceil(bytes / targetBytes) before writing, so every output file
    * lands near the target regardless of what upstream did.
    * The estimate is in-memory bytes and parquet compresses, so files
    * land under target (safe side: more, smaller files — never the
    * multi-GB failure mode); callers with a known compression ratio
    * fold it into `targetBytes`. Returns the file count chosen. */
  def writeParquetSized(df: DataFrame, path: String,
                        targetBytes: Long = 128L << 20,
                        mode: SaveMode = SaveMode.Overwrite): Int = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // plans without computable stats report defaultSizeInBytes
    // (Long.MaxValue) or a join-multiplied absurdity — sizing from
    // that would repartition to the cap and write a blizzard of tiny
    // files, the exact failure this sink exists to prevent. Fail
    // loudly instead of trusting a sentinel.
    require(estBytes < (BigInt(1L) << 50),
      s"writeParquetSized: the optimizer reports no usable size estimate " +
        s"($estBytes bytes) for this plan — materialize or cache the " +
        s"input first, or size the write yourself with repartition(n)")
    val files = (estBytes + targetBytes - 1) / targetBytes
    val n = files.min(BigInt(1 << 16)).max(BigInt(1)).toInt
    df.repartition(n).write.mode(mode).parquet(path)
    n
  }

  /** A6: distributed, batched JDBC sink (vs the reference's row-at-a-
    * time driver loop). `batchsize` controls rows per executeBatch;
    * `numPartitions` caps concurrent connections against the database. */
  def writeJdbc(df: DataFrame, url: String, table: String,
                user: String, password: String,
                batchSize: Int = 10000, numPartitions: Int = 8,
                mode: SaveMode = SaveMode.Append): Unit = {
    val props = new Properties()
    props.setProperty("user", user)
    props.setProperty("password", password)
    props.setProperty("batchsize", batchSize.toString)
    // repartition, not coalesce: coalesce would collapse the UPSTREAM
    // computation to numPartitions tasks; a shuffle caps only the
    // connection count while the compute keeps its parallelism
    df.repartition(numPartitions).write.mode(mode).jdbc(url, table, props)
  }
}
