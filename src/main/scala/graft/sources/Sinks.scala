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

  /** Parquet sink — the driver-contract output format. Optional
    * partition columns give directory-pruned layouts for downstream
    * readers (the 100 TB default: partition by a low-cardinality
    * predicate column, never by a high-cardinality key). */
  def writeParquet(df: DataFrame, path: String,
                   partitionBy: Seq[String] = Nil,
                   mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path)
  }

  /** ORC sink — parquet's sibling columnar format, same partitioned
    * layout options. */
  def writeOrc(df: DataFrame, path: String,
               partitionBy: Seq[String] = Nil,
               mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .orc(path)
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
