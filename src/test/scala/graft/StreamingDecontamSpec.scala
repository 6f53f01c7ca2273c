package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Sampling}
import graft.sources.Tables
import graft.streaming.StreamingDecontam

/** Streaming decontamination end to end: corpus docs arrive over
  * micro-batches, each checked against a static eval-set shingle index;
  * the union of the streamed verdicts must equal the batch operator's
  * pair set exactly (the index is immutable, so batch boundaries cannot
  * change any verdict). */
class StreamingDecontamSpec extends SparkSpec {

  test("streamed flags over micro-batches == batch decontaminate; index read is bucket-pruned") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val docs = Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id").cast("long"), col("text"))
    // same eval-set recipe as q69: deterministic 10% hash sample
    val evalSet = Sampling.hashSample(docs, col("doc_id"), fraction = 0.1)
    val corpus = docs.as[(Long, String)].collect().sortBy(_._1)
    val (first, second) = corpus.splitAt(corpus.length / 2)

    val base = java.nio.file.Files.createTempDirectory("graft_sdecon_").toString
    StreamingDecontam.prepareEvalIndex(
      evalSet, col("doc_id"), col("text"), s"$base/index")

    val input = MemoryStream[(Long, String)]
    val q = StreamingDecontam.start(
      input.toDS().toDF("doc_id", "text"),
      idCol = "doc_id", textCol = "text",
      indexDir = s"$base/index", flaggedDir = s"$base/flagged",
      checkpoint = s"$base/ckpt")
    try {
      input.addData(first.toSeq: _*)
      q.processAllAvailable()
      input.addData(second.toSeq: _*)
      q.processAllAvailable()

      val streamed = spark.read.parquet(s"$base/flagged")
        .select("doc_id", "eval_id", "n_overlap")
        .as[(Long, Long, Long)].collect().toSet
      val batch = Dedup.decontaminate(docs, evalSet, "doc_id", col("text"))
        .as[(Long, Long, Long)].collect().toSet
      assert(streamed.nonEmpty, "sf0.001 corpus must produce some flags")
      assert(streamed === batch)

      // the index is bucket-partitioned and a probe prunes at the scan
      val dirs = new java.io.File(s"$base/index").listFiles()
        .filter(_.isDirectory).map(_.getName)
      assert(dirs.nonEmpty && dirs.forall(_.startsWith("bucket=")), dirs.toSeq)
      val probe = spark.read.parquet(s"$base/index").filter(col("bucket") === 3)
      val plan = probe.queryExecution.executedPlan.toString
      val pf = "PartitionFilters: \\[[^\\]]*".r.findFirstIn(plan).getOrElse("")
      assert(pf.contains("bucket"),
        s"bucket probe must prune partitions, not filter rows:\n$plan")
    } finally {
      q.stop()
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(base)
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("an eval index with no _index_config (interrupted prepare) fails " +
      "loudly instead of probing with unknown parameters") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_sdecon_nocfg_").toString
    StreamingDecontam.prepareEvalIndex(
      Seq((9L, "some eval doc with several tokens inside it"))
        .toDF("doc_id", "text"),
      col("doc_id"), col("text"), s"$base/index")
    // the crash window prepareEvalIndex's atomic publish narrows:
    // index written, config gone (the parquet Overwrite deletes it
    // with the dir; the process dies before the re-publish)
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$base/index/_index_config"))
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$base/index/._index_config.crc"))
    val input = MemoryStream[(Long, String)]
    val q = StreamingDecontam.start(
      input.toDS().toDF("doc_id", "text"),
      idCol = "doc_id", textCol = "text",
      indexDir = s"$base/index", flaggedDir = s"$base/flagged",
      checkpoint = s"$base/ckpt")
    try {
      input.addData((1L, "a b c d e"))
      val ex = intercept[Exception] { q.processAllAvailable() }
      val msgs = Iterator.iterate(ex: Throwable)(_.getCause)
        .takeWhile(_ != null).map(_.getMessage).mkString("\n")
      assert(msgs.contains("no _index_config"), s"got:\n$msgs")
    } finally {
      q.stop()
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(base)
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("a missing eval index fails loudly instead of flagging nothing") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_sdecon_miss_").toString
    val input = MemoryStream[(Long, String)]
    val q = StreamingDecontam.start(
      input.toDS().toDF("doc_id", "text"),
      idCol = "doc_id", textCol = "text",
      indexDir = s"$base/no_such_index", flaggedDir = s"$base/flagged",
      checkpoint = s"$base/ckpt")
    try {
      input.addData((1L, "a b c d e"))
      val ex = intercept[Exception] { q.processAllAvailable() }
      val msgs = Iterator.iterate(ex: Throwable)(_.getCause)
        .takeWhile(_ != null).map(_.getMessage).mkString("\n")
      assert(msgs.contains("prepareEvalIndex"), s"got:\n$msgs")
    } finally {
      q.stop()
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(base)
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
