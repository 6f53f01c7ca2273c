package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.streaming.StreamingSimilarity

/** Incremental ANN end to end: embeddings stream in over micro-batches;
  * each vector's neighbors come from STRICTLY EARLIER ingests via the
  * persisted bucket-partitioned index, and the stream's answers match
  * the batch operator run offline over the same split. */
class StreamingSimilaritySpec extends SparkSpec {

  test("streaming ANN index: cross-batch retrieval matches the batch operator") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val emb = Tables.load(spark, sf("sf0.001"), "embeddings")
      .select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
    val (first, second) = emb.splitAt(emb.length / 2)

    val base = java.nio.file.Files.createTempDirectory("graft_ssim_").toString
    val input = MemoryStream[(Long, Seq[Float])]
    val q = StreamingSimilarity.start(
      input.toDS().toDF("vec_id", "embedding"),
      idCol = "vec_id", vecCol = "embedding",
      indexDir = s"$base/index", resultDir = s"$base/results",
      checkpoint = s"$base/ckpt", k = 5, planes = 4, dim = 64)
    try {
      input.addData(first.toSeq: _*)
      q.processAllAvailable()
      // batch 1 met an empty index: no results yet, but the index holds it
      val afterB1 = spark.read.parquet(s"$base/index")
        .select("vec_id").distinct().count()
      assert(afterB1 == first.length.toLong)

      input.addData(second.toSeq: _*)
      q.processAllAvailable()

      val got = spark.read.parquet(s"$base/results")
        .select("q_id", "rank", "c_id", "cos")
        .as[(Long, Long, Long, Double)].collect().toSet

      // every neighbor must come from batch 1 (strictly earlier ingests)
      val firstIds = first.map(_._1).toSet
      assert(got.nonEmpty)
      assert(got.forall { case (qid, _, cid, _) =>
        !firstIds.contains(qid) && firstIds.contains(cid) })

      // differential: the batch operator over (second → queries,
      // first → corpus) must produce the identical answer set
      val qDf = second.toSeq.toDF("q_id", "q_vec")
      val cDf = first.toSeq.toDF("c_id", "c_vec")
      val expected = graft.operators.Similarity
        .lshTopK(qDf, cDf, k = 5, planes = 4, dim = 64)
        .select("q_id", "rank", "c_id", "cos")
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(got == expected)

      // the index is partitioned by bucket and a bucket probe prunes
      // at the scan — the property each micro-batch's join relies on
      val dirs = new java.io.File(s"$base/index").listFiles()
        .filter(_.isDirectory).map(_.getName)
      assert(dirs.nonEmpty && dirs.forall(_.startsWith("bucket=")), dirs.toSeq)
      val probe = spark.read.parquet(s"$base/index").filter(col("bucket") === 3L)
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

  test("fresh checkpoint over a retained index fails loudly, not silently") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val vecs = Seq.tabulate(8)(i => (i.toLong, Seq.fill(8)(i.toFloat + 1)))
    val base = java.nio.file.Files.createTempDirectory("graft_ssim_rg_").toString
    def run(ckpt: String): Unit = {
      val input = MemoryStream[(Long, Seq[Float])]
      val q = StreamingSimilarity.start(
        input.toDS().toDF("vec_id", "embedding"),
        idCol = "vec_id", vecCol = "embedding",
        indexDir = s"$base/index", resultDir = s"$base/results",
        checkpoint = ckpt, k = 3, planes = 2, dim = 8)
      try { input.addData(vecs: _*); q.processAllAvailable() }
      finally q.stop()
    }
    try {
      run(s"$base/ckpt1") // commits _batch_0 into the index
      // restarting with a FRESH checkpoint resets batchId to 0: the
      // old marker would silently swallow the batch — must throw
      val ex = intercept[Exception] { run(s"$base/ckpt2") }
      val msgs = Iterator.iterate(ex: Throwable)(_.getCause)
        .takeWhile(_ != null).map(_.getMessage).mkString("\n")
      assert(msgs.contains("fresh checkpoint"),
        s"expected the batchId-regression guard, got:\n$msgs")
    } finally {
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(base)
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("latestPerId: re-ingested vec_id keeps the latest committed row, deterministically") {
    import spark.implicits._
    val index = Seq(
      (1L, 0L, Seq(1f, 0f), 1.0, 0L),   // stale version of id 1
      (1L, 0L, Seq(0f, 1f), 1.0, 2L),   // latest committed version
      (1L, 0L, Seq(0f, 1f), 1.0, 2L),   // double-append replay of it
      (2L, 1L, Seq(1f, 1f), 1.4, 4L))   // current batch: must drop
      .toDF("vec_id", "bucket", "vec", "norm", "ingest_batch")
    // layout independence: same survivors under any partitioning
    for (df <- Seq(index, index.repartition(5), index.coalesce(1))) {
      val got = StreamingSimilarity.latestPerId(df, batchId = 4L)
        .select("vec_id", "vec", "ingest_batch")
        .as[(Long, Seq[Float], Long)].collect().toSet
      assert(got === Set((1L, Seq(0f, 1f), 2L)))
    }
  }
}
