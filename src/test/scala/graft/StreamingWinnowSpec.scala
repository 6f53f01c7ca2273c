package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.streaming.StreamingWinnow

/** Incremental winnowing match index: cross-batch fingerprint matches
  * against the persisted posting index, the df-so-far boilerplate cut,
  * and — the load-bearing law — exact parity with the batch
  * [[TextAnalysis.winnowingPairs]] on the cross-split pair subset when
  * the first batch produces no matches (then every doc is indexed, so
  * df-so-far at batch 2 IS the whole-corpus df the batch twin uses). */
class StreamingWinnowSpec extends SparkSpec {

  private def cleanup(base: String): Unit = {
    import scala.jdk.CollectionConverters._
    val p = java.nio.file.Paths.get(base)
    java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
      .foreach(java.nio.file.Files.deleteIfExists(_))
  }

  test("cross-batch match flags the copy, keeps it out of the index, prunes by fp_bucket") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_swin_").toString
    val input = MemoryStream[(Long, String)]
    val q = StreamingWinnow.start(
      input.toDS().toDF("doc_id", "text"), textCol = "text", idCol = "doc_id",
      indexDir = s"$base/index", matchDir = s"$base/matches",
      checkpoint = s"$base/ckpt")
    try {
      val textA = "the quick brown fox jumps over the lazy dog again and again today"
      val textB = "completely different content with many unrelated words inside here now"
      input.addData((1L, textA), (2L, textB))
      q.processAllAvailable()

      // batch 2: doc 3 copies doc 1 (match), doc 4 is new, doc 5 is too
      // short for any (k=3, w=6) fingerprint, doc 6 has NULL text —
      // neither may crash the prune collect nor be indexed
      input.addData((3L, textA),
        (4L, "yet another brand new piece of text entirely written fresh"),
        (5L, "too short"),
        (6L, null: String))
      q.processAllAvailable()

      val matches = spark.read.parquet(s"$base/matches")
        .select("new_id", "matched_id").as[(Long, Long)].collect().toSet
      assert(matches === Set((3L, 1L)))

      val indexed = spark.read.parquet(s"$base/index")
        .select("doc_id").distinct().as[Long].collect().toSet
      assert(indexed === Set(1L, 2L, 4L))

      // layout: fp_bucket=* partition dirs, and a bucket predicate
      // lands in PartitionFilters (directory pruning), the property
      // every micro-batch's pruned read relies on
      val dirs = new java.io.File(s"$base/index").listFiles()
        .filter(_.isDirectory).map(_.getName)
      assert(dirs.nonEmpty && dirs.forall(_.startsWith("fp_bucket=")), dirs.toSeq)
      val one = spark.read.parquet(s"$base/index")
        .filter(col("fp_bucket") === 7)
      val plan = one.queryExecution.executedPlan.toString
      val pf = "PartitionFilters: \\[[^\\]]*".r.findFirstIn(plan).getOrElse("")
      assert(pf.contains("fp_bucket"),
        s"fp_bucket must prune partitions, not filter rows:\n$plan")
    } finally { q.stop(); cleanup(base) }
  }

  test("df-so-far boilerplate cut: a fingerprint shared too widely stops matching") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_swin_df_").toString
    val input = MemoryStream[(Long, String)]
    val boiler = "all rights reserved to the original author of this very document"
    val q = StreamingWinnow.start(
      input.toDS().toDF("doc_id", "text"), textCol = "text", idCol = "doc_id",
      indexDir = s"$base/index", matchDir = s"$base/matches",
      checkpoint = s"$base/ckpt", maxDf = 3)
    try {
      // batch 1: FOUR identical docs — intra-batch pairs are not
      // matched, all four index; their fps now have df 4 > maxDf 3
      input.addData((1L, boiler), (2L, boiler), (3L, boiler), (4L, boiler))
      q.processAllAvailable()
      // batch 2: a fifth copy — every shared fp has df-so-far 5 > 3,
      // so NOTHING matches despite verbatim duplication, and the doc
      // is admitted to the index as a non-match
      input.addData((5L, boiler))
      q.processAllAvailable()
      val matches = spark.read.parquet(s"$base/matches")
        .select("new_id").as[Long].collect()
      assert(matches.isEmpty, matches.toSeq)
      val indexed = spark.read.parquet(s"$base/index")
        .select("doc_id").distinct().as[Long].collect().toSet
      assert(indexed === Set(1L, 2L, 3L, 4L, 5L))
    } finally { q.stop(); cleanup(base) }
  }

  test("parity: streaming matches == batch winnowingPairs on the cross-split subset") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("text"))
    val rows = docs.as[(Long, String)].collect().toSeq
    val (first, second) = rows.partition(_._1 % 2 == 0)

    val base = java.nio.file.Files.createTempDirectory("graft_swin_par_").toString
    val input = MemoryStream[(Long, String)]
    val q = StreamingWinnow.start(
      input.toDS().toDF("doc_id", "text"), textCol = "text", idCol = "doc_id",
      indexDir = s"$base/index", matchDir = s"$base/matches",
      checkpoint = s"$base/ckpt", k = 3, w = 6, minShared = 2L, maxDf = 10)
    try {
      input.addData(first: _*)
      q.processAllAvailable()
      // parity precondition: batch 1 produced no matches (index was
      // empty), so EVERY batch-1 doc is indexed and df-so-far at batch
      // 2 is the whole-corpus df — exactly the batch twin's cut
      assert(spark.read.parquet(s"$base/matches").count() === 0L,
        "parity law needs a match-free first batch on this corpus")
      input.addData(second: _*)
      q.processAllAvailable()

      val streamed = spark.read.parquet(s"$base/matches")
        .select("new_id", "matched_id", "shared_fps")
        .as[(Long, Long, Long)].collect()
        .map { case (n, m, s) => (math.min(n, m), math.max(n, m), s) }.toSet

      val firstIds = first.map(_._1).toSet
      val batchPairs = TextAnalysis.winnowingPairs(
          docs, col("doc_id"), col("text"),
          k = 3, w = 6, minShared = 2L, maxDf = 10)
        .as[(Long, Long, Long)].collect()
        .filter { case (a, b, _) => firstIds.contains(a) != firstIds.contains(b) }
        .map { case (a, b, s) => (math.min(a, b), math.max(a, b), s) }.toSet

      assert(streamed.nonEmpty,
        "parity run found no cross-split pairs — corpus or split no longer exercises the law")
      assert(streamed === batchPairs)
    } finally { q.stop(); cleanup(base) }
  }
}
