package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Graph
import graft.streaming.StreamingGraph

/** Incremental graph shape: after N micro-batches the persisted
  * canonical edge state must yield EXACTLY the batch degree histogram
  * and CSN tail exponent over the full link stream — the batch-parity
  * proof that the canonical edge set is sufficient state and that the
  * shared derivation cores see no difference between the two paths.
  * The stream gets the messy input on purpose: duplicate edges WITHIN
  * and ACROSS batches, reversed duplicates, self-loops, and a NULL
  * endpoint — all of which the one shared canonicalization site must
  * collapse or drop identically on both paths. */
class StreamingGraphSpec extends SparkSpec {

  private def slurp(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("edge state after 3 micro-batches == batch histogram + alpha; " +
      "cross-batch duplicates collapse; ghost batches stay invisible") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    def lcg(x: Long) = x * 6364136223846793005L + 1442695040888963407L
    val base0 = (1L to 300L).map { i =>
      val h = lcg(i)
      (Option(math.floorMod(h, 40L)), Option(math.floorMod(lcg(h), 40L)))
    }
    val rows: Seq[(Option[Long], Option[Long])] =
      base0 ++
        base0.take(60).map { case (a, b) => (b, a) } ++ // reversed dups
        Seq((Option(7L), Option(7L)),                   // self-loop
          (Option.empty[Long], Option(5L)))             // null endpoint
    // batches OVERLAP (a re-crawled page re-emits its links): the
    // cross-batch dedup is exactly what the anti-join + reader
    // distinct must absorb
    val batches = Seq(rows.slice(0, 150), rows.slice(100, 260),
      rows.slice(220, rows.length) ++ rows.slice(0, 30))

    val base = java.nio.file.Files.createTempDirectory("graft_sgraph_").toString
    val dir = s"$base/edges"
    val input = MemoryStream[(Option[Long], Option[Long])]
    val q = StreamingGraph.start(
      input.toDS().toDF("src", "dst"), "src", "dst",
      dir, s"$base/ckpt", StreamingGraph.Config(bucketMod = 8))
    try {
      // mid-stream: after batch 0 the derived views equal the batch
      // operators over batch 0's rows alone (incrementality, not a
      // final-state coincidence)
      input.addData(batches.head: _*)
      q.processAllAvailable()
      val firstDf = batches.head.toDF("src", "dst")
      assert(slurp(StreamingGraph.degreeHistogram(spark, dir)) ===
        slurp(Graph.degreeHistogram(firstDf, col("src"), col("dst"))))

      batches.tail.foreach { p => input.addData(p: _*); q.processAllAvailable() }
      val allDf = rows.toDF("src", "dst")
      assert(slurp(StreamingGraph.degreeHistogram(spark, dir)) ===
        slurp(Graph.degreeHistogram(allDf, col("src"), col("dst"))))
      assert(slurp(StreamingGraph.powerLawAlpha(spark, dir, dMin = 2)) ===
        slurp(Graph.powerLawAlpha(allDf, col("src"), col("dst"), dMin = 2)))

      // the canonical edge set is sufficient state for the WHOLE batch
      // graph family, not just the degree pair: the triangle census
      // and the k-core peel derive through the same extracted cores
      // and must match the batch operators row for row
      assert(slurp(StreamingGraph.triangleStats(spark, dir)) ===
        slurp(Graph.triangleStats(allDf, col("src"), col("dst"))))
      assert(slurp(StreamingGraph.kCore(spark, dir, k = 3)) ===
        slurp(Graph.kCore(allDf, col("src"), col("dst"), k = 3)))
      assert(slurp(StreamingGraph.localClustering(spark, dir, k = 5)) ===
        slurp(Graph.localClustering(allDf, col("src"), col("dst"), k = 5)))

      // state growth law: the persisted rows (pre-distinct) must not
      // exceed the DISTINCT canonical edge count — the anti-join
      // keeps re-emitted edges out of state, however many batches
      // re-send them
      val stateRows = spark.read.schema(StreamingGraph.EdgesSchema)
        .parquet(dir).count()
      val distinctEdges = Graph
        .canonicalEdges(allDf, col("src"), col("dst")).count()
      assert(stateRows === distinctEdges,
        s"state carries $stateRows rows for $distinctEdges distinct edges")

      // reader-distinct contract: a double-appended state row (what a
      // crash between append and marker leaves on replay) carries a
      // COMMITTED id and must change nothing
      val before = slurp(StreamingGraph.degreeHistogram(spark, dir))
      spark.read.schema(StreamingGraph.EdgesSchema).parquet(dir).limit(5)
        .withColumn("ingest_batch", lit(0L))
        .write.mode("append").partitionBy("bucket").parquet(dir)
      assert(slurp(StreamingGraph.degreeHistogram(spark, dir)) === before)

      // committed-prefix contract: NEW edges from a batch with no
      // marker (appended, then crashed before commit) are invisible
      Seq((999L, 998L, 7L, 999L)).toDF("a", "b", "bucket", "ingest_batch")
        .write.mode("append").partitionBy("bucket").parquet(dir)
      assert(slurp(StreamingGraph.degreeHistogram(spark, dir)) === before,
        "a ghost (uncommitted) batch's edges leaked into the histogram")
    } finally q.stop()
  }
}
