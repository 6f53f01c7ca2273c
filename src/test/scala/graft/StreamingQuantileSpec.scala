package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Sampling
import graft.streaming.StreamingQuantile

/** Batch parity for the incremental quantile normalizer: after N
  * micro-batches the persisted tick-cell state must score the ingested
  * rows EXACTLY as [[Sampling.quantileNormalizeBinned]] scores the
  * ingested corpus — same shared derivation core, so parity is by
  * construction, and this pins it on a messy stream: NULL strata (a
  * group, not dropped), NULL scores (dropped), tick-tied values,
  * singleton strata (NULL pct/normalized), and the off-grid scale-4
  * grid. Also the protocol laws: a ghost (uncommitted) delta stays
  * invisible, and mid-stream reads are the batch answer over the
  * prefix alone (incrementality, not a final-state coincidence). */
class StreamingQuantileSpec extends SparkSpec {

  private def slurp(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.select("id", "stratum", "score", "pct", "normalized")
      .collect().map(_.toSeq).toSet

  test("cell state after 3 micro-batches scores the ingested rows " +
      "exactly like the batch operator; ghost deltas stay invisible") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    def lcg(x: Long) = x * 6364136223846793005L + 1442695040888963407L
    val rows: Seq[(Long, Option[String], Option[Double])] =
      (1L to 240L).map { i =>
        val h = lcg(i)
        val g = math.floorMod(h, 5L) match {
          case 0L => Option.empty[String]          // NULL stratum group
          case k  => Option(s"s$k")
        }
        val x =
          if (math.floorMod(lcg(h), 17L) == 0L) Option.empty[Double]
          else Option(math.floorMod(lcg(h), 400L) / 8.0 - 20.0) // tick ties
        (i, g, x)
      } :+ ((241L, Option("lone"), Option(3.25))) // singleton stratum

    val cfg = StreamingQuantile.Config(scale = 4L)
    val base = java.nio.file.Files.createTempDirectory("graft_squant_").toString
    val dir = s"$base/cells"
    val input = MemoryStream[(Long, Option[String], Option[Double])]
    val q = StreamingQuantile.start(
      input.toDS().toDF("id", "g", "x"), "g", "x",
      dir, s"$base/ckpt", cfg)
    try {
      val batches = Seq(rows.slice(0, 90), rows.slice(90, 180),
        rows.slice(180, rows.length))

      def streamed(upTo: Seq[(Long, Option[String], Option[Double])]) =
        slurp(StreamingQuantile.normalize(spark, dir,
          upTo.toDF("id", "g", "x"),
          col("id"), col("g"), col("x"), cfg))
      def batch(upTo: Seq[(Long, Option[String], Option[Double])]) =
        slurp(Sampling.quantileNormalizeBinned(
          upTo.toDF("id", "g", "x"),
          col("id"), col("g"), col("x"), scale = 4L))

      // mid-stream: prefix parity (incrementality)
      input.addData(batches.head: _*)
      q.processAllAvailable()
      assert(streamed(batches.head) === batch(batches.head))

      batches.tail.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      assert(streamed(rows) === batch(rows))

      // ghost-delta law: an uncommitted ingest_batch directory (a
      // crash between delta write and marker) must not leak counts
      val before = streamed(rows)
      Seq(("s1", 999.0, 1000000L)).toDF("_g", "_t", "_n")
        .write.parquet(s"$dir/ingest_batch=999")
      assert(streamed(rows) === before,
        "a ghost (uncommitted) delta leaked into the cell sums")
    } finally q.stop()
  }

  test("a non-string stratum column is keyed as STRING — the persisted " +
      "cell key type — on both ingest and scoring") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    // integer strata: pre-fix, normalize() passed the raw int column
    // into the null-safe join against the string `_g` cells (implicit
    // coercion territory) and emitted an int stratum; both sides must
    // instead behave as if the caller had cast to string
    val rows: Seq[(Long, Option[Int], Option[Double])] =
      (1L to 60L).map { i =>
        val g = if (i % 7 == 0) Option.empty[Int] else Option((i % 3).toInt)
        val x = if (i % 11 == 0) Option.empty[Double] else Option(i / 4.0)
        (i, g, x)
      }

    val cfg = StreamingQuantile.Config(scale = 4L)
    val base = java.nio.file.Files.createTempDirectory("graft_squant_i_").toString
    val dir = s"$base/cells"
    val input = MemoryStream[(Long, Option[Int], Option[Double])]
    val q = StreamingQuantile.start(
      input.toDS().toDF("id", "g", "x"), "g", "x",
      dir, s"$base/ckpt", cfg)
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      val out = StreamingQuantile.normalize(spark, dir,
        rows.toDF("id", "g", "x"), col("id"), col("g"), col("x"), cfg)
      assert(out.schema("stratum").dataType ===
        org.apache.spark.sql.types.StringType)
      assert(slurp(out) === slurp(Sampling.quantileNormalizeBinned(
        rows.toDF("id", "g", "x"),
        col("id"), col("g").cast("string"), col("x"), scale = 4L)))
    } finally q.stop()
  }
}
