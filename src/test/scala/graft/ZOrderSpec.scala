package graft

import org.apache.spark.sql.functions._
import graft.sources.{Tables, ZOrder}

/** Z-order layout: Morton-code bit math, lossless rewrite, and the
  * property the layout exists for — per-file bounding boxes small in
  * BOTH dimensions at once (what parquet min/max stats prune on). */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleaveBits: known Morton codes") {
    // x=0b11, y=0b01 → bits of x at even positions, y at odd:
    // z = x0 + 2·y0 + 4·x1 + 8·y1 = 1 + 2 + 4 + 0 = 7
    val got = Seq((3L, 1L)).toDF("x", "y")
      .select(ZOrder.interleaveBits(Seq(col("x"), col("y")), bitsPer = 2))
      .as[Long].head()
    assert(got == 7L)
    // single column degenerates to the identity on bitsPer bits
    val id = Seq(13L).toDF("x")
      .select(ZOrder.interleaveBits(Seq(col("x")), bitsPer = 8))
      .as[Long].head()
    assert(id == 13L)
  }

  test("interleaveBits rejects > 63 interleaved bits") {
    intercept[IllegalArgumentException] {
      ZOrder.interleaveBits(Seq(col("a"), col("b"), col("c"), col("d")),
        bitsPer = 16)
    }
  }

  test("gridScale clamps to the grid and sends NULL to the min corner") {
    val got = Seq(Some(0.0), Some(5.0), Some(10.0), None)
      .toDF("v")
      .select(ZOrder.gridScale(col("v"), 0.0, 10.0, bitsPer = 4))
      .as[Long].collect().toSeq
    assert(got == Seq(0L, 7L, 15L, 0L))
  }

  test("z-ordered rewrite is lossless and clusters both dimensions per file") {
    val li = Tables.load(spark, sf("sf0.001"), "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_zorder_spec_")
    try {
      ZOrder.writeZOrdered(li, tmp.toString,
        zCols = Seq("l_partkey", "l_suppkey"), numFiles = 8)
      val back = spark.read.parquet(tmp.toString)
      // lossless: same multiset of rows
      assert(back.count() == li.count())
      assert(back.exceptAll(li).count() == 0 && li.exceptAll(back).count() == 0)

      // clustering: average per-file bounding-box AREA in (partkey ×
      // suppkey) space must be far below the full domain's area — the
      // defining property Morton layout buys and a hash/random layout
      // lacks (every file there spans ~the whole domain, ratio ≈ 1).
      val files = back.inputFiles
      assert(files.length > 1, "need multiple files to measure clustering")
      val (gLoP, gHiP, gLoS, gHiS) = li.agg(
        min("l_partkey").cast("double"), max("l_partkey").cast("double"),
        min("l_suppkey").cast("double"), max("l_suppkey").cast("double"))
        .as[(Double, Double, Double, Double)].head()
      val domainArea = (gHiP - gLoP) * (gHiS - gLoS)
      val areas = files.map { f =>
        val (loP, hiP, loS, hiS) = spark.read.parquet(f).agg(
          min("l_partkey").cast("double"), max("l_partkey").cast("double"),
          min("l_suppkey").cast("double"), max("l_suppkey").cast("double"))
          .as[(Double, Double, Double, Double)].head()
        (hiP - loP) * (hiS - loS)
      }
      val avgRatio = areas.map(_ / domainArea).sum / areas.length
      assert(avgRatio < 0.5,
        f"files must own small 2-D boxes; avg box/domain area = $avgRatio%.3f")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
