package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.GraftFunctions._

/** Multimodal-column plumbing (`SURVEY.md` §2 H): image/audio/video
  * payloads as opaque `binary` columns with typed metadata, plus the
  * distributed decode/feature-extract scaffolding.
  *
  * The Spark-side architecture is real and tested: binary columns,
  * explicit result schema, partition-batched iteration via
  * `mapPartitions` (the JVM analogue of arrow-batched UDFs — one
  * decoder init per partition, not per row), and deterministic
  * metadata extraction as pure expressions. The actual codec call is
  * STUBBED (no image/audio libraries in this container): see
  * [[decodeStub]], which derives deterministic fake pixel features
  * from the payload bytes. Swapping in a real decoder changes only
  * that one function.
  *
  * 100 TB notes: payloads stay distributed end to end; decode is a
  * per-partition map with no shuffle; metadata-only queries never
  * deserialize payload bytes thanks to parquet column pruning.
  */
object Multimodal {

  /** Wrap a text/blob column as a binary payload column (in real use
    * the payload arrives as parquet/avro binary already). */
  def withPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8"))

  /** Expression-level metadata over the payload: byte length, content
    * digest, and deterministic pseudo decode attributes (stand-ins for
    * width/height/frames until a real decoder is plugged in). Pure
    * columns — oracle-reproducible. */
  def withPayloadMeta(df: DataFrame): DataFrame = {
    val ph = polyHash(col("payload").cast("string"))
    df.withColumn("byte_len", length(col("payload")).cast("long"))
      .withColumn("content_md5", md5(col("payload")))
      .withColumn("fake_width", (lit(64L) + pmod(ph, lit(1857L))).cast("long"))
      .withColumn("fake_height", (lit(64L) + pmod(longDiv(ph, 1857L), lit(1017L))).cast("long"))
      .withColumn("fake_n_frames", (lit(1L) + pmod(ph, lit(30L))).cast("long"))
  }

  /** Decoded-frame feature schema produced by [[decodeFeatures]]. */
  val DecodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("mean_byte", DoubleType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false),
      nullable = false)))

  /** STUB decoder: a real implementation would call an image/audio
    * codec here (libjpeg / ffmpeg / soundfile). This container has no
    * media libraries, so it derives a deterministic 8-dim "feature"
    * from the raw bytes — the distributed plumbing around it (batching,
    * schema, encoders) is exactly what a real decoder needs. */
  private[operators] def decodeStub(bytes: Array[Byte]): (Double, Array[Float]) = {
    if (bytes.isEmpty) (0.0, Array.fill(8)(0.0f))
    else {
      val mean = bytes.map(b => (b & 0xff).toDouble).sum / bytes.length
      val feat = Array.tabulate(8) { i =>
        val slice = bytes.iterator.drop(i).sliding(1, 8).flatten
        (slice.map(b => (b & 0xff).toInt).sum % 997).toFloat / 997.0f
      }
      (mean, feat)
    }
  }

  /** Frame sampling over a binary payload: treat the payload as a
    * sequence of `frameBytes`-sized frames and keep every `everyN`-th
    * one (a video keyframe-sampling shape), as pure codegen'd
    * expressions — integer frame count, stepped `sequence`, `explode`,
    * binary `substr` slice, digest. No UDF, no shuffle; one output row
    * per sampled frame with (frame_idx, frame, frame_len, frame_md5).
    * The trailing partial frame is kept (its `frame_len` is short). */
  def frameSample(df: DataFrame, frameBytes: Int, everyN: Int): DataFrame = {
    require(frameBytes > 0 && everyN > 0, s"frameBytes ($frameBytes) and everyN ($everyN) must be positive")
    val nf = longDiv(
      length(col("payload")).cast("long") + (frameBytes - 1).toLong,
      frameBytes.toLong)
    df.withColumn("_nf", nf)
      .withColumn("frame_idx", explode(when(col("_nf") > 0,
          sequence(lit(0L), col("_nf") - 1, lit(everyN.toLong)))
        .otherwise(array().cast("array<long>"))))
      .withColumn("frame", col("payload").substr(
        (col("frame_idx") * frameBytes + 1).cast("int"), lit(frameBytes)))
      .withColumn("frame_len", length(col("frame")).cast("long"))
      .withColumn("frame_md5", md5(col("frame")))
      .drop("_nf")
  }

  /** Resized-payload schema produced by [[resize]]. */
  val ResizedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("src_len", LongType, nullable = false),
    StructField("resized", BinaryType, nullable = false),
    StructField("resized_len", LongType, nullable = false),
    StructField("resized_md5", StringType, nullable = false)))

  /** STUB resizer: a real implementation decodes, scales to
    * targetW×targetH, and re-encodes. Here: deterministic byte
    * decimation to (at most) targetW·targetH bytes — stride sampling,
    * the 1-D shape of nearest-neighbor downscaling. Empty/short
    * payloads pass through whole. */
  private[operators] def resizeStub(bytes: Array[Byte], outLen: Int): Array[Byte] =
    if (bytes.length <= outLen) bytes
    else {
      val out = new Array[Byte](outLen)
      var i = 0
      while (i < outLen) {
        out(i) = bytes(((i.toLong * bytes.length) / outLen).toInt)
        i += 1
      }
      out
    }

  /** Partition-batched resize over binary payloads — the same
    * one-codec-context-per-partition `mapPartitions` shape as
    * [[decodeFeatures]]; only [[resizeStub]] changes when a real
    * image library is available. No shuffle; payload bytes never
    * touch the driver. */
  def resize(spark: SparkSession, df: DataFrame,
             targetW: Int, targetH: Int,
             idCol: String = "doc_id"): DataFrame = {
    require(targetW > 0 && targetH > 0,
      s"target dims must be positive: ${targetW}x$targetH")
    val outLen = targetW * targetH
    val input = df.select(col(idCol).cast("long").as("doc_id"), col("payload"))
    implicit val enc = RowEncoder.encoderFor(ResizedSchema)
    input.mapPartitions { rows =>
      // real resizer: initialize the codec context here, once per partition
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { row =>
        val id = row.getLong(0)
        val bytes = Option(row.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        val resized = resizeStub(bytes, outLen)
        md.reset()
        val digest = md.digest(resized).map("%02x".format(_)).mkString
        Row(id, bytes.length.toLong, resized, resized.length.toLong, digest)
      }
    }
  }

  /** Partition-batched decode: one decoder context per partition, rows
    * streamed through it — the Spark-idiomatic shape for expensive
    * per-row native calls (never a per-row UDF re-initializing codecs). */
  def decodeFeatures(spark: SparkSession, df: DataFrame,
                     idCol: String = "doc_id"): DataFrame = {
    val input = df.select(col(idCol).cast("long").as("doc_id"), col("payload"))
    implicit val enc = RowEncoder.encoderFor(DecodedSchema)
    input.mapPartitions { rows =>
      // real decoder: initialize codec context here, once per partition
      rows.map { row =>
        val id = row.getLong(0)
        // null payload (e.g. encode of a null text) decodes as empty
        val bytes = Option(row.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        val (mean, feat) = decodeStub(bytes)
        Row(id, bytes.length.toLong, mean, feat)
      }
    }
  }
}
