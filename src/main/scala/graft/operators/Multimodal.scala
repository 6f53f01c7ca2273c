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
  * metadata extraction as pure expressions. IMAGE payloads decode and
  * resize for REAL via the JDK's own `javax.imageio` codecs
  * (PNG/JPEG/BMP/GIF — zero extra dependencies); payloads the JDK
  * cannot decode (text blobs, audio/video this container has no codec
  * for) fall back to the deterministic [[decodeStub]]/[[resizeStub]]
  * byte-level paths so the pipeline stays total.
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
    * columns.
    *
    * ORACLE SCOPE: the pseudo attributes hash `payload.cast(string)`,
    * which is exact (and DuckDB-reproducible) only for UTF-8-safe
    * payloads — i.e. [[withPayload]]'s text wrapping, which is all the
    * engine's queries use. Raw image/audio bytes decode invalid UTF-8
    * as U+FFFD on the JVM (distinct payloads can collide) while DuckDB
    * ERRORS on the blob cast; for real binary, derive pseudo attrs
    * from `content_md5` instead. byte_len/content_md5 are exact for
    * any payload. */
  def withPayloadMeta(df: DataFrame): DataFrame = {
    val ph = polyHash(col("payload").cast("string"))
    df.withColumn("byte_len", length(col("payload")).cast("long"))
      .withColumn("content_md5", md5(col("payload")))
      .withColumn("fake_width", (lit(64L) + pmod(ph, lit(1857L))).cast("long"))
      .withColumn("fake_height", (lit(64L) + pmod(longDiv(ph, 1857L), lit(1017L))).cast("long"))
      .withColumn("fake_n_frames", (lit(1L) + pmod(ph, lit(30L))).cast("long"))
  }

  /** Decoded-frame feature schema produced by [[decodeFeatures]].
    * `is_image`/`width`/`height`/`mean_lum` come from the real
    * [[decodeImage]] path (zeros for non-image payloads); `mean_byte`
    * is always the raw-byte mean so text payloads keep their oracle
    * semantics regardless of codec dispatch. */
  val DecodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("mean_byte", DoubleType, nullable = false),
    StructField("is_image", BooleanType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("mean_lum", DoubleType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false),
      nullable = false)))

  /** REAL image decoder on the JDK's own codecs: `javax.imageio`
    * reads PNG/JPEG/BMP/GIF with zero extra dependencies. Returns
    * (width, height, mean luminance 0-255, 8-dim feature) or None when
    * the bytes are not a decodable image (caller falls back to
    * [[decodeStub]]). The feature packs per-channel means (R,G,B),
    * 2x2 quadrant luminance means, and the luminance std — all in
    * [0,1], deterministic for a given payload.
    *
    * The reference's feature-extraction consumer
    * (`ExtractFeature.java:33-116`) computes exactly this kind of
    * per-record numeric summary; here the record is a media payload. */
  /** Shared decode preamble of [[decodeImage]] and [[resizeImage]]:
    * short/corrupt/undecodable payloads are None, never a job failure.
    * One copy — a hardening change (e.g. a decoded-dimension cap) must
    * hit both paths or they silently diverge. */
  private def tryDecode(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    if (bytes.length < 4) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null } // corrupt payload ≠ job failure
    if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
    else Some(img)
  }

  private[operators] def decodeImage(bytes: Array[Byte])
      : Option[(Int, Int, Double, Array[Float])] = tryDecode(bytes).map { img =>
    {
      val w = img.getWidth; val h = img.getHeight
      var sr = 0.0; var sg = 0.0; var sb = 0.0
      val quad = new Array[Double](4); val quadN = new Array[Long](4)
      var sumLum = 0.0; var sumLum2 = 0.0
      // row-bulk pixel fetch: per-pixel getRGB(x, y) does a bounds-
      // checked SampleModel read + ColorModel conversion per CALL — the
      // slowest BufferedImage path, in the per-payload hot loop; one
      // getRGB row call amortizes the conversion across the row
      val rowBuf = new Array[Int](w)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, rowBuf, 0, w)
        var x = 0
        while (x < w) {
          val rgb = rowBuf(x)
          val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
          val lum = 0.299 * r + 0.587 * g + 0.114 * b
          sr += r; sg += g; sb += b
          sumLum += lum; sumLum2 += lum * lum
          val qi = (if (y * 2 >= h) 2 else 0) + (if (x * 2 >= w) 1 else 0)
          quad(qi) += lum; quadN(qi) += 1
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      val meanLum = sumLum / n
      val std = math.sqrt(math.max(0.0, sumLum2 / n - meanLum * meanLum))
      val feat = Array(
        (sr / n / 255.0).toFloat, (sg / n / 255.0).toFloat, (sb / n / 255.0).toFloat,
        (if (quadN(0) > 0) quad(0) / quadN(0) / 255.0 else 0.0).toFloat,
        (if (quadN(1) > 0) quad(1) / quadN(1) / 255.0 else 0.0).toFloat,
        (if (quadN(2) > 0) quad(2) / quadN(2) / 255.0 else 0.0).toFloat,
        (if (quadN(3) > 0) quad(3) / quadN(3) / 255.0 else 0.0).toFloat,
        (std / 255.0).toFloat)
      (w, h, meanLum, feat)
    }
  }

  /** Raw-byte mean in one allocation-free pass (the hot decode path
    * sees every payload byte exactly once here). */
  private[operators] def rawByteMean(bytes: Array[Byte]): Double =
    if (bytes.isEmpty) 0.0
    else {
      var s = 0.0; var i = 0
      while (i < bytes.length) { s += (bytes(i) & 0xff); i += 1 }
      s / bytes.length
    }

  /** Fallback decoder for non-image payloads (text/audio blobs this
    * container has no codec for): derives a deterministic 8-dim
    * "feature" from the raw bytes so the pipeline shape stays total. */
  private[operators] def decodeStub(bytes: Array[Byte]): Array[Float] = {
    // one pass, LONG accumulators: an Int sum overflows past ~134 MB of
    // payload (25M sampled bytes x ~127) and Scala's % keeps the sign —
    // negative "features" outside the [0,1] contract. Long holds ~7 PB.
    val sums = new Array[Long](8)
    var i = 0
    while (i < bytes.length) {
      sums(i % 8) += (bytes(i) & 0xff).toLong
      i += 1
    }
    Array.tabulate(8)(d => (sums(d) % 997L).toFloat / 997.0f)
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

  /** Cross-document frame-level duplication stats — the video/image
    * dedup shape at FRAME granularity: a clip re-encoded into two
    * documents shares frame digests even when the containers differ,
    * and a corpus-wide digest census finds it without ever comparing
    * payloads pairwise. Per document: sampled-frame count, how many
    * of its frames also occur in ≥ `minDocs` OTHER documents (digest
    * seen in > that many distinct docs), and the shared fraction —
    * the per-doc gate a curation pipeline thresholds on.
    *
    * Exactness: everything is digest-equality counting — no floats
    * until the final fraction (one division, r(6)). Scale shape: one
    * hash aggregation per digest (distinct-doc count collapses in
    * Spark's two-level distinct aggregate), an equality join back on
    * the digest (the frame table arrives hash-partitioned on it), and
    * the per-doc rollup. Zero-length frames cannot exist (the sampler
    * emits none for empty payloads); NULL digests (NULL payload rows)
    * drop.
    *
    * Input: a [[frameSample]]-shaped table. Returns (doc_id,
    * n_frames, n_shared, shared_frac) per document. */
  def frameDupStats(frames: DataFrame, minDocs: Int = 1): DataFrame = {
    require(minDocs >= 1, s"minDocs must be >= 1: $minDocs")
    val ok = frames.filter(col("frame_md5").isNotNull)
      .select(col("doc_id"), col("frame_md5"))
    val census = ok.groupBy(col("frame_md5"))
      .agg(countDistinct(col("doc_id")).as("_ndocs"))
    ok.join(census, "frame_md5")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("_ndocs") > minDocs, 1L).otherwise(0L)).as("n_shared"))
      .select(col("doc_id"), col("n_frames"), col("n_shared"),
        r(col("n_shared").cast("double") / col("n_frames").cast("double"), 6)
          .as("shared_frac"))
  }

  /** Resized-payload schema produced by [[resize]]. `codec` records
    * which path handled each row: "imageio" (real decode → scale →
    * PNG re-encode) or "stride" (non-image byte-decimation fallback). */
  val ResizedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("src_len", LongType, nullable = false),
    StructField("codec", StringType, nullable = false),
    StructField("resized", BinaryType, nullable = false),
    StructField("resized_len", LongType, nullable = false),
    StructField("resized_md5", StringType, nullable = false)))

  /** REAL image resize on JDK codecs: decode via `javax.imageio`,
    * nearest-neighbor scale to targetW×targetH on a `Graphics2D`
    * (explicit `RenderingHints` so the kernel is deterministic, not
    * implementation-chosen), re-encode as PNG. None when the payload
    * is not a decodable image. */
  private[operators] def resizeImage(bytes: Array[Byte], targetW: Int,
                                     targetH: Int): Option[Array[Byte]] =
    tryDecode(bytes).map { img =>
    {
      val out = new java.awt.image.BufferedImage(
        targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
        g.drawImage(img, 0, 0, targetW, targetH, null)
      } finally g.dispose()
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", baos)
      baos.toByteArray
    }
  }

  /** Fallback resizer for non-image payloads: deterministic byte
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

  /** Shared input preparation of the per-row codec operators:
    *  - rows whose id is NULL (or casts to null — a non-numeric string
    *    id) are DROPPED, the same missing-identity law as null
    *    payloads decoding to empty; left in, Row.getLong would NPE
    *    mid-task and the non-nullable output schemas could not carry
    *    them anyway;
    *  - the projected input is SPREAD across the session's parallelism
    *    first (OpUtils.materialize): a single-file scan would
    *    otherwise run every ImageIO decode on ONE task — the exact
    *    pathology the barrier exists for. */
  private def multimodalInput(df: DataFrame, idCol: String): DataFrame =
    OpUtils.materialize(
      df.select(col(idCol).cast("long").as("doc_id"), col("payload"))
        .filter(col("doc_id").isNotNull))

  /** Partition-batched resize over binary payloads — one codec context
    * per partition, rows streamed through it. Image payloads take the
    * real [[resizeImage]] path (JDK `javax.imageio` + `Graphics2D`);
    * anything the JDK codecs reject falls back to the deterministic
    * [[resizeStub]] decimation. No shuffle; payload bytes never touch
    * the driver. */
  def resize(df: DataFrame, targetW: Int, targetH: Int,
             idCol: String = "doc_id"): DataFrame = {
    require(targetW > 0 && targetH > 0,
      s"target dims must be positive: ${targetW}x$targetH")
    require(targetW.toLong * targetH <= Int.MaxValue,
      s"target pixel count overflows Int: ${targetW}x$targetH — " +
        "the stub would allocate a negative-sized array and the image " +
        "path a multi-gigapixel buffer")
    val outLen = targetW * targetH
    val input = multimodalInput(df, idCol)
    implicit val enc = RowEncoder.encoderFor(ResizedSchema)
    input.mapPartitions { rows =>
      // per-partition codec init: no ImageIO disk-cache temp files on
      // executors (pure in-memory streams), one digest instance reused
      javax.imageio.ImageIO.setUseCache(false)
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { row =>
        val id = row.getLong(0)
        val bytes = Option(row.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        val (codec, resized) = resizeImage(bytes, targetW, targetH) match {
          case Some(png) => ("imageio", png)
          case None      => ("stride", resizeStub(bytes, outLen))
        }
        md.reset()
        val digest = md.digest(resized).map("%02x".format(_)).mkString
        Row(id, bytes.length.toLong, codec, resized, resized.length.toLong, digest)
      }
    }
  }

  /** Partition-batched decode: one decoder context per partition, rows
    * streamed through it — the Spark-idiomatic shape for expensive
    * per-row native calls (never a per-row UDF re-initializing codecs).
    * Image payloads decode for real via [[decodeImage]]; non-image
    * payloads keep the deterministic [[decodeStub]] features. */
  def decodeFeatures(df: DataFrame,
                     idCol: String = "doc_id"): DataFrame = {
    val input = multimodalInput(df, idCol)
    implicit val enc = RowEncoder.encoderFor(DecodedSchema)
    input.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { row =>
        val id = row.getLong(0)
        // null payload (e.g. encode of a null text) decodes as empty
        val bytes = Option(row.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        // mean_byte stays the raw-byte mean on BOTH paths (oracle-stable)
        val rawMean = rawByteMean(bytes)
        decodeImage(bytes) match {
          case Some((w, h, meanLum, feat)) =>
            Row(id, bytes.length.toLong, rawMean, true, w.toLong, h.toLong,
              meanLum, feat)
          case None =>
            Row(id, bytes.length.toLong, rawMean, false, 0L, 0L, 0.0,
              decodeStub(bytes))
        }
      }
    }
  }
}
