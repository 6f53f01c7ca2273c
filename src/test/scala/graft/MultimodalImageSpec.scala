package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import graft.operators.Multimodal

/** Real-codec multimodal path: PNGs are synthesized IN-TEST (pixel
  * formulas, no fixtures), decoded and resized DISTRIBUTED through the
  * `mapPartitions` operators, and the resulting width/height/pixel
  * stats are asserted against values computed directly from the same
  * pixel formulas — proving the `javax.imageio` path does real decoding,
  * not byte games. */
class MultimodalImageSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic gradient image: pixel(x,y) = rgb(x*6%256, y*10%256, (x+y)%256). */
  private def gradientPng(w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 6 % 256) << 16) | ((y * 10 % 256) << 8) | ((x + y) % 256))
    val baos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  private def solidPng(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val baos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("decodeFeatures: real PNG decode — dims and pixel stats match the pixel formula") {
    val w = 40; val h = 24
    // expected channel means straight from the generating formula
    var sr = 0.0; var sg = 0.0; var sb = 0.0; var sl = 0.0
    for (y <- 0 until h; x <- 0 until w) {
      val r = x * 6 % 256; val g = y * 10 % 256; val b = (x + y) % 256
      sr += r; sg += g; sb += b; sl += 0.299 * r + 0.587 * g + 0.114 * b
    }
    val n = w * h
    val df = Seq(
      (1L, gradientPng(w, h)),
      (2L, "not an image at all".getBytes("UTF-8"))
    ).toDF("doc_id", "payload")

    val rows = Multimodal.decodeFeatures(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap

    val img = rows(1L)
    assert(img.getAs[Boolean]("is_image"))
    assert(img.getAs[Long]("width") === w.toLong)
    assert(img.getAs[Long]("height") === h.toLong)
    assert(math.abs(img.getAs[Double]("mean_lum") - sl / n) < 1e-9)
    val feat = img.getAs[collection.Seq[Float]]("feature")
    assert(feat.length === 8)
    assert(math.abs(feat(0) - (sr / n / 255.0).toFloat) < 1e-6f)
    assert(math.abs(feat(1) - (sg / n / 255.0).toFloat) < 1e-6f)
    assert(math.abs(feat(2) - (sb / n / 255.0).toFloat) < 1e-6f)

    val txt = rows(2L)
    assert(!txt.getAs[Boolean]("is_image"))
    assert(txt.getAs[Long]("width") === 0L)
    assert(txt.getAs[Double]("mean_lum") === 0.0)
  }

  test("resize: real PNG scales to target dims; non-images fall back to stride") {
    val solidColor = (200 << 16) | (40 << 8) | 90
    val df = Seq(
      (1L, gradientPng(64, 48)),
      (2L, solidPng(10, 10, solidColor)),
      (3L, ("z" * 1000).getBytes("UTF-8"))
    ).toDF("doc_id", "payload")

    val out = Multimodal.resize(df, targetW = 16, targetH = 16).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap

    // image rows ride the real codec and decode back at exactly 16x16
    for (id <- Seq(1L, 2L)) {
      assert(out(id).getAs[String]("codec") === "imageio")
      val back = ImageIO.read(
        new java.io.ByteArrayInputStream(out(id).getAs[Array[Byte]]("resized")))
      assert(back.getWidth === 16 && back.getHeight === 16)
    }
    // scaling a constant image is constant under any kernel
    val back2 = ImageIO.read(
      new java.io.ByteArrayInputStream(out(2L).getAs[Array[Byte]]("resized")))
    for (y <- 0 until 16; x <- 0 until 16)
      assert((back2.getRGB(x, y) & 0xffffff) === solidColor)

    // non-image payload: stride decimation to targetW*targetH bytes
    assert(out(3L).getAs[String]("codec") === "stride")
    assert(out(3L).getAs[Long]("resized_len") === 256L)

    // determinism: same inputs → same digests on a second run
    val again = Multimodal.resize(df, 16, 16)
      .select("doc_id", "resized_md5").as[(Long, String)].collect().toMap
    assert(again === out.view.mapValues(_.getAs[String]("resized_md5")).toMap)
  }
}
