package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Multimodal

/** Real-codec multimodal paths: JDK PNG encode/decode round-trip,
  * pixel-statistics features, nearest-neighbor resize, and the
  * not-an-image in-band marker rows. */
class MultimodalSpec extends SparkSpec {

  test("syntheticPng round-trips dimensions and color through ImageIO") {
    val png = Multimodal.syntheticPng(20, 10, 200, 100, 50)
    // PNG magic
    assert((png(0) & 0xFF) == 0x89 && png(1) == 'P'.toByte)
    val (w, h, c) = Multimodal.decodeImage(png)
    assert((w, h, c) == (20, 10, 3))
    val f = Multimodal.imageFeatures(png)
    assert(math.round(f(0) * 255) == 200)
    assert(math.round(f(1) * 255) == 100)
    assert(math.round(f(2) * 255) == 50)
    assert(f(7) == 1f)
  }

  test("decodeImage flags non-image and corrupt bytes in-band") {
    assert(Multimodal.decodeImage(null) == (0, 0, 0))
    assert(Multimodal.decodeImage(Array.empty[Byte]) == (0, 0, 0))
    assert(Multimodal.decodeImage("not an image".getBytes) == (0, 0, 0))
    // a valid PNG header with a truncated body must not throw
    val png = Multimodal.syntheticPng(8, 8, 1, 2, 3)
    assert(Multimodal.decodeImage(png.take(20)) == (0, 0, 0))
    assert(Multimodal.imageFeatures("junk".getBytes).forall(_ == 0f))
    assert(Multimodal.resizeImage("junk".getBytes, 4, 4).isEmpty)
  }

  test("resizeImage nearest-neighbor keeps solid color, exact raster size") {
    val png = Multimodal.syntheticPng(33, 17, 10, 20, 30)
    val out = Multimodal.resizeImage(png, 8, 4)
    assert(out.length == 8 * 4 * 3)
    assert(out.grouped(3).forall(p =>
      (p(0) & 0xFF) == 10 && (p(1) & 0xFF) == 20 && (p(2) & 0xFF) == 30))
  }

  test("decodeImages dataset path decodes real PNGs distributed") {
    val ids = spark.range(0, 40).toDF("id")
    val media = Multimodal.syntheticImageTable(ids, "id")
    val dec = Multimodal.decodeImages(media)
      .orderBy(col("media_id")).collect()
    assert(dec.length == 40)
    dec.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == 16 + id % 32, s"width of $id")
      assert(r.getLong(2) == 16 + (id / 32) % 32, s"height of $id")
      assert(r.getLong(3) == 3L)
      assert(r.getLong(4) > 0L) // real PNG bytes, not empty
    }
  }

  test("extractFeatures and resize dataset paths are oracle-exact") {
    val ids = spark.range(0, 20).toDF("id")
    val media = Multimodal.syntheticImageTable(ids, "id")
    val f = Multimodal.extractFeatures(media)
      .select(col("media_id"),
        round(get(col("features"), lit(0)) * 255).cast("long").as("r"))
      .orderBy("media_id").collect()
    f.foreach(r => assert(r.getLong(1) == r.getLong(0) % 256))
    val rz = Multimodal.resize(media, 16, 16)
      .select(col("media_id"), col("n_bytes_out")).collect()
    rz.foreach(r => assert(r.getLong(1) == 16L * 16 * 3))
  }
}
