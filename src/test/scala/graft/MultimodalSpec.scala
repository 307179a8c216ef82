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

  // ---- MJPEG-in-AVI: a structurally-real container built in-memory ----

  private def le32(v: Long): Array[Byte] =
    Array.tabulate[Byte](4)(i => ((v >> (8 * i)) & 0xFF).toByte)

  private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    val pad = if (body.length % 2 == 1) Array[Byte](0) else Array.empty[Byte]
    id.getBytes("ISO-8859-1") ++ le32(body.length.toLong) ++ body ++ pad
  }

  private def jpeg(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h); g.dispose()
    val b = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", b)
    b.toByteArray
  }

  private def aviMjpeg(frames: Seq[Array[Byte]]): Array[Byte] = {
    val avih = chunk("avih", new Array[Byte](56))
    val hdrl = chunk("LIST", "hdrl".getBytes("ISO-8859-1") ++ avih)
    val movi = chunk("LIST", "movi".getBytes("ISO-8859-1") ++
      frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = "AVI ".getBytes("ISO-8859-1") ++ hdrl ++ movi
    "RIFF".getBytes("ISO-8859-1") ++ le32(body.length.toLong) ++ body
  }

  test("MJPEG-in-AVI frames extract and DECODE for real; corrupt and " +
    "non-AVI media contribute zero rows in-band") {
    import spark.implicits._
    // 7 frames alternating red/blue: sampling every 3rd hits 0 (red),
    // 3 (blue), 6 (red) — the decoded red-band means must follow the
    // stream ORDER, not just decode
    val frames = (0 until 7).map(i =>
      jpeg(16, 12, if (i % 2 == 0) 0xFF0000 else 0x0000FF))
    val avi = aviMjpeg(frames)
    assert(Multimodal.aviFrames(avi).length == 7)
    assert(Multimodal.aviFrames("not a riff file".getBytes).isEmpty)

    val media = Seq(
      (1L, avi),
      (2L, "corrupt bytes that are not an avi".getBytes)
    ).toDF("media_id", "content")
    val out = Multimodal.sampleAviFrames(media, everyN = 3)
      .collect().sortBy(r => (r.getLong(0), r.getInt(1)))
    assert(out.map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
      r.getInt(3), r.getInt(4))).toSeq ==
      Seq((1L, 0, 7, 16, 12), (1L, 3, 7, 16, 12), (1L, 6, 7, 16, 12)))
    // decoded Rec.601 lumas follow the alternating pattern — pure red
    // ≈ 0.299·255 ≈ 76, pure blue ≈ 0.114·255 ≈ 29 — proving frames
    // decode AND keep stream order
    val lumas = out.map(_.getDouble(5))
    assert(lumas(0) > 55.0 && lumas(2) > 55.0, lumas.mkString(","))
    assert(lumas(1) < 45.0, lumas.mkString(","))
  }
}
