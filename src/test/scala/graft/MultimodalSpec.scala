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

  test("WAV decode round-trips 16-bit PCM, channels and rate") {
    val samples = Array(100, -200, 32767, -32768, 0, 7)
    val wav = Multimodal.syntheticWav(2, 44100, samples)
    val w = Multimodal.decodeWav(wav)
    assert(w != null && w.channels == 2 && w.sampleRate == 44100
      && w.bits == 16)
    assert(w.samples.toSeq == samples.toSeq)
  }

  test("WAV decode skips unknown chunks with odd-size RIFF padding") {
    // hand-build: RIFF [ junk(3, padded) | fmt | data ]
    val base = Multimodal.syntheticWav(1, 8000, Array(1, -1, 2))
    val junk = "JUNK".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0, 9, 9, 9, 0) // size 3 + 1 pad byte
    val spliced = base.take(12) ++ junk ++ base.drop(12)
    // fix RIFF size field
    val sz = spliced.length - 8
    spliced(4) = (sz & 0xFF).toByte; spliced(5) = ((sz >> 8) & 0xFF).toByte
    spliced(6) = ((sz >> 16) & 0xFF).toByte; spliced(7) = ((sz >> 24) & 0xFF).toByte
    val w = Multimodal.decodeWav(spliced)
    assert(w != null && w.samples.toSeq == Seq(1, -1, 2))
  }

  test("WAV decode: 8-bit unsigned centers at zero") {
    // 8-bit variant built by hand from a 16-bit template's header
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF) }
    def w32(v: Int): Unit = { w16(v & 0xFFFF); w16((v >> 16) & 0xFFFF) }
    bos.write("RIFF".getBytes); w32(36 + 4); bos.write("WAVE".getBytes)
    bos.write("fmt ".getBytes); w32(16); w16(1); w16(1); w32(8000)
    w32(8000); w16(1); w16(8)
    bos.write("data".getBytes); w32(4)
    Seq(0, 128, 255, 200).foreach(bos.write)
    val w = Multimodal.decodeWav(bos.toByteArray)
    assert(w != null && w.bits == 8)
    assert(w.samples.toSeq == Seq(-128, 0, 127, 72))
  }

  test("WAV decode: corrupt/non-wav bytes come back as in-band markers") {
    assert(Multimodal.decodeWav(null) == null)
    assert(Multimodal.decodeWav(Array[Byte](1, 2, 3)) == null)
    assert(Multimodal.decodeWav(("RIFFxxxxNOPE" + "x" * 64)
      .getBytes("US-ASCII")) == null)
    // truncated data chunk claims more bytes than exist
    val good = Multimodal.syntheticWav(1, 8000, Array(1, 2, 3, 4))
    assert(Multimodal.decodeWav(good.dropRight(3)) == null)
    // compressed format tag (2 = ADPCM) is not PCM -> rejected
    val adpcm = good.clone(); adpcm(20) = 2
    assert(Multimodal.decodeWav(adpcm) == null)
    // and the Spark path surfaces zero-marker rows, not failures
    val spark0 = spark
    import spark0.implicits._
    val df = Seq((1L, good), (2L, Array[Byte](9, 9)))
      .toDF("media_id", "content")
    val rows = Multimodal.audioFeatures(df).orderBy("media_id").collect()
    assert(rows(0).getLong(3) == 4L) // n_frames
    assert(rows(1).getInt(1) == 0 && rows(1).getLong(5) == 0L)
  }

  test("audio resample: frame decimation keeps channels aligned") {
    val spark0 = spark
    import spark0.implicits._
    // stereo frames: (1,2) (3,4) (5,6) (7,8) -> factor 2 -> (1,2) (5,6)
    val wav = Multimodal.syntheticWav(2, 8000,
      Array(1, 2, 3, 4, 5, 6, 7, 8))
    val out = Multimodal.resampleAudio(
      Seq((1L, wav)).toDF("media_id", "content"), 2).collect()(0)
    assert(out.getInt(2) == 2 && out.getInt(3) == 4000
      && out.getLong(4) == 2L)
    val re = Multimodal.decodeWav(out.getAs[Array[Byte]](1))
    assert(re.samples.toSeq == Seq(1, 2, 5, 6))
    // factor 3 does not divide 8000 -> in-band null row
    val bad = Multimodal.resampleAudio(
      Seq((2L, wav)).toDF("media_id", "content"), 3).collect()(0)
    assert(bad.isNullAt(1) && bad.getInt(2) == 0)
  }

  test("audio features: hand-computed zcr/rms on a known signal") {
    // mono: [3, -3, 3, -3] -> zcr 3, sum_sq 36, peak 3
    val wav = Multimodal.syntheticWav(1, 1000, Array(3, -3, 3, -3))
    val spark0 = spark
    import spark0.implicits._
    val df = Seq((7L, wav)).toDF("media_id", "content")
    val r = Multimodal.audioFeatures(df).collect()(0)
    assert((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
      r.getLong(7)) == ((4L, 4000L, 36L, 3L, 3L)))
    // stereo: channels are independent streams -> no cross-channel zcr
    val st = Multimodal.syntheticWav(2, 1000, Array(3, -3, 3, -3))
    val r2 = Multimodal.audioFeatures(
      Seq((8L, st)).toDF("media_id", "content")).collect()(0)
    assert(r2.getLong(3) == 2L && r2.getLong(7) == 0L)
  }
}
