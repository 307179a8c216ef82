package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `BinaryType`
  * columns plus a typed metadata struct. The Spark-side machinery — schema,
  * partition sizing, batch iteration shape — is real; the actual media
  * decode is STUBBED with a deterministic fake (the decode libraries are
  * not in this container). Swap `decodeImageStub`/`extractAudioStub` for
  * real decoders (e.g. javacv) without touching the plan shape.
  */
object Multimodal {

  /** Canonical media schema: id + bytes + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("source", StringType, nullable = true),
      StructField("n_bytes", LongType, nullable = true))), nullable = true)))

  /** STUB image decode: deterministic fake dimensions derived from the
    * byte content (stable across runs; replace with a real decoder). */
  def decodeImageStub(bytes: Array[Byte]): (Int, Int, Int) = {
    if (bytes == null || bytes.isEmpty) return (0, 0, 0)
    var h = 1125899906842597L // FNV-ish deterministic fold
    bytes.foreach(b => h = h * 31 + (b & 0xFF))
    val w = 64 + math.abs(h % 1920).toInt
    val ht = 64 + math.abs((h >> 16) % 1080).toInt
    (w, ht, 3)
  }

  /** Decode/feature-extract over binary content, batched per partition —
    * the Scala analog of `mapInPandas`: one iterator pass, bounded memory,
    * executor-side only. Output: media_id, width, height, channels,
    * n_bytes. */
  def decodeImages(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // typed iterator transform — stays on the Dataset/Tungsten path (no
    // RDD + createDataFrame round-trip), one pass, bounded memory
    df.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, raw) =>
        val bytes = if (raw == null) Array.empty[Byte] else raw
        val (w, h, c) = decodeImageStub(bytes)
        (id, w, h, c, bytes.length.toLong)
      })
      .toDF("media_id", "width", "height", "channels", "n_bytes")
  }

  /** STUB feature extraction: deterministic 8-dim embedding from byte
    * statistics (replace with a real vision/audio encoder; the Spark-side
    * shape — typed iterator batches, fixed-width Array[Float] column —
    * is the real contract). */
  def extractFeaturesStub(bytes: Array[Byte]): Array[Float] = {
    if (bytes == null || bytes.isEmpty) return Array.fill(8)(0f)
    var h = 1125899906842597L
    val out = new Array[Float](8)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      out(i % 8) += b / 255f
      h = h * 31 + b
      i += 1
    }
    out(7) = math.abs(h % 1000) / 1000f
    out
  }

  /** Feature-extract over binary content: (media_id, features, n_dims). */
  def extractFeatures(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, raw) =>
        val f = extractFeaturesStub(raw)
        (id, f, f.length)
      })
      .toDF("media_id", "features", "n_dims")
  }

  /** STUB resize: deterministic fake raster of w×h×3 bytes derived from
    * the content hash (a real decoder+scaler drops in here; batch shape
    * and output schema stay). */
  def resizeStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    var seed = 1125899906842597L
    if (bytes != null) bytes.foreach(b => seed = seed * 31 + (b & 0xFF))
    val out = new Array[Byte]((w * h * 3).toInt)
    var i = 0
    while (i < out.length) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      out(i) = (seed >>> 56).toByte
      i += 1
    }
    out
  }

  /** Resize plumbing: content replaced by the scaled raster, metadata
    * updated with the output geometry. */
  def resize(df: DataFrame, w: Int, h: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (ww, hh) = (w, h)
    df.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, raw) =>
        val out = resizeStub(raw, ww, hh)
        (id, out, ww, hh, out.length.toLong)
      })
      .toDF("media_id", "content", "out_w", "out_h", "n_bytes_out")
  }

  /** Frame-sampling plumbing: given a media row representing a video of
    * `n_frames` (faked from byte length), emit one row per sampled frame —
    * the explode shape a real frame extractor would produce. */
  def sampleFrames(df: DataFrame, everyN: Int = 30): DataFrame = {
    val nFrames = greatest(lit(1),
      (coalesce(length(col("content")), lit(0)) / 1024).cast("int"))
    df.select(col("media_id"), explode(
        sequence(lit(0), nFrames - 1, lit(everyN))).as("frame_idx"))
  }

  /** Build a media table from any binary-able column — used by tests to
    * exercise the plumbing with synthetic bytes. */
  def fromBinary(df: DataFrame, idCol: String, binCol: String,
                 mediaType: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(mediaType).as("media_type"),
      col(binCol).cast("binary").as("content"),
      struct(lit("synthetic").as("source"),
        length(col(binCol)).cast("long").as("n_bytes")).as("meta"))
}
