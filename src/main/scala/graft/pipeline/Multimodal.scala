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
