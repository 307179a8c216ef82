package graft

import org.apache.spark.sql.types._

/** The zero-data paths of the streaming oracle queries: an events/
  * documents table with no rows must yield an EMPTY result — not an
  * NPE from a never-created sink root (no micro-batch fires, so
  * foreachBatch never mkdirs it) and not a null-edges crash in the
  * PSI monitor's driver-side min/max collect. */
class StreamingEmptySourceSpec extends SparkSpec {

  private def emptyDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-empty")
      .toFile.getAbsolutePath
    val events = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("event_id", LongType),
        StructField("ts", TimestampType),
        StructField("user_id", LongType),
        StructField("event_type", StringType),
        StructField("value", DoubleType),
        StructField("props", StringType))))
    events.coalesce(1).write.mode("overwrite")
      .parquet(s"$d/events.parquet")
    val docs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("doc_id", LongType),
        StructField("text", StringType),
        StructField("lang", StringType),
        StructField("source", StringType),
        StructField("n_chars", LongType))))
    docs.coalesce(1).write.mode("overwrite")
      .parquet(s"$d/documents.parquet")
    d
  }

  test("events_stream_psi on an empty events table returns zero rows") {
    val dir = emptyDir()
    val out = SparkEntry.queries("events_stream_psi")(spark, dir)
    assert(out.columns.toSeq == Seq("w_start", "n", "psi_micro"))
    assert(out.count() == 0L)
  }

  test("stream_cms_topk on an empty documents table returns zero rows") {
    val dir = emptyDir()
    val out = SparkEntry.queries("stream_cms_topk")(spark, dir)
    assert(out.columns.toSeq == Seq("w", "est"))
    assert(out.count() == 0L)
  }
}
