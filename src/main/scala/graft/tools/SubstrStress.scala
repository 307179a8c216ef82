package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Full-materialization stress for cross-document exact-substring
  * dedup ([[graft.pipeline.Dedup.substrDedup]]): reassemble every
  * document's deduplicated TEXT and write it to parquet — the part the
  * count-pruned bench query omits — against a `ScaleCorpus` directory.
  *
  * Usage: runMain graft.tools.SubstrStress <docsDir> <out> [k=50]
  * Prints wall, docs, and total tokens removed.
  */
object SubstrStress {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .appName("substr-stress").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"${args(0)}/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val k = if (args.length > 2) args(2).toInt else 50
    val t0 = System.nanoTime()
    graft.pipeline.Dedup.substrDedup(docs, "doc_id", "text", k)
      .write.mode("overwrite").parquet(args(1))
    val wall = (System.nanoTime() - t0) / 1e9
    val out = spark.read.parquet(args(1))
    val row = out.agg(count(lit(1)), sum(col("n_removed"))).head()
    println(f"[stress] substr full-materialization: docs=${row.getLong(0)} " +
      f"removed-tokens=${row.getLong(1)} wall=$wall%.1f s " +
      s"driver-Xmx=${Runtime.getRuntime.maxMemory() >> 20} MiB")
  }
}
