package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Generate an N× scaled copy of a testdata directory's `documents` and
  * `embeddings` tables — the corpus behind the scale-curve measurements
  * in COVERAGE.md (dedup/ANN wall-time at 1× vs 10×). Replica k offsets
  * ids by k·1,000,000 and perturbs content deterministically (a per-copy
  * suffix token on text, a per-copy epsilon on one embedding dimension),
  * so the scaled corpus has both more documents AND a denser near-dup
  * pair structure — the honest stress for candidate-generation scaling.
  *
  * Usage: ScaleCorpus <srcSfDir> <outDir> [factor=10]
  */
object ScaleCorpus {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleCorpus <srcSfDir> <outDir> [factor]")
    val (src, out) = (args(0), args(1))
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val docCopies = (0 until factor).map { k =>
      if (k == 0) docs
      else docs.select(
        (col("doc_id") + k * 1000000L).as("doc_id"),
        concat(col("text"), lit(s" rep$k-"), col("doc_id")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }
    docCopies.reduce(_ unionAll _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val embs = spark.read.parquet(s"$src/embeddings.parquet")
    val dim = embs.select(size(col("embedding"))).head().getInt(0)
    val embCopies = (0 until factor).map { k =>
      if (k == 0) embs
      else embs.select(
        (col("vec_id") + k * 1000000L).as("vec_id"),
        // nudge one dimension per copy: near-identical, not identical
        transform(col("embedding"),
          (x, i) => when(i === (k % dim), x + lit(k * 1e-3f))
            .otherwise(x)).as("embedding"),
        col("label"))
    }
    embCopies.reduce(_ unionAll _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    println(s"[scale] wrote ${factor}x documents+embeddings to $out")
    spark.stop()
  }
}
