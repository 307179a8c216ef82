package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 100×-duplication stress for the pair-capped MinHash mode
  * ([[graft.pipeline.Dedup.minhashComponents]]) and its equivalence
  * against components-over-all-pairs ([[graft.pipeline.Dedup.minhashLsh]]
  * → connectedComponents) — the adversarial corpus is `ScaleCorpus
  * factor=100` documents (~100 body-identical copies per source doc:
  * ~4,950 true pairs per group, which is exactly what the pair mode
  * must materialize and the capped mode must not).
  *
  * Usage:
  *   runMain graft.tools.MinhashCapStress <docsDir> capped <out>
  *   runMain graft.tools.MinhashCapStress <docsDir> full <out>
  *   runMain graft.tools.MinhashCapStress compare <outA> <outB>
  *
  * Each dedup run writes `(id, component, keep_id)` parquet (survivor
  * mapping for every doc in a ≥2-doc component) and prints the wall.
  * `compare` asserts the two mappings are identical sets.
  */
object MinhashCapStress {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .appName("minhash-cap-stress").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.pipeline.Dedup

    if (args(0) == "compare") {
      val a = spark.read.parquet(args(1)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val b = spark.read.parquet(args(2)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      println(s"[stress] A=${a.size} rows, B=${b.size} rows")
      val onlyA = a -- b; val onlyB = b -- a
      require(onlyA.isEmpty && onlyB.isEmpty,
        s"survivor mappings differ: ${onlyA.take(5)} vs ${onlyB.take(5)}")
      println("[stress] survivor mappings IDENTICAL")
      return
    }

    val Seq(dir, mode, out) = args.toSeq
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val scores = docs.select(col("doc_id").as("id"),
      length(col("text")).cast("long").as("score"))
    val t0 = System.nanoTime()
    val comp = mode match {
      case "capped" =>
        Dedup.minhashComponents(docs, "doc_id", "text",
          numPerms = 64, bands = 16, k = 3, threshold = 0.9)
      case "full" =>
        Dedup.connectedComponents(
          Dedup.minhashLsh(docs, "doc_id", "text",
            numPerms = 64, bands = 16, k = 3, threshold = 0.9))
    }
    val keep = Dedup.survivors(comp, scores)
    comp.join(keep, "component")
      .select(col("id"), col("component"), col("keep_id"))
      .write.mode("overwrite").parquet(out)
    val docCount = spark.read.parquet(out).count()
    println(f"[stress] mode=$mode docs-in-components=$docCount " +
      f"wall=${(System.nanoTime() - t0) / 1e9}%.1f s " +
      s"driver-Xmx=${Runtime.getRuntime.maxMemory() >> 20} MiB")
  }
}
