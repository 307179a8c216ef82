package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B harness for the round-9 scale-curve outliers (`top_terms` 3.5×,
  * `quality_filter` 3.3× wall at a 10× corpus, vs the 1.2–1.7× family
  * band): both queries scanned the corpus twice — `top_terms` tokenizes
  * once for the tf side and once for the doc-frequency branch,
  * `quality_filter` re-runs md5-per-token scoring for the threshold pass
  * and again for the filter pass — so the ratio charged token-density
  * growth (the 10× corpus perturbs text per copy, growing the distinct
  * (doc, term) set super-linearly) twice.
  *
  * Usage: `runMain graft.tools.ProfileScale <sfDir>` against
  * /root/testdata/sf0.1 and a `ScaleCorpus` 10× dir. Three alternating
  * warm rounds per variant (round-1 numbers carry JIT/codegen warmup —
  * compare round 2+).
  *
  * Round-10 measurements (local[32], warm = round 3):
  *
  * |                       | 1× two-pass | 1× ckpt | 10× two-pass | 10× ckpt |
  * |-----------------------|-------------|---------|--------------|----------|
  * | topTerms              | 1.10 s      | 0.80 s  | 4.58 s       | 2.83 s   |
  * | qualityFilter         | 1.53 s      | 0.67 s  | 6.15 s       | 2.28 s   |
  *
  * → the headline queries opt into `checkpointTf` / `checkpointScored`
  * (SparkEntry), keeping the library default materialization-free. */
object ProfileScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.driver.memory", "12g")
      .appName("profile").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // warm up the JIT + parquet footer caches
    time("warmup count")(docs.count())
    time("warmup tokenize")(docs.select(
      explode(split(lower(col("text")), "[^a-z0-9']+")).as("w"))
      .filter(col("w") =!= "").count())

    for (round <- 1 to 3) {
      println(s"=== round $round ===")
      time(s"topTerms two-pass")(
        graft.pipeline.Terms.topTerms(docs, "doc_id", "text", k = 3)
          .collect().length)
      time(s"topTerms checkpointTf")(
        graft.pipeline.Terms.topTerms(docs, "doc_id", "text", k = 3,
          checkpointTf = true).collect().length)
      val scored = graft.pipeline.Classifier.scoreHashed(docs,
        "doc_id", "text",
        graft.pipeline.Classifier.scrambledWeightsMilli(1024),
        biasMilli = 250L)
      time(s"qualityFilter two-pass")(
        graft.pipeline.Classifier.filterByMarginPercentile(
          scored, "margin_milli", 0.5).count())
      time(s"qualityFilter checkpointed")(
        graft.pipeline.Classifier.filterByMarginPercentile(
          scored, "margin_milli", 0.5, checkpointScored = true).count())
    }
    spark.stop()
  }
}
