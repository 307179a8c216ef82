package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase profiler for the round-15 `dedup_minhash_components` fixed-
  * overhead hunt (VERDICT r14 task 1: 10.8 s at sf0.1 vs 2.6 s for the
  * all-pairs twin, while the 100× scale story is the inverse). Times
  * each internal materialization of [[graft.pipeline.Dedup
  * .minhashComponents]] separately, three rounds (round 1 carries JIT
  * warmup), so the fix targets measured cost, not guessed cost.
  *
  * Usage: `runMain graft.tools.MinhashCompProfile /root/testdata/sf0.1`
  */
object MinhashCompProfile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_PARTS", "4"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .appName("minhash-comp-profile").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.pipeline.Dedup

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-44s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val d = spark.read.parquet(s"$dir/documents.parquet")
    val inflated = d.select(col("doc_id"), col("text")).unionAll(
      d.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 10000).as("doc_id"), col("text")))

    time("warmup corpus count")(inflated.count())

    for (round <- 1 to 3) {
      println(s"=== round $round ===")
      // mirrors the PRODUCTION round-15 flow, one action at a time
      val rows = Dedup.shingleHashRows(inflated, "doc_id", "text", 3)
      val buckets = Dedup.bandBucketsPub(
        Dedup.signatureColsPub(rows, 64, 42L), 64, 16)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("band"), col("bucket"))
        .orderBy(col("id"))
      val spanning = buckets
        .select(col("id"), lag(col("id"), 1).over(w).as("prev"),
          first(col("id")).over(w).as("root"))
      val cand0 = spanning.filter(col("prev").isNotNull)
        .select(col("prev").as("id_a"), col("id").as("id_b"))
        .unionAll(spanning
          .filter(col("root") =!= col("id") && col("prev") =!= col("root"))
          .select(col("root").as("id_a"), col("id").as("id_b")))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sizes = rows.groupBy(col("id")).agg(count(lit(1)).as("sz"))
      def withSizes(c: org.apache.spark.sql.DataFrame) = c
        .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")),
          "id_a")
        .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")),
          "id_b")
      val pairs = Dedup.verifyJaccardRowsPub(withSizes(cand0), rows, rows,
          0.9)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nPairs = time("a1: pairs persist+count")(pairs.count())
      val candIds = cand0.select(col("id_a").as("id"))
        .unionAll(cand0.select(col("id_b").as("id"))).distinct()
      val pairedIds = pairs.select(col("id_a").as("id"))
        .unionAll(pairs.select(col("id_b").as("id"))).distinct()
      val stragglers = candIds.join(pairedIds, Seq("id"), "left_anti")
      val zb = buckets.join(broadcast(stragglers), "id")
      val escalated = zb.as("z").join(buckets.as("y"),
          col("z.band") === col("y.band") &&
          col("z.bucket") === col("y.bucket") &&
          col("z.id") =!= col("y.id"))
        .select(least(col("z.id"), col("y.id")).as("id_a"),
          greatest(col("z.id"), col("y.id")).as("id_b"))
        .distinct()
        .join(cand0, Seq("id_a", "id_b"), "left_anti")
      val escPairs = time("a2: escalated collect")(
        escalated.limit(20001).collect()
          .map(r => (r.getLong(0), r.getLong(1))))
      println(s"[prof]   -> escalated = ${escPairs.length}, " +
        s"pairs = $nPairs")
      val comp = time("a4: connectedComponents (hinted)")(
        Dedup.connectedComponents(pairs,
          edgeCountHint = Some(2L * nPairs)))
      val scores = inflated.select(col("doc_id").cast("long").as("id"),
        length(col("text")).cast("long").as("score"))
      val keep = Dedup.survivors(comp, scores)
      time("a5: survivors + final join")(
        comp.join(keep, "component")
          .select(col("id"), col("component"), col("keep_id"))
          .count())
      buckets.unpersist(blocking = false)
      cand0.unpersist(blocking = false)
      pairs.unpersist(blocking = false)
      println()
      time("END-TO-END production minhashComponents + survivors")({
        val c = Dedup.minhashComponents(inflated, "doc_id", "text",
          numPerms = 64, bands = 16, k = 3, threshold = 0.9)
        val kp = Dedup.survivors(c, scores)
        c.join(kp, "component")
          .select(col("id"), col("component"), col("keep_id")).count()
      })
      println()
    }
    spark.stop()
  }
}
