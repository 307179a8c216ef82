package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic twin of [[graft.Bench]] for the round-21 contamination
  * hunt: identical session, order, warmup and between-query isolation,
  * but each query additionally reports the GC wall, JIT compilation
  * time, heap occupancy and loaded-class delta measured INSIDE its
  * timed region — to attribute the 2-3× inflation later bench queries
  * show over their solo runs (guide §1: measure, don't guess).
  *
  * Usage: runMain graft.tools.BenchDiag   (same env vars as Bench)
  */
object BenchDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import scala.jdk.CollectionConverters._
    val gcBeans = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala
    val jit = java.lang.management.ManagementFactory.getCompilationMXBean
    val cls = java.lang.management.ManagementFactory.getClassLoadingMXBean
    val mem = java.lang.management.ManagementFactory.getMemoryMXBean
    def gcMs = gcBeans.map(_.getCollectionTime).sum
    def gcN = gcBeans.map(_.getCollectionCount).sum

    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = graft.SparkEntry.queries.filter { case (n, _) =>
      only.forall(_.contains(n)) }
    try graft.SparkEntry.queries("q1_agg")(spark, sfDir).count()
    catch { case e: Throwable => System.err.println(s"warmup: $e") }
    println("name,secs,gc_ms,gc_n,jit_ms,classes,heap_mb")
    selected.foreach { case (name, fn) =>
      val (g0, n0, j0, c0) = (gcMs, gcN, jit.getTotalCompilationTime,
        cls.getTotalLoadedClassCount)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch { case e: Throwable =>
        System.err.println(s"[diag] $name FAILED: ${e.getMessage}") }
      val secs = (System.nanoTime() - t0) / 1e9
      val heapMb = mem.getHeapMemoryUsage.getUsed / 1024 / 1024
      println(f"$name,$secs%.3f,${gcMs - g0},${gcN - n0}," +
        f"${jit.getTotalCompilationTime - j0},${cls.getTotalLoadedClassCount - c0},$heapMb")
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
