package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-query job/stage breakdown for the round-21 fixed-overhead hunt
  * (guide §1: measure first). Runs each named [[graft.SparkEntry]]
  * query REPEATS times under a listener that records every job's wall
  * time, stage count and task count, then prints:
  *
  *   - per-run total wall vs sum-of-job walls (the gap = driver-side
  *     planning / analysis / non-job work),
  *   - per-job lines (wall, #stages, #tasks, description head).
  *
  * Usage: runMain graft.tools.QueryJobProfile <sfDir> <q1>[,<q2>...] [repeats]
  */
object QueryJobProfile {
  private case class JobRec(id: Int, t0: Long, var t1: Long = 0L,
                            var stages: Int = 0, var tasks: Int = 0,
                            var taskMs: Long = 0L, var gcMs: Long = 0L,
                            var deserMs: Long = 0L,
                            desc: String = "")

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(',').toSeq
    val repeats = args.drop(2).headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val order = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Int]())
    val stageToJob =
      new java.util.concurrent.ConcurrentHashMap[Int, Integer]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.put(e.jobId, JobRec(e.jobId, System.nanoTime(),
          stages = e.stageInfos.size,
          tasks = e.stageInfos.map(_.numTasks).sum, desc = d))
        e.stageInfos.foreach(si => stageToJob.put(si.stageId, e.jobId))
        order.add(e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val r = jobs.get(e.jobId)
        if (r != null) r.t1 = System.nanoTime()
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val jid = stageToJob.get(e.stageId)
        val r = if (jid == null) null else jobs.get(jid.intValue())
        if (r != null && e.taskMetrics != null) {
          r.taskMs += e.taskMetrics.executorRunTime
          r.gcMs += e.taskMetrics.jvmGCTime
          r.deserMs += e.taskMetrics.executorDeserializeTime
        }
      }
    })

    // session warmup identical to Bench
    try graft.SparkEntry.queries("q1_agg")(spark, dir).count()
    catch { case e: Throwable => System.err.println(s"warmup: $e") }

    names.foreach { name =>
      for (rep <- 1 to repeats) {
        jobs.clear(); order.clear()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, dir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        System.gc()
        val recs = {
          import scala.jdk.CollectionConverters._
          order.asScala.map(jobs.get(_)).filter(_ != null).toSeq
        }
        val jobSum = recs.map(r =>
          (if (r.t1 > 0) r.t1 - r.t0 else 0L) / 1e9).sum
        println(f"== $name rep$rep wall=$wall%.2fs jobs=${recs.size} " +
          f"jobSum=$jobSum%.2fs gap=${wall - jobSum}%.2fs")
        if (rep == repeats) recs.foreach { r =>
          val w = (if (r.t1 > 0) r.t1 - r.t0 else 0L) / 1e9
          println(f"   job ${r.id}%3d ${w}%6.2fs stages=${r.stages}%2d " +
            f"tasks=${r.tasks}%4d taskMs=${r.taskMs}%5d gcMs=${r.gcMs}%4d " +
            f"deserMs=${r.deserMs}%4d ${r.desc.take(50)}")
        }
      }
    }
    spark.stop()
  }
}
