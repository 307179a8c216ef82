package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec

/** Chain-fold semantics + the stateful streaming path, including the
  * retroactive out-of-order case (a late EARLIER step-1 event changes
  * the whole downstream chain) and cross-checks against the batch
  * [[graft.operators.Funnel]]. */
class FunnelStreamSpec extends SparkSpec {

  private val M = 60L * 1000000L

  test("chain: greedy earliest strictly-after semantics") {
    assert(FunnelStream.chain(Seq(Seq(5, 3), Seq(4, 9), Seq(9))) ==
      Seq(3, 4, 9))
    // step 2 at the SAME time as step 1 does not count (strict)
    assert(FunnelStream.chain(Seq(Seq(3), Seq(3), Seq(9))) ==
      Seq(3, -1, -1))
    // missing first step breaks everything downstream
    assert(FunnelStream.chain(Seq(Seq(), Seq(1), Seq(2))) ==
      Seq(-1, -1, -1))
    assert(FunnelStream.chain(Seq(Seq(7), Seq(), Seq(8))) ==
      Seq(7, -1, -1))
  }

  test("chain agrees with the batch Funnel operator on a random-ish mix") {
    import spark.implicits._
    val events = Seq(
      (1L, 10L, "signup"), (1L, 20L, "click"), (1L, 15L, "purchase"),
      (1L, 30L, "purchase"),
      (2L, 5L, "click"), (2L, 9L, "signup"), (2L, 11L, "click"),
      (3L, 1L, "signup"), (3L, 2L, "signup"), (3L, 100L, "other"))
    val df = events.toDF("user_id", "us", "event_type")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
        col("event_type"))
    val steps = Seq("signup", "click", "purchase")
    val batch = graft.operators.Funnel
      .funnel(df, "user_id", "ts", "event_type", steps)
      .select(col("user"), unix_micros(col("ts_1")),
        unix_micros(col("ts_2")), unix_micros(col("ts_3")))
      .collect()
      .map(r => r.getLong(0) -> Seq(
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    val byUser = events.groupBy(_._1)
    byUser.foreach { case (uid, evs) =>
      val perStep = steps.map(s => evs.filter(_._3 == s).map(_._2))
      val got = FunnelStream.chain(perStep)
      if (got(0) != -1L) assert(got == batch(uid), s"user $uid")
      else assert(!batch.contains(uid), s"user $uid should be absent")
    }
  }

  test("streaming funnel: late earlier event rewrites the chain before " +
    "quiet-window emission") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    // 30-minute watermark: the retroactive event below arrives 10
    // minutes late, INSIDE the allowed lateness (outside it, Spark
    // drops the row before the state function — by design)
    val withWm = mem.toDS().toDF("user", "ts", "step")
      .withWatermark("ts", "30 minutes")
      .as[(Long, Timestamp, String)]
    val out = FunnelStream.streaming(withWm,
      Seq("signup", "click"), quietMinutes = 30)
      .toDF("user_id", "chain")
    val qn = "funnel_test_" + System.nanoTime()
    val q = out.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(qn).start()
    try {
      def t(min: Long) = new Timestamp((60 + min) * 60000L)
      def us(min: Long) = (60 + min) * 60L * 1000000L
      // batch 1: signup@10, click@5 (click BEFORE signup -> no chain yet)
      mem.addData((7L, t(10), "signup"), (7L, t(5), "click"))
      q.processAllAvailable()
      // batch 2: a LATE signup@0 arrives (within watermark): now the
      // chain is signup@0 -> click@5
      mem.addData((7L, t(0), "signup"))
      q.processAllAvailable()
      assert(spark.table(qn).count() == 0) // still inside quiet window
      // batch 3+4: far-future events advance the watermark past
      // last + quiet -> user 7 emits
      mem.addData((99L, t(120), "noop"))
      q.processAllAvailable()
      mem.addData((98L, t(300), "noop"))
      q.processAllAvailable()
      val rows = spark.table(qn).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
      assert(rows(7L) == List(us(0), us(5)))
    } finally q.stop()
  }
}
