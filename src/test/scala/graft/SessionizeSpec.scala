package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Sessionize
import graft.streaming.Sessionize.Session

/** Session fold invariants + the streaming flatMapGroupsWithState path
  * driven by a MemoryStream with an advancing watermark. */
class SessionizeSpec extends SparkSpec {

  private val M = 60L * 1000000L // one minute in micros

  test("fold splits on gaps and carries the open session") {
    val times = Seq(0L, 5 * M, 10 * M, 60 * M, 61 * M)
    val (closed, open) = Sessionize.fold(times, 30 * M, None)
    assert(closed == Seq(Session(0, 10 * M, 3)))
    assert(open.contains(Session(60 * M, 61 * M, 2)))
    // continuing from an open session merges into it
    val (c2, o2) = Sessionize.fold(Seq(62 * M), 30 * M, open)
    assert(c2.isEmpty && o2.contains(Session(60 * M, 62 * M, 3)))
  }

  test("batch sessionization over a small frame") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, 0L), (1L, 5 * M), (1L, 50 * M), // user 1: 2 sessions
      (2L, 0L), (2L, 29 * M), (2L, 58 * M) // user 2: 1 chained session
    ).toDF("u", "us").select(col("u"), timestamp_micros(col("us")).as("ts"))
    val got = Sessionize.batch(df, "u", "ts", gapMinutes = 30)
      .orderBy("user_id", "session_start_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 0L, 5 * M, 2L), (1L, 50 * M, 50 * M, 1L),
      (2L, 0L, 58 * M, 3L)))
  }

  test("streaming sessions close via event-time timeout") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val withWm = mem.toDS()
      .toDF("user", "ts").withWatermark("ts", "1 minute")
      .as[(Long, Timestamp)]
    val out = Sessionize.streaming(withWm, gapMinutes = 30)
      .toDF("user_id", "start_us", "end_us", "n")
    val qn = "sessionize_test_" + System.nanoTime()
    val q = out.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(qn).start()
    try {
      // offset from epoch: an event at exactly the initial watermark (0)
      // would be dropped as late
      def t(min: Long) = new Timestamp((60 + min) * 60000L)
      // batch 1: user 7 has two events 5 minutes apart
      mem.addData((7L, t(0)), (7L, t(5)))
      q.processAllAvailable()
      assert(spark.table(qn).count() == 0) // session still open
      // batch 2: an event 2 hours later advances the watermark past
      // last + gap → the first session times out and emits
      mem.addData((7L, t(120)))
      q.processAllAvailable()
      mem.addData((7L, t(300)))
      q.processAllAvailable()
      val rows = spark.table(qn)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq
      assert(rows.contains((7L, 60 * M, 65 * M, 2L)))
      assert(rows.exists(r => r._2 == 180 * M)) // second session closed too
    } finally q.stop()
  }

  test("batch sessionize skips null user/ts rows instead of crashing") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("2024-01-01 00:00:00")),
      (None, Some("2024-01-01 00:01:00")),       // null user: skipped
      (Some(1L), Option.empty[String]))           // null ts: skipped
      .toDF("user_id", "ts")
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("ts").cast("timestamp")
          .as("ts"))
    val got = graft.streaming.Sessionize
      .batch(df, "user_id", "ts", gapMinutes = 30).collect()
    assert(got.length == 1 && got(0).getLong(3) == 1L)
    intercept[IllegalArgumentException] {
      graft.streaming.Sessionize.batch(df, "user_id", "ts", 0)
    }
  }
}
