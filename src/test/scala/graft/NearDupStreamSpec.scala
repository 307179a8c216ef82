package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.pipeline.Dedup
import graft.streaming.NearDup

/** Streaming MinHash near-dup candidates: cross-batch pairs via
  * per-bucket state, batching-invariant output, replay-safe. */
class NearDupStreamSpec extends SparkSpec {

  import spark.implicits._

  private val doc1 = "the quick brown fox jumps over the lazy dog again and again"
  private val doc3 = "the quick brown fox jumps over the lazy cat again and again"
  private val other = "completely different content about spark catalyst planning"
  private val numbers = "numbers one two three four five six seven eight nine ten"

  private def runStream(batches: Seq[Seq[(Long, String)]]): Set[(Long, Long)] = {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val pairs = NearDup.candidatePairs(
      mem.toDS().toDF("id", "text"), "id", "text",
      numPerms = 64, bands = 16, k = 3)
    val qn = "neardup_test_" + System.nanoTime()
    val q = pairs.toDF("id_a", "id_b").writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName(qn).start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      spark.table(qn).distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    } finally q.stop()
  }

  test("cross-batch and intra-batch candidates; unrelated docs never pair") {
    // batch 1: doc 1 and an unrelated doc; batch 2: exact copy (2) and
    // near-copy (3) of doc 1, plus another unrelated doc
    val got = runStream(Seq(
      Seq((1L, doc1), (4L, other)),
      Seq((2L, doc1), (3L, doc3), (5L, numbers))))
    assert(got.contains((1L, 2L)), "exact copy must pair across batches")
    // every pair involves only the three related docs
    assert(got.forall { case (a, b) => Set(a, b).subsetOf(Set(1L, 2L, 3L)) },
      s"unexpected pairs: $got")
  }

  test("output is invariant to batching and to replayed ids") {
    val oneShot = runStream(Seq(
      Seq((1L, doc1), (2L, doc1), (3L, doc3), (4L, other), (5L, numbers))))
    val chopped = runStream(Seq(
      Seq((1L, doc1)), Seq((4L, other), (3L, doc3)),
      Seq((2L, doc1)), Seq((5L, numbers)),
      // replayed delivery of an already-stored id adds nothing
      Seq((1L, doc1), (3L, doc3))))
    assert(oneShot == chopped)
  }

  test("streaming candidates + batch verify = batch minhash pairs") {
    val docs = Seq((1L, doc1), (2L, doc1), (3L, doc3), (4L, other),
      (5L, numbers)).toDF("id", "text")
    val batchPairs = Dedup.minhashLsh(docs, "id", "text",
        numPerms = 64, bands = 16, k = 3, threshold = 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamed = runStream(Seq(
      Seq((1L, doc1), (2L, doc1)), Seq((3L, doc3), (4L, other)),
      Seq((5L, numbers))))
    val cand = streamed.toSeq.toDF("id_a", "id_b")
    val verified = Dedup.verifyPairs(cand, docs, "id", "text",
        k = 3, threshold = 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified == batchPairs)
  }

  test("horizon-bounded: in-horizon pairs emit, stale buckets evict") {
    import java.sql.Timestamp
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    def t(min: Long) = new Timestamp((60 + min) * 60000L)
    val docs = mem.toDS().toDF("id", "text", "ts")
    val pairs = NearDup.candidatePairsWithin(docs, "id", "text", "ts",
      horizonMs = 30L * 60000L, watermarkDelay = "1 minute",
      numPerms = 64, bands = 16, k = 3)
    val qn = "neardup_win_" + System.nanoTime()
    val q = pairs.toDF("id_a", "id_b").writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName(qn).start()
    try {
      def got() = spark.table(qn).distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // batch 1: doc 1 at t0; batch 2: copy at t+10 (in horizon) pairs
      mem.addData((1L, doc1, t(0)))
      q.processAllAvailable()
      mem.addData((2L, doc1, t(10)))
      q.processAllAvailable()
      assert(got().contains((1L, 2L)))
      // advance the watermark (t45 - 1min delay = t44) past 1 and 2's
      // expiry (t10 + 30 = t40) -> their bucket state evicts; a copy at
      // t50 is beyond horizon of both -> no new pairs
      mem.addData((9L, numbers, t(45)))
      q.processAllAvailable()
      mem.addData((3L, doc1, t(50)))
      q.processAllAvailable()
      assert(got() == Set((1L, 2L)))
      // but a copy within horizon of 3 still pairs
      mem.addData((4L, doc1, t(55)))
      q.processAllAvailable()
      assert(got() == Set((1L, 2L), (3L, 4L)))
    } finally q.stop()
  }

  test("horizon-bounded: same-batch replay with two timestamps never " +
    "self-pairs") {
    import java.sql.Timestamp
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    def t(min: Long) = new Timestamp((60 + min) * 60000L)
    val docs = mem.toDS().toDF("id", "text", "ts")
    val pairs = NearDup.candidatePairsWithin(docs, "id", "text", "ts",
      horizonMs = 30L * 60000L, watermarkDelay = "1 minute",
      numPerms = 64, bands = 16, k = 3)
    val qn = "neardup_replay_" + System.nanoTime()
    val q = pairs.toDF("id_a", "id_b").writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName(qn).start()
    try {
      // doc 1 arrives TWICE in one batch, different timestamps — the
      // (id, ts)-dedup regression emitted (1, 1) here
      mem.addData((1L, doc1, t(0)), (1L, doc1, t(5)))
      q.processAllAvailable()
      assert(spark.table(qn).count() == 0)
      // and the id is stored ONCE: a true copy pairs exactly once
      mem.addData((2L, doc1, t(10)))
      q.processAllAvailable()
      val rows = spark.table(qn).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.toSet == Set((1L, 2L)))
      assert(!rows.contains((1L, 1L)))
    } finally q.stop()
  }

  test("maxBucket caps state but capped ids still pair against the store") {
    val copies = (1L to 6L).map(i => (i, doc1))
    val got = runStream2(Seq(copies.take(3), copies.drop(3)), maxBucket = 2)
    // ids 3..6 never enter the store, but each pairs with stored 1 and 2
    assert((3L to 6L).forall(i => got.contains((1L, i)) && got.contains((2L, i))))
    // ids 4..6 cannot pair with 3 (3 was never stored) except intra-batch:
    // 4,5,6 share batch 2 so they pair among themselves
    assert(!got.contains((3L, 4L)))
    assert(got.contains((4L, 5L)))
  }

  private def runStream2(batches: Seq[Seq[(Long, String)]],
                         maxBucket: Int): Set[(Long, Long)] = {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val pairs = NearDup.candidatePairs(
      mem.toDS().toDF("id", "text"), "id", "text",
      numPerms = 64, bands = 16, k = 3, maxBucket = maxBucket)
    val qn = "neardup_cap_" + System.nanoTime()
    val q = pairs.toDF("id_a", "id_b").writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName(qn).start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      spark.table(qn).distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    } finally q.stop()
  }

  test("band guards reject zero, negative and non-divisor band counts") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d")).toDF("id", "text")
    for (bad <- Seq(0, -16, 48, 128)) {
      intercept[IllegalArgumentException] {
        graft.streaming.NearDup.candidatePairs(docs, "id", "text",
          numPerms = 64, bands = bad)
      }
    }
  }
}
