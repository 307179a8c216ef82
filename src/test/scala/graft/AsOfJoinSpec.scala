package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // (key, ts, id) left events; (key, ts, qid, px) right quotes
  private def leftDf = Seq(
    (1L, 10L, 100L), (1L, 20L, 101L), (1L, 25L, 102L),
    (2L, 5L, 200L), (3L, 50L, 300L))
    .toDF("k", "t", "id")
  private def rightDf = Seq(
    (1L, 10L, 900L, 1.0), (1L, 15L, 901L, 2.0), (1L, 30L, 902L, 3.0),
    (2L, 7L, 903L, 4.0))
    .toDF("k", "t", "qid", "px")
    .select(col("k"), col("t"), col("qid"), col("px"))

  test("asOf attaches the newest at-or-before right row per key") {
    val got = AsOfJoin.asOf(
        leftDf, rightDf.withColumnRenamed("t", "rt"), Seq("k"),
        "t", "rt", Seq("qid", "px"), tieBreak = Seq("qid"))
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long])))
    assert(got.toSeq == Seq(
      100L -> Some(900L),  // tie at ts=10 visible (non-strict)
      101L -> Some(901L),  // latest of 10,15
      102L -> Some(901L),  // 30 is in the future
      200L -> None,        // right at 7 > 5: nothing yet
      300L -> None))       // key 3 has no right rows at all
  }

  test("NULL keys never match (equi-join contract)") {
    val l = Seq((1L, Option(1L), 20L), (2L, Option.empty[Long], 20L))
      .toDF("id", "k", "t")
    val r = Seq((Option(1L), 10L, 900L), (Option.empty[Long], 10L, 999L))
      .toDF("k", "rt", "qid")
    val got = AsOfJoin.asOf(l, r, Seq("k"), "t", "rt", Seq("qid"))
      .orderBy("id").collect()
      .map(x => (x.getLong(0), Option(x.get(3)).map(_.asInstanceOf[Long])))
    // NULL-key left row gets NO payload even though a NULL-key right
    // row exists at an earlier ts
    assert(got.toSeq == Seq(1L -> Some(900L), 2L -> None))
  }

  test("strict mode hides right rows at the exact left timestamp") {
    val got = AsOfJoin.asOf(
        leftDf, rightDf.withColumnRenamed("t", "rt"), Seq("k"),
        "t", "rt", Seq("qid"), strict = true, tieBreak = Seq("qid"))
      .orderBy("id")
      .collect()
      .map(r => Option(r.get(3)).map(_.asInstanceOf[Long]))
    // ts=10 tie now invisible for id=100
    assert(got.toSeq == Seq(None, Some(901L), Some(901L), None, None))
  }

  test("ties among right rows at one (key, ts) resolve by tieBreak") {
    val r2 = Seq((1L, 10L, 1L, 1.0), (1L, 10L, 9L, 9.0), (1L, 10L, 5L, 5.0))
      .toDF("k", "rt", "qid", "px")
    val got = AsOfJoin.asOf(
        Seq((1L, 10L, 0L)).toDF("k", "t", "id"), r2, Seq("k"),
        "t", "rt", Seq("qid", "px"), tieBreak = Seq("qid"))
      .head()
    assert(got.getLong(3) == 9L && got.getDouble(4) == 9.0)
  }

  test("left schema and row count are preserved (left outer contract)") {
    val out = AsOfJoin.asOf(
      leftDf, rightDf.withColumnRenamed("t", "rt"), Seq("k"),
      "t", "rt", Seq("qid", "px"), tieBreak = Seq("qid"))
    assert(out.columns.toSeq == Seq("k", "t", "id", "qid", "px"))
    assert(out.count() == leftDf.count())
  }

  test("plan has exactly one exchange (no pair blow-up, no range join)") {
    val out = AsOfJoin.asOf(
      leftDf, rightDf.withColumnRenamed("t", "rt"), Seq("k"),
      "t", "rt", Seq("qid"), tieBreak = Seq("qid"))
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 shuffle, plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin")
      && !plan.contains("CartesianProduct"))
  }

  test("a NULL right timestamp never becomes the earliest match") {
    import spark.implicits._
    val trades = Seq((1L, 100L)).toDF("k", "ts")
    val quotes = Seq(
      (1L, Option.empty[Long], 111.1),  // null ts: must not attach
      (1L, Some(50L), 42.0))
      .toDF("k", "ts", "px")
    val got = graft.operators.AsOfJoin.asOf(trades, quotes,
      keys = Seq("k"), leftTs = "ts", rightTs = "ts",
      payload = Seq("px")).head()
    assert(got.getDouble(2) == 42.0)
  }
}
