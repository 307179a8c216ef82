package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points = Seq((1L, 5.0), (2L, 10.0), (3L, 17.0), (4L, 99.0))
    .toDF("pid", "v")
  private def bands = Seq((10L, 0.0, 10.0), (20L, 10.0, 20.0),
      (30L, 15.0, 40.0))
    .toDF("band", "lo", "hi")

  test("each point pairs with every containing interval") {
    val got = RangeJoin.pointInInterval(points, "v", bands, "lo", "hi",
        cellSize = 4)
      .select("pid", "band").as[(Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 10L),            // 5 in [0,10]
      (2L, 10L), (2L, 20L), // 10 on both closed boundaries
      (3L, 20L), (3L, 30L), // 17 in the overlap
      ))                    // 99 matches nothing
  }

  test("half-open intervals exclude the hi boundary") {
    val got = RangeJoin.pointInInterval(points, "v", bands, "lo", "hi",
        cellSize = 4, inclusiveHi = false)
      .select("pid", "band").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 20L), (3L, 20L), (3L, 30L)))
  }

  test("cell size does not change the result, only the plan") {
    for (cs <- Seq(1L, 7L, 1000L)) {
      val got = RangeJoin.pointInInterval(points, "v", bands, "lo", "hi",
          cellSize = cs)
        .select("pid", "band").as[(Long, Long)].collect().toSet
      assert(got.size == 5, s"cellSize=$cs")
    }
  }

  test("null or inverted intervals are dropped, not matched") {
    val dirty = Seq((1L, Some(0.0), Some(10.0)), (2L, None, Some(5.0)),
        (3L, Some(9.0), Some(1.0)))
      .toDF("band", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "v", dirty, "lo", "hi",
        cellSize = 4)
      .select("band").as[Long].collect().toSeq
    assert(got == Seq(1L, 1L)) // points 5 and 10, both only in [0,10]
  }

  test("plan is an equi-join, not a nested-loop product") {
    val plan = RangeJoin.pointInInterval(points, "v", bands, "lo", "hi",
        cellSize = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin")
      && !plan.contains("CartesianProduct"), plan)
  }

  test("negative values land in the right cells") {
    val p = Seq((1L, -7.0)).toDF("pid", "v")
    val b = Seq((1L, -10.0, -5.0)).toDF("band", "lo", "hi")
    val got = RangeJoin.pointInInterval(p, "v", b, "lo", "hi", 4)
    assert(got.count() == 1)
  }
}
