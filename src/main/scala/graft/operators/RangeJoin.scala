package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join: pair every point with every interval
  * containing it — the IP→geo / price→band / ts→validity-window lookup.
  * No reference equivalent (pgloader joins nothing); extension surface.
  *
  * A raw `p >= lo AND p <= hi` condition has no equi-key, so Spark
  * plans it as BroadcastNestedLoopJoin (every point × every interval)
  * — quadratic the moment the interval side outgrows a broadcast. The
  * standard scale shape is GRID BUCKETING:
  *
  *   1. pick a cell size; every value maps to cell `floor(v / cell)`;
  *   2. explode each interval to the cells it covers
  *      (`sequence(cell(lo), cell(hi))` — one narrow generator);
  *   3. equi-join points to exploded intervals on the cell id;
  *   4. re-check the exact range predicate on the survivors.
  *
  * The join becomes a plain hash/sort-merge equi-join: shuffled on the
  * cell key, AQE-coalescible, broadcastable when the exploded interval
  * side is small. Cost knob: interval-side duplication is
  * `width/cellSize + 1` rows per interval, and candidate fan-in per
  * point is the intervals overlapping its cell — pick `cellSize` near
  * the median interval width (duplication ~2×, candidates ~spot-on).
  * Skewed cells (a hot value range) are ordinary join skew: AQE's
  * skew-join split handles them, no salting needed.
  */
object RangeJoin {

  /** Points joined to every containing interval (inner join).
    *
    * @param pointCol    numeric column on `points`
    * @param loCol hiCol numeric interval bounds on `intervals`
    *                    (lo <= hi; NULL bounds drop the interval)
    * @param cellSize    grid cell width (> 0), in the value's units
    * @param inclusiveHi true = `[lo, hi]`, false = `[lo, hi)`
    */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      cellSize: Long,
                      inclusiveHi: Boolean = true): DataFrame = {
    require(cellSize > 0, s"cellSize must be > 0, got $cellSize")
    val overlap = points.columns.toSet
      .intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"point/interval column names collide: ${overlap.mkString(",")}")
    require(!points.columns.contains("__cell") &&
      !intervals.columns.contains("__cell"),
      "column name __cell is reserved")

    val cell = (c: org.apache.spark.sql.Column) =>
      floor(c.cast("double") / cellSize).cast("long")
    val exploded = intervals
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull &&
        col(loCol) <= col(hiCol))
      .withColumn("__cell",
        explode(sequence(cell(col(loCol)), cell(col(hiCol)))))
    val keyed = points.withColumn("__cell", cell(col(pointCol)))
    val hiPred = if (inclusiveHi) col(pointCol) <= col(hiCol)
                 else col(pointCol) < col(hiCol)
    keyed.join(exploded, Seq("__cell"))
      .filter(col(pointCol) >= col(loCol) && hiPred)
      .drop("__cell")
  }
}
