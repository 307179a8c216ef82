package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-step funnel over an event log: for each user, the earliest
  * time they completed step 1, then the earliest step-2 event strictly
  * AFTER that, and so on — the standard product-analytics conversion
  * funnel, where a user counts for step i only if the steps happened in
  * order.
  *
  * Shape: one filtered slice of the log per step; step i resolves with
  * an equi-join on the user key followed by a user-keyed min-aggregate.
  * Every shuffle in the chain is keyed on the SAME user column, so the
  * exchange introduced by the first aggregate is reused by every later
  * join+aggregate (Catalyst sees compatible hash partitioning — no
  * re-shuffle per step), and per-step state never exceeds one row per
  * user. Non-converting users stay in the output with NULL timestamps
  * from their drop-off step onward — computing drop-off rates is the
  * point of a funnel.
  */
object Funnel {

  /** @param events the event log
    * @param userCol user/entity key column
    * @param tsCol   event-time column (any orderable type)
    * @param typeCol event-type column matched against `steps`
    * @param steps   ordered step types, at least one
    * @return one row per user that completed step 1:
    *         (user, ts_1, ts_2, …, ts_n) with NULL from the first
    *         uncompleted step onward
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val reserved = "user" +: "__t" +:
      steps.indices.map(i => s"ts_${i + 1}")
    val clash = events.columns.toSeq
      .filterNot(c => c == userCol || c == tsCol || c == typeCol)
      .intersect(reserved)
    require(clash.isEmpty,
      s"event columns collide with outputs/internals: ${clash.mkString(",")}")
    require(userCol != "__t" && tsCol != "user",
      s"userCol/tsCol collide with internals: userCol=$userCol tsCol=$tsCol")
    val slice = (st: String) => events.filter(col(typeCol) === st)
      .select(col(userCol).as("user"), col(tsCol).as("__t"))
    val base = slice(steps.head).groupBy(col("user"))
      .agg(min(col("__t")).as("ts_1"))
    steps.tail.zipWithIndex.foldLeft(base) { case (acc, (st, i)) =>
      val prev = s"ts_${i + 1}"
      val cur = s"ts_${i + 2}"
      val carried = acc.columns.filter(_ != "user").map(col)
      acc.join(slice(st), Seq("user"), "left")
        .groupBy(col("user") +: carried: _*)
        .agg(min(when(col("__t") > col(prev), col("__t"))).as(cur))
    }
  }
}
