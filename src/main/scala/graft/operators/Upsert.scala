package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-wins merge for change-data-capture shaped inputs: collapse a
  * log of row versions to the newest version per key. The continuous-
  * migration counterpart of the reference's one-shot table copy
  * (pgloader re-loads a table wholesale; a 100 TB pipeline applies the
  * change log instead).
  *
  * Shape: ONE hash shuffle on the key columns, then a per-key window
  * keep-1. The `row_number <= 1` filter triggers Catalyst's
  * WindowGroupLimit pushdown, so each MAP task pre-trims to one row per
  * key before the exchange — a hot key (one device spamming updates)
  * ships tasks × 1 rows, not its whole update history. No driver-side
  * anything; scales with the log, not the key space.
  */
object Upsert {

  /** Keep the newest row per `keys`, "newest" = descending
    * lexicographic order of `version` columns (ties must be broken by
    * the caller passing more columns — e.g. a sequence/event id — or
    * the winner is undefined). */
  def latestByKey(df: DataFrame, keys: Seq[String],
                  version: Seq[Column]): DataFrame = {
    require(keys.nonEmpty && version.nonEmpty, "need keys and version")
    require(!df.columns.contains("__rn"),
      "input column __rn collides with internals")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(version.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
