package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** ANALYZE-style column profiling: one pass over the table producing
  * min / max / exact mean / null count (and, optionally, exact distinct
  * counts) per column. The reference keeps only per-table row counts and
  * key bounds (§2.5); a data engine feeding a catalog wants per-column
  * stats, so this is the natural extension of that surface.
  *
  * Shape: a single partial-aggregated scan — every stat is an
  * algebraic aggregate, so executors combine locally and ship one
  * partial row each. Exact `count(distinct)` columns expand the plan
  * (one shuffle replica per distinct column — Spark's Expand); at
  * 100 TB swap them for `approx_count_distinct`, which stays fully
  * map-combined. Mean is summed in DECIMAL then divided as doubles, so
  * the result is reproducible bit-for-bit across engines.
  */
object Profile {

  def numeric(df: DataFrame, cols: Seq[String],
              distinctCols: Seq[String] = Nil,
              approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val stats = cols.flatMap { c =>
      Seq(
        min(col(c)).as(s"${c}_min"),
        max(col(c)).as(s"${c}_max"),
        (sum(col(c).cast(DecimalType(28, 6))).cast("double") /
          count(col(c)).cast("double")).as(s"${c}_mean"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"))
    }
    val distincts = distinctCols.map { c =>
      if (approxDistinct) approx_count_distinct(col(c))
        .as(s"${c}_distinct")
      else count_distinct(col(c)).as(s"${c}_distinct")
    }
    val all = (count(lit(1)).as("n_rows") +: (stats ++ distincts))
    df.agg(all.head, all.tail: _*)
  }
}
