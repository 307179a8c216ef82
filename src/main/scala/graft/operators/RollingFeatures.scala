package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Rolling time-window features per key — the feature-engineering pass
  * a behavioral model wants ("events in the last hour/day per user").
  * No reference equivalent (pgloader aggregates nothing); extension
  * surface.
  *
  * Shape: ONE hash shuffle on the key, one per-key sort by event time,
  * then every lookback window is evaluated in the same Window operator
  * over a RANGE frame — adding a lookback adds zero passes. Skewed
  * keys cost their own sort only (a hot user's history sorts on one
  * task); if one key's history outgrows a task, pre-aggregate to a
  * coarser time grain first (e.g. per-minute buckets), which shrinks
  * rows without changing any window sum.
  *
  * Exactness contract: rolling sums are over LONG columns (e.g. cents
  * via `floor(value*100)`), never raw doubles — float window sums are
  * order-dependent, so they'd differ engine to engine and run to run.
  */
object RollingFeatures {

  /** The per-key, time-ordered RANGE frame `[t - lookback, t]`. */
  def timeFrame(keys: Seq[String], timeCol: String,
                lookback: Long): WindowSpec =
    Window.partitionBy(keys.map(col): _*).orderBy(col(timeCol))
      .rangeBetween(-lookback, 0)

  /** Append `n_<suffix>` (event count) and, per entry in `sumCols`,
    * `sum_<col>_<suffix>` rolling sums for every `(suffix, lookback)`
    * window. `timeCol` must be a numeric epoch column (e.g. micros) —
    * RANGE frames need numeric order keys.
    */
  def withActivity(df: DataFrame, keys: Seq[String], timeCol: String,
                   lookbacks: Seq[(String, Long)],
                   sumCols: Seq[String] = Nil): DataFrame = {
    require(lookbacks.nonEmpty, "need at least one lookback window")
    // generated names must not overwrite inputs (withColumn replaces
    // silently) or each other (a duplicated suffix would mask the
    // earlier window's feature)
    val outNames = lookbacks.flatMap { case (sfx, _) =>
      s"n_$sfx" +: sumCols.map(c => s"sum_${c}_$sfx") }
    require(outNames.distinct.length == outNames.length,
      s"duplicate lookback suffixes generate colliding outputs: " +
        outNames.diff(outNames.distinct).mkString(","))
    val clash = df.columns.toSeq.intersect(outNames)
    require(clash.isEmpty,
      s"input columns collide with generated features: " +
        clash.mkString(","))
    lookbacks.foldLeft(df) { case (d, (suffix, lb)) =>
      val w = timeFrame(keys, timeCol, lb)
      val withN = d.withColumn(s"n_$suffix", count(lit(1)).over(w))
      sumCols.foldLeft(withN) { (dd, c) =>
        dd.withColumn(s"sum_${c}_$suffix", sum(col(c)).over(w))
      }
    }
  }
}
