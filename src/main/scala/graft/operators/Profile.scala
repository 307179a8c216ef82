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

  /** Exact discrete quantiles per column — SQL-standard
    * `percentile_disc` semantics: the smallest actual value whose
    * cumulative distribution reaches `p` (no interpolation, so the
    * result is always an element of the column and engine-exact).
    *
    * Exact percentiles aggregate a value→count map per partition
    * (map-side combined, memory ∝ distinct values, fine for
    * bounded-cardinality measures). For 100 TB high-cardinality
    * columns set `approx = true`: `approx_percentile`'s sketch is
    * constant-memory and fully map-combined, at ±accuracy rank error.
    *
    * Output: one row, columns `<col>_p<percent>`.
    */
  def quantiles(df: DataFrame, cols: Seq[String], probs: Seq[Double],
                approx: Boolean = false,
                accuracy: Int = 10000): DataFrame = {
    require(cols.nonEmpty && probs.nonEmpty, "need columns and probs")
    require(probs.forall(p => p > 0.0 && p <= 1.0),
      s"probs must be in (0, 1]: ${probs.mkString(",")}")
    // injective labels: 0.25 -> p25, 0.995 -> p99_5 (rounding to whole
    // percents collapsed distinct probs into one duplicate column name)
    def label(p: Double): String =
      "p" + (BigDecimal(p.toString) * 100).bigDecimal
        .stripTrailingZeros.toPlainString.replace('.', '_')
    require(probs.map(label).distinct.length == probs.length,
      s"probs map to duplicate labels: ${probs.mkString(",")}")
    val aggs = for { c <- cols; p <- probs } yield {
      val name = s"${c}_${label(p)}"
      if (approx)
        percentile_approx(col(c), lit(p), lit(accuracy)).as(name)
      else {
        // double embedded backticks (the qcol escaping rule) — a raw
        // interpolation would mis-parse a column named a`b
        val q = c.replace("`", "``")
        expr(s"percentile_disc($p) WITHIN GROUP (ORDER BY `$q`)")
          .as(name)
      }
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Per-group z-score outliers — the distribution-drift alarm a
    * pipeline runs over every numeric signal (event values, doc
    * lengths, embedding norms): rows whose value sits more than
    * `zThreshold` standard deviations from their GROUP's mean.
    *
    * Shape: one group-keyed aggregate (sum/sum-of-squares in exact
    * DECIMAL — map-side combined, engine-reproducible), broadcast back
    * onto the rows (group cardinality ≪ row count), one narrow filter.
    * The z-score emits as integer MICROS: mean/variance derive from
    * exact decimal sums, but the final divide-by-sqrt is a double and
    * the micro grid keeps it engine-comparable ([[graft.pipeline.Drift]]
    * precedent). Groups with zero variance or a single row emit no
    * outliers (no scale to judge against).
    *
    * Magnitude contract: values quantize at 1e-6 and must fit
    * DECIMAL(18,6) (|v| < 1e12), with the per-group sum of squares
    * inside DECIMAL(38,12) (~1e26) — under Spark's default ANSI mode a
    * group beyond either bound fails LOUDLY (cast/sum overflow error)
    * rather than skewing moments.
    *
    * Output: input row + (z_micro); only rows with |z| >= zThreshold.
    */
  def outliers(df: DataFrame, groupCol: String, valueCol: String,
               zThreshold: Double = 3.0): DataFrame = {
    require(zThreshold > 0, s"zThreshold must be > 0, got $zThreshold")
    val clash = df.columns.toSeq
      .intersect(Seq("__n", "__s", "__s2", "z_micro"))
    require(clash.isEmpty,
      s"input columns collide with internals: ${clash.mkString(",")}")
    // square AFTER the decimal cast: long-typed inputs (byte counters)
    // would overflow v*v in their native type before the cast could
    // make the moment exact
    val vDec = col(valueCol).cast(DecimalType(18, 6))
    val g = df.groupBy(col(groupCol)).agg(
      count(col(valueCol)).as("__n"),
      sum(vDec).as("__s"),
      sum(vDec * vDec).as("__s2"))
    val n = col("__n").cast("double")
    val mean = col("__s").cast("double") / n
    val ex2 = col("__s2").cast("double") / n
    // relative epsilon, not a bare >0 guard: for an (effectively)
    // constant group, ex2 - mean² is rounding NOISE around zero — a
    // stray +1e-18 residue would make std ~1e-9 and flag quantization
    // dust as extreme outliers. 1e-14: ~50× above the double-rounding
    // floor (~2e-16 relative) but far below genuine tiny variances —
    // the earlier 1e-12 silently zeroed real std below 1e-6 of a
    // group's RMS (micros-scaled money at offset 1e6, std 0.5)
    val rawVar = ex2 - mean * mean
    val variance = when(rawVar <= ex2 * lit(1e-14), lit(0.0))
      .otherwise(rawVar)
    val std = sqrt(greatest(variance, lit(0.0)))
    val z = (col(valueCol) - mean) / std
    df.join(broadcast(g), groupCol)
      .filter(col("__n") > 1 && std > 0 &&
        abs(z) >= lit(zThreshold))
      .withColumn("z_micro",
        floor(z * lit(1e6) + lit(0.5)).cast("long"))
      // the USING join moves the group key first — restore the input's
      // column order so the operator is order-preserving + one column
      .select(df.columns.map(col) :+ col("z_micro"): _*)
  }
}
