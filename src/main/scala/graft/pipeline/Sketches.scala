package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches — the fixed-size summaries a 100 TB
  * pipeline keeps when exact per-item state no longer fits: Count-Min
  * (Cormode & Muthukrishnan 2005, "An improved data stream summary:
  * the count-min sketch and its applications") over arbitrary item
  * columns. Training-data-pipeline extension (no reference equivalent —
  * pgloader is pure ETL), designed Spark-first.
  *
  * The sketch LIVES AS A DATAFRAME of (d, idx, cnt) counter cells —
  * at most `depth × width` rows regardless of corpus size — so it
  * composes with the engine instead of hiding in driver memory:
  * building is one hash aggregate (map-side combined, so each task
  * contributes at most its own `depth × width` partial cells to the
  * exchange, not its item count), merging two sketches is union +
  * sum, and persisting is writing a tiny table. Nothing is collected.
  *
  * Guarantees (standard CMS): an estimate NEVER undercounts; with
  * width w and depth d it overcounts item x by more than `e·N/w`
  * (N = total occurrences) with probability at most `e^-d`. Heavy
  * hitters therefore never go missing — false POSITIVES are the only
  * error mode, and a second exact pass over the (tiny) candidate set
  * removes those when needed.
  *
  * Depth rows hash with independent seeds (`graft-cms-<d>` salt
  * through xxhash64), so the d rows of one item are independent
  * bucket draws.
  */
object Sketches {

  private def bucketCols(item: Column, width: Int, depth: Int): Column =
    array((0 until depth).map(d => struct(lit(d).as("d"),
      pmod(xxhash64(lit(s"graft-cms-$d"), item), lit(width.toLong))
        .as("idx"))): _*)

  /** Build a Count-Min sketch over `itemCol`: one (d, idx, cnt) row
    * per non-empty counter cell, `cnt` = how many input rows hashed
    * there at depth `d`. Null items are skipped (they carry no
    * frequency). `weightCol`, when given, adds that column instead of
    * 1 per row (pre-aggregated inputs). */
  def cmsSketch(df: DataFrame, itemCol: String, width: Int = 8192,
                depth: Int = 4, weightCol: Option[String] = None)
      : DataFrame = {
    require(width > 0 && depth > 0,
      s"width/depth must be positive, got $width/$depth")
    // a negative weight would DECREMENT counter cells and silently void
    // the never-undercounts guarantee heavyHitters relies on — reject
    // it loudly at the row
    val w = weightCol.map(c =>
      when(col(c) >= 0, col(c).cast("long")).otherwise(
        raise_error(concat(lit("cmsSketch: negative weight: "),
          col(c).cast("string"))).cast("long"))).getOrElse(lit(1L))
    df.filter(col(itemCol).isNotNull)
      .select(explode(bucketCols(col(itemCol), width, depth)).as("b"),
        w.as("w"))
      .groupBy(col("b.d").as("d"), col("b.idx").as("idx"))
      .agg(sum(col("w")).as("cnt"))
  }

  /** Merge sketches built with the SAME width/depth: cell-wise sum.
    * (CMS is a linear sketch — merge of sketches = sketch of the
    * union, exactly.) */
  def cmsMerge(sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "need at least one sketch")
    sketches.reduce(_ unionByName _)
      .groupBy(col("d"), col("idx")).agg(sum(col("cnt")).as("cnt"))
  }

  /** Point-query estimates for every row of `probes`: min over the
    * depth counters each probe item hashes to. Cells absent from the
    * sketch count 0. NULL probe items are dropped, mirroring the build
    * side (xxhash64 would otherwise skip the null argument and read
    * the salt-only buckets — a spurious count for an item the sketch
    * never saw). Output: probes' columns + `est`.
    *
    * Scale: probes explode ×depth, join the (≤ depth·width row —
    * broadcast-sized by construction) sketch, and re-group — the probe
    * frame never widens beyond (item, d, idx). */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, itemCol: String,
                  width: Int = 8192, depth: Int = 4): DataFrame = {
    Seq("d", "idx", "cnt", "b", "est").foreach(r =>
      require(!probes.columns.contains(r),
        s"probe column $r collides with sketch internals"))
    val cols = probes.columns.map(col).toSeq
    probes.filter(col(itemCol).isNotNull)
      .select(cols :+
        explode(bucketCols(col(itemCol), width, depth)).as("b"): _*)
      .join(broadcast(sketch),
        col("b.d") === sketch("d") && col("b.idx") === sketch("idx"),
        "left")
      .groupBy(cols: _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Heavy hitters: distinct items of `itemCol` whose CMS estimate is
    * at least `minCount`. Never misses a true heavy hitter (CMS never
    * undercounts); may surface a false positive when an item collides
    * with heavier ones in EVERY depth row — shrink by raising width
    * or running an exact count over the surviving candidates (they
    * are few by construction). */
  def heavyHitters(df: DataFrame, itemCol: String, minCount: Long,
                   width: Int = 8192, depth: Int = 4): DataFrame = {
    val sk = cmsSketch(df, itemCol, width, depth)
    cmsEstimate(sk, df.select(col(itemCol)).filter(col(itemCol).isNotNull)
        .distinct(), itemCol, width, depth)
      .filter(col("est") >= minCount)
  }
}
