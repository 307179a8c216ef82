package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, attach the NEWEST
  * right row whose timestamp is at-or-before (strict: before) the left
  * row's timestamp, within the same key — the standard event/state
  * lookup (trade→latest quote, event→latest config change). No
  * reference equivalent (pgloader joins nothing); extension surface.
  *
  * Spark has no ASOF JOIN operator, and the naive encoding — an
  * inequality join condition plus keep-latest — plans as a
  * broadcast-nested-loop or produces the full pair blow-up (every left
  * row × every earlier right row) before the keep-1 trims it. This
  * operator uses the tagged-union shape instead:
  *
  *   1. union both sides with a side tag (one narrow projection each);
  *   2. ONE hash shuffle on the key columns;
  *   3. ONE per-key sort by (ts, side, tieBreak);
  *   4. a running `last(payload, ignoreNulls)` window carries the most
  *      recent right payload forward to each left row.
  *
  * The match is found by POSITION in the merged timeline, not by
  * pairing, so cost is O(|L|+|R|) rows through one exchange — no pair
  * explosion, no range condition, AQE-coalescible, and skewed keys cost
  * only their own sort. This is the shape a 100 TB backfill wants.
  */
object AsOfJoin {

  /** Left rows with the newest at-or-before right payload attached.
    *
    * @param keys     equi-key columns present on both sides
    * @param leftTs   left ordering column name
    * @param rightTs  right ordering column name (cast-compatible with
    *                 leftTs)
    * @param payload  right columns to attach (must not collide with
    *                 left column names); NULL when no right row precedes
    * @param strict   true = right rows at exactly the left timestamp
    *                 are NOT visible (`<`), false = they are (`<=`)
    * @param tieBreak extra right-side ordering columns: when several
    *                 right rows share (key, ts), the row greatest under
    *                 this order wins; pass enough columns to make the
    *                 winner unique or it is undefined
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String, payload: Seq[String],
           strict: Boolean = false,
           tieBreak: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    require(payload.nonEmpty, "need at least one payload column")
    val leftCols = left.columns.toSeq
    require(payload.forall(!leftCols.contains(_)),
      s"payload collides with left columns: " +
        payload.filter(leftCols.contains).mkString(","))
    val reserved = Seq("__ts", "__side", "__pay", "__match") ++
      tieBreak.map(c => s"__tb_$c")
    require(leftCols.intersect(reserved).isEmpty,
      s"left columns collide with internals: " +
        leftCols.intersect(reserved).mkString(","))

    // side tag orders the merged timeline at equal ts: non-strict wants
    // right rows visible to same-ts left rows (right sorts first);
    // strict hides them (right sorts after left).
    val (rightSide, leftSide) = if (strict) (2, 1) else (0, 1)

    // tie-break columns ride along only to ORDER right rows among
    // themselves; left rows carry NULLs there (nulls_first keeps them
    // stable relative to the side tag).
    val l = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("__ts"),
        lit(leftSide).as("__side")) ++
        tieBreak.map(c => lit(null).as(s"__tb_$c")) ++
        Seq(lit(null).as("__pay")) ++
        leftCols.filterNot(keys.contains).map(col): _*)
    val r = right
      // equi-key contract: NULL keys never match (SQL join semantics;
      // the window's partitionBy would otherwise group NULLs together
      // and attach right payloads to NULL-keyed left rows). A NULL
      // right TIMESTAMP is dropped too: ASC sorts nulls FIRST, so an
      // unfiltered null-ts row would become the "earliest" payload and
      // attach to every left row before the first real right row.
      .filter((keys.map(col(_).isNotNull) :+ col(rightTs).isNotNull)
        .reduce(_ && _))
      .select(
        keys.map(col) ++ Seq(col(rightTs).as("__ts"),
          lit(rightSide).as("__side")) ++
          tieBreak.map(c => col(c).as(s"__tb_$c")) ++
          // qcol: a payload name containing '.' must resolve as the
          // literal column, not a nested-field path
          Seq(struct(payload.map(ProjectFields.qcol): _*).as("__pay")) ++
          leftCols.filterNot(keys.contains)
            .map(c => lit(null).as(c)): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((col("__ts").asc +: col("__side").asc +:
        tieBreak.map(c => col(s"__tb_$c").asc_nulls_first)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("__match", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === leftSide)
      .select(leftCols.map(col) ++
        payload.map(p => col("__match").getField(p).as(p)): _*)
  }
}
