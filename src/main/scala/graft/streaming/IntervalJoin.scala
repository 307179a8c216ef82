package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join: pair each left event with
  * every right event for the same key whose timestamp falls in
  * [left.ts, left.ts + horizon] — clicks→purchases attribution, request→
  * response matching, sensor correlation.
  *
  * This is the canonical Spark stream-stream join shape: BOTH sides carry
  * a watermark and the join condition bounds event time in BOTH
  * directions (equi-key AND a closed time range). That pair of bounds is
  * what lets the state store evict: each side buffers only rows younger
  * than watermark + horizon, so state is O(rate × horizon), not O(stream).
  * Without the range condition a stream-stream join must keep every row
  * forever — the unbounded-state mistake this operator exists to avoid.
  *
  * Works identically on batch frames (same API, no state) — the batch
  * path is the oracle for the streaming one.
  *
  * @param left     left stream/frame, watermark already applied
  * @param right    right stream/frame, watermark already applied
  * @param keyCol   equi-join key present on both sides
  * @param leftTs   left event-time column name
  * @param rightTs  right event-time column name
  * @param horizon  max right.ts − left.ts, e.g. "10 minutes"
  *
  * The right side's copy of `keyCol` is dropped from the output (the
  * equi-join makes it redundant, and keeping both made a plain
  * `col(keyCol)` reference on the result AMBIGUOUS); every other
  * column of both sides survives — reference same-named non-key
  * columns through the `l.`/`r.` aliases.
  */
object IntervalJoin {
  def join(left: DataFrame, right: DataFrame, keyCol: String,
           leftTs: String, rightTs: String, horizon: String): DataFrame = {
    val l = left.alias("l")
    val r = right.alias("r")
    l.join(r,
        col(s"l.$keyCol") === col(s"r.$keyCol") &&
          col(s"r.$rightTs") >= col(s"l.$leftTs") &&
          col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $horizon"))
      .drop(col(s"r.$keyCol"))
  }
}
