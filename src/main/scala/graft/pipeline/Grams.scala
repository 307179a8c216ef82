package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared positioned word-n-gram construction: tokenize → explode an
  * index range → `element_at` for the gram tuple — fully codegen'd, no
  * higher-order functions (HOF lambdas run interpreted per element) and
  * NO shuffle: the gram words come straight out of the per-row token
  * array, unlike a posexplode + window-`lead` shape whose
  * `partitionBy(id)` exchanges and sorts the corpus-sized exploded rows
  * before any consumer does its own work. One implementation for every
  * n-gram consumer (shingle dedup, decontamination, duplicated spans,
  * repetition features); each caller applies its own hashing, salting,
  * positioning, and distinct on top.
  */
private[pipeline] object Grams {

  /** One row per COMPLETE word n-gram: (id, extra…, pos, g0 … g(n-1)),
    * `pos` = 0-based position of the gram's first word. Whitespace
    * tokenization; documents shorter than `n` words produce no rows.
    * `extra` columns ride through unchanged (constant per id — e.g. a
    * source/domain label), so callers that key grams by something other
    * than the document id don't need a corpus-sized join-back. */
  def positioned(df: DataFrame, idCol: String, textCol: String,
                 n: Int, extra: Seq[String] = Nil): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    val ex = extra.map(col)
    val ws = col("ws")
    // gram start positions: 0 .. size-n (empty/short/null docs → no rows)
    val idxs = when(size(ws) >= n, sequence(lit(0), size(ws) - n))
      .otherwise(array().cast("array<int>"))
    val grams = (0 until n).map(j =>
      element_at(ws, col("pos") + j + 1).as(s"g$j"))
    df.select(col(idCol).as("id") +: ex :+
        split(col(textCol), "\\s+").as("ws"): _*)
      .select(col("id") +: ex :+ ws :+ explode(idxs).as("pos"): _*)
      .select(col("id") +: ex ++: col("pos") +: grams: _*)
  }

  /** The gram's word columns, for hashing: g0 … g(n-1). */
  def wordCols(n: Int): Seq[Column] = (0 until n).map(j => col(s"g$j"))
}
