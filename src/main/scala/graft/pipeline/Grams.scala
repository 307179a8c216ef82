package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared positioned word-n-gram construction: tokenize → posexplode →
  * window `lead` for the gram tuple — fully codegen'd, no higher-order
  * functions (HOFs run interpreted per element). One implementation for
  * every n-gram consumer (shingle dedup, decontamination, duplicated
  * spans, repetition features); each caller applies its own hashing,
  * salting, positioning, and distinct on top.
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
    val base = df
      .select(col(idCol).as("id") +: ex :+
        split(col(textCol), "\\s+").as("ws"): _*)
      .select(col("id") +: ex :+
        posexplode(col("ws")).as(Seq("pos", "g0")): _*)
    val win = Window.partitionBy(col("id")).orderBy(col("pos"))
    val leads = (1 until n).map(j =>
      lead(col("g0"), j).over(win).as(s"g$j"))
    base.select(col("id") +: ex ++: col("pos") +: col("g0") +: leads: _*)
      .filter(if (n > 1) col(s"g${n - 1}").isNotNull else lit(true))
  }

  /** The gram's word columns, for hashing: g0 … g(n-1). */
  def wordCols(n: Int): Seq[Column] = (0 until n).map(j => col(s"g$j"))
}
