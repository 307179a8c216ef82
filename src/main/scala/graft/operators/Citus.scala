package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{broadcast, col}
import graft.catalog.{Catalog, Table}
import graft.dsl.Ast.{DistributeReference, DistributeRule, DistributeUsing}

/** Citus DISTRIBUTE rule application — backfilling the distribution key
  * into tables that reference the distribution root only indirectly
  * (src/utils/citus.lisp:305-371 format-citus-join-clause /
  * citus-format-sql-select; rule application :250-282; DSL
  * grammar.clj:70-75).
  *
  * `DISTRIBUTE t USING key FROM f1, f2` means: t → f1 → f2 is a chain of
  * foreign keys, and `f2` (the last hop) carries `key`. The dataflow is
  * the FK-chain join with the key column prepended — each hop resolved
  * from the CATALOG's fkey metadata, not hand-written joins.
  *
  * Spark shape: inner equi-joins along the chain; the pivot tables are
  * usually dimension-sized, so they are broadcast.
  */
object Citus {

  /** Build the backfill dataflow for `table` under `rule`.
    *
    * @param frames  source DataFrame per table name (the scan layer)
    * @return the table's rows with the distribution key as the FIRST
    *         column, named `<rule.column>` (prefixed to the PK too in the
    *         reference — DDL concern, catalog side)
    */
  def backfillJoin(cat: Catalog, rule: DistributeUsing,
                   frames: Map[String, DataFrame]): DataFrame = {
    // case-INSENSITIVE resolution throughout — the DSL preserves the
    // user's case while introspection reports the catalog's, and every
    // other layer (Runner, the fkey search below) already matches
    // insensitively; an exact-case map would pass DDL and then throw
    // here, mid-migration
    val tables = cat.allTables.map(t => t.name.toLowerCase -> t).toMap
    def table(n: String): Table = tables.getOrElse(n.toLowerCase,
      throw new IllegalArgumentException(s"unknown table in rule: $n"))
    def frame(n: String): DataFrame = frames.collectFirst {
      case (k, v) if k.equalsIgnoreCase(n) => v
    }.getOrElse(throw new IllegalArgumentException(
      s"no source frame for table: $n"))

    val source = table(rule.table)
    var df = frames.getOrElse(rule.table, frame(rule.table))
    // the frame whose columns the NEXT hop's fkey lives on — join
    // conditions resolve through it (expression-id based), never by
    // name on the accumulated frame, where a denormalized column of an
    // earlier chain table with the same name would be ambiguous
    var curFrame = df
    var current = source
    // walk the declared FK chain: each hop joins on the fkey that points
    // at the next FROM table (citus.lisp:312-340)
    rule.from.foreach { hop =>
      val fkey = current.fkeys.find(
        _.foreignTable.equalsIgnoreCase(hop)).getOrElse(
        throw new IllegalArgumentException(
          s"${current.name} has no foreign key to $hop — " +
            "DISTRIBUTE ... FROM chain must follow fkeys"))
      val right = frame(hop)
      val cond = fkey.columns.zip(fkey.foreignColumns).map {
        case (c, fc) => curFrame(c) === right(fc)
      }.reduce(_ && _)
      df = df.join(broadcast(right), cond, "inner")
      curFrame = right
      current = table(hop)
    }
    // distribution key comes from the LAST hop's frame; source columns
    // follow (citus-format-sql-select column ordering)
    val lastFrame = frame(rule.from.lastOption.getOrElse(rule.table))
    val srcFrame = frame(rule.table)
    df.select(
      (lastFrame(rule.column).as(rule.column) +:
        source.fields.map(f => srcFrame(f.name))): _*)
  }

  /** Which tables become reference tables / distributed tables — the DDL
    * side (`create_distributed_table` / `create_reference_table`,
    * ddl/citus.clj). */
  def distributionDdl(rules: Seq[DistributeRule]): Seq[String] =
    rules.map {
      case DistributeReference(t) =>
        s"SELECT create_reference_table('$t');"
      case DistributeUsing(t, c, _) =>
        s"SELECT create_distributed_table('$t', '$c');"
    }
}
