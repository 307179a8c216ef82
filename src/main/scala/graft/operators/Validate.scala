package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pre-flight constraint validation: apply the TARGET table's type and
  * NOT NULL constraints to the all-string staged rows BEFORE shipping
  * them, classifying each row as loadable or rejected-with-reason.
  *
  * The reference discovers bad rows by letting PostgreSQL reject a COPY
  * batch and bisecting to isolate the culprit
  * (src/pg-copy/pgsql-copy-batch.lisp — our CopySink/BatchRetry mirror
  * it). That is the only option when PG is the arbiter; but at 100 TB a
  * server round-trip per bad batch is the expensive way to find
  * malformed rows. Preflight runs the same checks as ONE codegen'd
  * projection over the corpus — no shuffle, no server, rejects land in
  * reject files with reasons while clean rows stream on — and the
  * sink's bisect remains as the backstop for constraints only the
  * server can check (FKs, unique, collation).
  *
  * `try_cast` implements PG's type acceptance closely for the numeric /
  * date / timestamp / boolean families; checks are per-rule, so one row
  * can carry several reasons.
  */
object Validate {

  /** One target-column constraint: `sqlType` is a Spark SQL type name
    * (int, bigint, double, decimal(12,2), date, timestamp, boolean,
    * string, …). */
  final case class Rule(name: String, sqlType: String,
                        notNull: Boolean = false)

  /** Per-rule failure reason, or NULL when the rule passes. */
  private def ruleReason(r: Rule): Column = {
    val c = col(r.name)
    val castFail = if (r.sqlType.equalsIgnoreCase("string")) lit(false)
      else c.isNotNull && c.try_cast(r.sqlType).isNull
    val nullFail = if (r.notNull) c.isNull else lit(false)
    when(nullFail, lit(s"${r.name}: null value in NOT NULL column"))
      .when(castFail,
        lit(s"${r.name}: invalid input for type ${r.sqlType}"))
  }

  /** Annotate every row with its failure `reasons` (empty array = row
    * is loadable) and a `valid` flag. One shuffle-free projection. */
  def preflight(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    require(!df.columns.contains("reasons") && !df.columns.contains("valid"),
      "input columns collide with internals: reasons/valid")
    df.withColumn("reasons",
        array_compact(array(rules.map(ruleReason): _*)))
      .withColumn("valid", size(col("reasons")) === 0)
  }

  /** The loadable rows, original schema. */
  def valid(df: DataFrame, rules: Seq[Rule]): DataFrame =
    preflight(df, rules).filter(col("valid"))
      .drop("reasons", "valid")

  /** The rejected rows with their reasons — the reject-file payload. */
  def rejects(df: DataFrame, rules: Seq[Rule]): DataFrame =
    preflight(df, rules).filter(!col("valid")).drop("valid")
}
