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
    * string, …); `maxLength` enforces char(n)/varchar(n) overflow (PG
    * tolerates trailing-space excess on char(n), so it is checked on
    * the right-trimmed value); `wellEncoded` rejects values carrying
    * U+FFFD, the replacement char a lossy charset decode leaves behind
    * (the engine-side analogue of the reference's encoding errors). */
  final case class Rule(name: String, sqlType: String,
                        notNull: Boolean = false,
                        maxLength: Option[Int] = None,
                        wellEncoded: Boolean = false)

  /** Per-rule failure reason, or NULL when the rule passes. */
  private def ruleReason(r: Rule): Column = {
    val c = col(r.name)
    val castFail = if (r.sqlType.equalsIgnoreCase("string")) lit(false)
      else c.isNotNull && c.try_cast(r.sqlType).isNull
    val nullFail = if (r.notNull) c.isNull else lit(false)
    val lenFail = r.maxLength match {
      case Some(n) => c.isNotNull && length(rtrim(c)) > n
      case None => lit(false)
    }
    val encFail =
      if (r.wellEncoded) c.isNotNull && c.contains("�")
      else lit(false)
    when(nullFail, lit(s"${r.name}: null value in NOT NULL column"))
      .when(castFail,
        lit(s"${r.name}: invalid input for type ${r.sqlType}"))
      .when(lenFail, lit(s"${r.name}: value too long for type " +
        s"${r.sqlType}(${r.maxLength.getOrElse(0)})"))
      .when(encFail, lit(s"${r.name}: invalid byte sequence for " +
        "the declared encoding"))
  }

  /** Annotate every row with its failure `reasons` (empty array = row
    * is loadable) and a `valid` flag. One shuffle-free projection.
    *
    * `custom` adds caller-defined checks beyond the declarative rules —
    * each Column must evaluate to a reason string when the row fails
    * that check and NULL when it passes (the [[ruleReason]] contract);
    * use for target-specific semantics like non-ISO date formats. */
  def preflight(df: DataFrame, rules: Seq[Rule],
                custom: Seq[Column] = Nil): DataFrame = {
    require(rules.nonEmpty || custom.nonEmpty, "need at least one rule")
    require(!df.columns.contains("reasons") && !df.columns.contains("valid"),
      "input columns collide with internals: reasons/valid")
    df.withColumn("reasons",
        array_compact(array(rules.map(ruleReason) ++ custom: _*)))
      .withColumn("valid", size(col("reasons")) === 0)
  }

  /** The loadable rows, original schema. */
  def valid(df: DataFrame, rules: Seq[Rule],
            custom: Seq[Column] = Nil): DataFrame =
    preflight(df, rules, custom).filter(col("valid"))
      .drop("reasons", "valid")

  /** The rejected rows with their reasons — the reject-file payload. */
  def rejects(df: DataFrame, rules: Seq[Rule],
              custom: Seq[Column] = Nil): DataFrame =
    preflight(df, rules, custom).filter(!col("valid")).drop("valid")

  /** Preflight rules derived from a catalog table's TARGET columns —
    * the glue that makes preflight a one-liner inside a Migrator
    * `loadTable` implementation: type checks from the cast engine's
    * Spark types, NOT NULL from the catalog, char/varchar length caps
    * from the PG typemod. */
  def rulesFor(table: graft.catalog.Table): Seq[Rule] = {
    // anchored to the start of the type string; covers the multi-word PG
    // spellings the cast engine preserves ("character varying(n)",
    // "character(n)") alongside varchar(n)/char(n)
    val lenRe = "^(?:character(?: varying)?|varchar|char)\\((\\d+)\\)".r
    table.columns.map { c =>
      Rule(c.name, c.sparkType.simpleString,
        notNull = !c.nullable,
        maxLength = lenRe.findFirstMatchIn(c.pgType.toLowerCase)
          .map(_.group(1).toInt))
    }
  }

  /** Foreign-key preflight: split `df` into rows whose `keys` exist in
    * `parent(parentKeys)` and rows that would violate the FK — found
    * with an engine-side semi/anti join instead of a PG error + batch
    * bisect (the reference's fk-reject path, its issue #1333: FK COPY
    * errors carry no line number, forcing a full bisect per bad batch).
    *
    * SQL MATCH SIMPLE semantics: a row with ANY NULL key column
    * satisfies the constraint. The parent side reduces to its distinct
    * keys first (dimension-sized, AQE broadcasts it); the child side
    * never shuffles more than the key columns.
    *
    * @return (valid, rejected) with the original child schema
    */
  def fkSplit(df: DataFrame, keys: Seq[String], parent: DataFrame,
              parentKeys: Seq[String]): (DataFrame, DataFrame) = {
    require(keys.nonEmpty && keys.length == parentKeys.length,
      "child and parent key lists must align")
    val pk = parent.select(parentKeys.map(col): _*).distinct()
      .toDF(keys: _*)
    val anyNull = keys.map(col(_).isNull).reduce(_ || _)
    val nonNull = df.filter(!anyNull)
    // using-column joins hoist the keys to the front: re-select the
    // original column order on both outputs
    val cols = df.columns.toSeq.map(col)
    val valid = df.filter(anyNull)
      .unionByName(nonNull.join(pk, keys, "left_semi").select(cols: _*))
    val rejected = nonNull.join(pk, keys, "left_anti").select(cols: _*)
    (valid, rejected)
  }
}
