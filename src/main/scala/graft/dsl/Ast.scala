package graft.dsl

import graft.casting.CastRule

/** AST for the `.load` command DSL — the engine's top-level entry point,
  * mirroring the reference's LoadCommand record
  * (clojure/src/pgloader/load_file/ast.clj:11-27; esrap grammar
  * src/parsers/command-parser.lisp:14, instaparse grammar
  * clojure/src/pgloader/load_file/grammar.clj:3-326).
  */
object Ast {

  sealed trait Source
  final case class FilePath(path: String) extends Source
  case object Stdin extends Source
  case object InlineData extends Source
  /** `ALL FILENAMES MATCHING ~/regex/ IN DIRECTORY 'dir'` */
  final case class Glob(pattern: String, directory: String) extends Source
  final case class Http(url: String) extends Source
  /** database source / target connection string */
  final case class Uri(uri: String) extends Source

  sealed trait NullIfSpec
  case object NullIfBlanks extends NullIfSpec
  final case class NullIfLiteral(value: String) extends NullIfSpec

  /** One HAVING FIELDS entry (CSV/COPY) or fixed-field spec (FIXED:
    * `name from <start> for <length>`). */
  final case class FieldDef(
      name: String,
      dateFormat: Option[String] = None,
      nullIfs: Seq[NullIfSpec] = Nil,
      trimRight: Boolean = false,
      start: Option[Int] = None,
      length: Option[Int] = None)

  /** USING expression of a target column: either the reference's Lisp
    * s-expression form (translated to Column expressions by the planner)
    * or a double-quoted Spark SQL expression (native extension). */
  sealed trait UsingExpr
  final case class Sexp(raw: String) extends UsingExpr
  final case class SqlExpr(sql: String) extends UsingExpr
  /** `using "literal"` — a constant column value (the reference's
    * dq-string using form, test/udc.load). */
  final case class ConstantStr(value: String) extends UsingExpr

  final case class TargetColDef(
      name: String,
      typeName: Option[String] = None,
      using: Option[UsingExpr] = None)

  /** ALTER TABLE NAMES MATCHING … action (alter-table.lisp). */
  sealed trait AlterAction
  final case class RenameTo(name: String) extends AlterAction
  final case class SetSchema(schema: String) extends AlterAction
  final case class SetTablespace(ts: String) extends AlterAction
  final case class SetParams(params: String) extends AlterAction

  /** `~/regex/` or literal table name pattern. */
  final case class NamePattern(pattern: String, isRegex: Boolean) {
    def matches(name: String): Boolean =
      if (isRegex) pattern.r.findFirstIn(name).nonEmpty
      else pattern.equalsIgnoreCase(name)
  }

  final case class AlterTableRule(patterns: Seq[NamePattern],
                                  action: AlterAction)

  final case class TableFilter(patterns: Seq[NamePattern],
                               inSchema: Option[String])

  sealed trait DistributeRule
  final case class DistributeReference(table: String) extends DistributeRule
  final case class DistributeUsing(table: String, column: String,
                                   from: Seq[String]) extends DistributeRule

  final case class MatView(name: String, definition: Option[String])

  /** The parsed command. `options` holds the WITH-clause entries keyed by
    * their canonical multi-word names (e.g. "skip header" → "1",
    * "truncate" → "true", "fields terminated by" → "\t"). */
  final case class LoadCommand(
      loadType: String, // csv | fixed | copy | dbf | database | archive
      source: Option[Source] = None,
      encoding: Option[String] = None,
      fields: Seq[FieldDef] = Nil,
      targetUri: Option[String] = None,
      targetSchema: Option[String] = None,
      targetTable: Option[String] = None,
      targetColumns: Seq[TargetColDef] = Nil,
      options: Map[String, String] = Map.empty,
      setParams: Seq[(String, String)] = Nil,
      /** `SET MySQL PARAMETERS …` — SOURCE-session variables, applied
        * on the mysql connections only (mysql.clj:499-511), never as
        * PG GUCs. */
      mysqlParams: Seq[(String, String)] = Nil,
      /** SET MSSQL PARAMETERS — mssql SOURCE-session settings
        * (command-mssql.lisp:74 mssql-gucs), applied per source
        * connection, never to PG. */
      mssqlParams: Seq[(String, String)] = Nil,
      castRules: Seq[CastRule] = Nil,
      beforeLoad: Seq[String] = Nil,
      /** AFTER CREATE SCHEMA DO — between target DDL and the data phase
        * (grammar.clj:239-248). */
      afterSchema: Seq[String] = Nil,
      afterLoad: Seq[String] = Nil,
      /** FINALLY DO/EXECUTE — very last, after AFTER LOAD DO
        * (command-sql-block.lisp:52-55). */
      finallyDo: Seq[String] = Nil,
      includingOnly: Seq[TableFilter] = Nil,
      excludingOnly: Seq[TableFilter] = Nil,
      alterTable: Seq[AlterTableRule] = Nil,
      alterSchema: Seq[(String, String)] = Nil,
      materializeViews: Seq[MatView] = Nil,
      materializeAllViews: Boolean = false,
      distribute: Seq[DistributeRule] = Nil,
      decodingAs: Seq[(NamePattern, String)] = Nil,
      /** archive sub-commands, in order */
      subCommands: Seq[LoadCommand] = Nil) {

    def option(key: String): Option[String] = options.get(key)
    def intOption(key: String): Option[Int] = options.get(key).map(_.toInt)
    def boolOption(key: String): Boolean = options.contains(key)
  }
}
