package graft

import org.apache.spark.sql.SparkSession
import graft.dsl.{Ast, Parser, PlanBuilder}
import graft.orchestration.TableStats
import graft.sinks.{CopyEndpoint, CopySink}

/** The engine's top-level entry point: run a `.load` command end-to-end —
  * parse → plan → BEFORE LOAD DO → sink → AFTER LOAD DO — the Spark
  * realization of `pgloader file.load` (v3 api.lisp:29
  * process-command-file; v4 core.clj:411 run-command).
  *
  * Session parameters (`SET guc TO v`, `WITH disable triggers`) are
  * per-connection PostgreSQL state, so both hooks receive the command's
  * session-setup statements and must apply them on every connection they
  * open (the reference applies its GUC list when opening each pgconn).
  *
  * @param executeDdl  target DDL hook, (sql, sessionSetup) (JDBC in
  *   production: `JdbcSource.ddlExecutor(url, props)`; a recorder in
  *   tests)
  * @param endpointFactory COPY endpoint per partition, given
  *   (targetTable, sessionSetup) (PgCopyEndpoint / JdbcInsertEndpoint /
  *   test doubles)
  */
final class Runner(executeDdl: (String, Seq[String]) => Unit,
                   endpointFactory: (String, Seq[String]) => Int => CopyEndpoint) {

  /** Run every command in the file text; returns per-table stats. */
  def runFile(spark: SparkSession, text: String,
              baseDir: String = "."): Seq[TableStats] = {
    val (first, inline) = Parser.parseWithInline(text)
    // archives expand to ordered sub-commands; other types run directly
    val cmds =
      if (first.loadType == "archive") Seq(first)
      else Parser.parseAll(text.substring(0, findInlineCut(text, inline)))
    cmds.flatMap(cmd => runCommand(spark, cmd, baseDir, inline))
  }

  private def findInlineCut(text: String, inline: Option[String]): Int =
    inline.map(d => text.length - d.length).getOrElse(text.length)

  def runCommand(spark: SparkSession, cmd: Ast.LoadCommand,
                 baseDir: String = ".",
                 inline: Option[String] = None): Seq[TableStats] = {
    // per-connection session setup. GUCs (SET params) apply to every
    // connection; the trigger-disabling replica role is scoped to the
    // data-copy endpoint connections ONLY (the reference sets replica
    // around copy-table and resets to origin, core.clj:821,909) — user
    // BEFORE/AFTER LOAD DO must run with triggers and FKs enforced.
    val gucSql: Seq[String] =
      cmd.setParams.map { case (k, v) => s"SET $k = '$v';" }
    val copySessionSql: Seq[String] =
      gucSql ++
        (if (cmd.boolOption("disable triggers"))
           Seq("SET session_replication_role = 'replica';")
         else Nil)
    cmd.beforeLoad.foreach(executeDdl(_, gucSql))
    val results = cmd.loadType match {
      case "archive" =>
        PlanBuilder.buildArchive(spark, cmd, baseDir).map {
          case (table, df) => load(table.getOrElse("data"), df, copySessionSql)
        }
      case "database" =>
        throw new UnsupportedOperationException(
          "database migrations run through graft.orchestration.Migrator")
      case _ =>
        val df = PlanBuilder.build(spark, cmd, baseDir, inline)
        Seq(load(cmd.targetTable.getOrElse("data"), df, copySessionSql))
    }
    cmd.afterLoad.foreach(executeDdl(_, gucSql))
    results
  }

  private def load(table: String, df: org.apache.spark.sql.DataFrame,
                   sessionSql: Seq[String]): TableStats = {
    val t0 = System.nanoTime()
    val sink = new CopySink(
      endpointFactory = endpointFactory(table, sessionSql))
    val (sent, rejected) = sink.write(df)
    TableStats("public", table, sent, rejected,
      (System.nanoTime() - t0) / 1000000)
  }
}
