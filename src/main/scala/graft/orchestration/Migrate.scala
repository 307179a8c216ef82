package graft.orchestration

import java.util.concurrent.{ConcurrentLinkedQueue, Executors, TimeUnit}
import scala.jdk.CollectionConverters._
import graft.casting.CastRule
import graft.catalog._
import graft.dsl.Ast.{AlterTableRule, TableFilter}

/** Per-table load outcome for the summary report
  * (src/utils/state.lisp:11-50; clojure summary.clj:1-167). */
final case class TableStats(schema: String, table: String, rows: Long,
                            rejected: Long, millis: Long)

/** Three-section migration summary: pre (DDL), data (per-table stats),
  * post (indexes/PKs/FKs/sequences), like the reference's report. */
final case class Summary(preDdl: Seq[String], tables: Seq[TableStats],
                         postDdl: Seq[String], totalMillis: Long) {
  def totalRows: Long = tables.map(_.rows).sum
  def totalRejected: Long = tables.map(_.rejected).sum

  /** pgloader-style fixed-width report (summary.clj format). */
  def render: String = {
    val sb = new StringBuilder
    sb.append(f"${"table name"}%-30s ${"rows"}%10s ${"errors"}%8s ${"time"}%8s\n")
    sb.append("-" * 60).append('\n')
    tables.foreach { t =>
      sb.append(f"${t.schema + "." + t.table}%-30s ${t.rows}%10d " +
        f"${t.rejected}%8d ${t.millis / 1000.0}%7.1fs\n")
    }
    sb.append("-" * 60).append('\n')
    sb.append(f"${"Total"}%-30s $totalRows%10d $totalRejected%8d " +
      f"${totalMillis / 1000.0}%7.1fs\n")
    sb.toString
  }
}

/** The migrate-database orchestrator (migrate-database.lisp:326-574;
  * clojure core.clj:411-1104), Spark-adapted: per-table loads are
  * independent Spark jobs submitted from a driver thread pool; index
  * builds for a finished table overlap the remaining copies on a second
  * pool; PK attach / FKs / sequence resets run after everything.
  *
  * @param executeDdl runs one DDL statement on the target (JDBC in
  *   production, a recorder in tests)
  * @param loadTable runs the data copy for one table; returns
  *   (rowsSent, rowsRejected)
  */
/** @param maxParallelIndexes `WITH max parallel create index = n`;
  *   0 = auto-size the pool to the catalog's max-indexes-per-table
  *   (catalog.lisp:513-524; core.clj:655-662). */
final class Migrator(
    executeDdl: String => Unit,
    loadTable: Table => (Long, Long),
    workers: Int = 4,
    maxParallelIndexes: Int = 0) {

  def migrate(cat0: Catalog,
              userCast: Seq[CastRule] = Nil,
              defaults: Seq[CastRule] = Nil,
              including: Seq[TableFilter] = Nil,
              excluding: Seq[TableFilter] = Nil,
              alterSchema: Seq[(String, String)] = Nil,
              alterTable: Seq[AlterTableRule] = Nil,
              truncate: Boolean = false,
              createTables: Boolean = true,
              withIndexes: Boolean = true,
              withFKeys: Boolean = true,
              resetSequences: Boolean = true,
              beforeLoad: Seq[String] = Nil,
              afterLoad: Seq[String] = Nil,
              setParams: Seq[(String, String)] = Nil,
              disableTriggers: Boolean = false): Summary = {
    val t0 = System.nanoTime()

    // session parameters + BEFORE LOAD DO, first of all
    // (core.clj:518-545, 1061-1075)
    setParams.foreach { case (k, v) => executeDdl(s"SET $k = '$v';") }
    // WITH disable triggers → replica role for the load session
    // (core.clj:818-825; session_replication_role)
    if (disableTriggers)
      executeDdl("SET session_replication_role = 'replica';")
    beforeLoad.foreach(executeDdl)

    // ---- 1. process-catalog (migrate-database.lisp:253-302)
    var cat = CatalogRewrite.filter(cat0, including, excluding)
    cat = CatalogRewrite.alterSchema(cat, alterSchema)
    cat = CatalogRewrite.alterTable(cat, alterTable)
    val collisions = Identifiers.collisions(
      cat.allTables.map(t => s"${t.schema}.${t.name}"))
    require(collisions.isEmpty,
      s"identifier collision after 63-byte truncation: $collisions")
    cat = cat.cast(userCast, defaults)

    // ---- 2. prepare target (prepare-pgsql-database :11-150)
    val pre = Seq.newBuilder[String]
    def preDdl(sql: String): Unit = { executeDdl(sql); pre += sql }
    cat.schemas.filter(_.name.nonEmpty).foreach(s =>
      preDdl(s"CREATE SCHEMA IF NOT EXISTS ${s.name};"))
    // dynamic ENUM types for enum/set source columns, and rewrite the
    // column's placeholder pg type to the registered type name
    // (mysql-cast-rules.lisp:260-301; ddl/common.clj:557-574)
    if (createTables) {
      cat = cat.copy(schemas = cat.schemas.map(s => s.copy(
        tables = s.tables.map { t =>
          val patched = t.columns.map { c =>
            val field = t.fields.find(_.name == c.name)
            val isEnumish = field.exists(f =>
              f.typeName == "enum" || f.typeName == "set")
            if (isEnumish && (c.pgType == "enum" || c.pgType == "enum[]")) {
              val tn = s"${t.name}_${c.name}"
              preDdl(Ddl.createEnum(tn, Ddl.enumLabels(field.get.ctype)))
              c.copy(pgType =
                if (c.pgType.endsWith("[]")) tn + "[]" else tn)
            } else c
          }
          t.copy(columns = patched)
        })))
      cat.allTables.foreach(t => preDdl(Ddl.createTable(t)))
    }
    if (truncate) cat.allTables.foreach(t => preDdl(Ddl.truncate(t)))

    // ---- 3. data phase: biggest tables first
    // (optimize-table-copy-ordering :304-320), index builds overlapping
    // remaining copies (:511-559)
    val ordered = cat.allTables.sortBy(-_.rowCountEstimate)
    val copyPool = Executors.newFixedThreadPool(math.max(1, workers))
    val indexPoolSize =
      if (maxParallelIndexes > 0) maxParallelIndexes
      else math.max(1,
        cat.allTables.map(_.indexes.size).maxOption.getOrElse(1))
    val indexPool = Executors.newFixedThreadPool(indexPoolSize)
    val stats = new ConcurrentLinkedQueue[TableStats]
    val indexFutures =
      new ConcurrentLinkedQueue[java.util.concurrent.Future[_]]
    val copyFutures = ordered.map { t =>
      copyPool.submit(new Runnable {
        def run(): Unit = {
          val s0 = System.nanoTime()
          val (rows, rejected) = loadTable(t)
          stats.add(TableStats(t.schema, t.name, rows, rejected,
            (System.nanoTime() - s0) / 1000000))
          // this table is done copying → build its indexes NOW, while
          // other tables may still be loading
          if (withIndexes) t.indexes.foreach { i =>
            indexFutures.add(indexPool.submit(new Runnable {
              def run(): Unit = executeDdl(Ddl.createIndex(i, t.schema))
            }))
          }
        }
      })
    }
    copyFutures.foreach(_.get())
    copyPool.shutdown()
    indexFutures.asScala.foreach(_.get())
    indexPool.shutdown()
    indexPool.awaitTermination(1, TimeUnit.HOURS)

    // ---- 4. post phase (complete-pgsql-database :153-250)
    val post = Seq.newBuilder[String]
    def postDdl(sql: String): Unit = { executeDdl(sql); post += sql }
    if (withIndexes)
      cat.allTables.foreach(t => t.indexes.filter(_.primary)
        .foreach(i => postDdl(Ddl.attachPrimaryKey(i, t.schema))))
    if (withFKeys)
      cat.allTables.foreach(t =>
        t.fkeys.foreach(f => postDdl(Ddl.addFKey(f, t.schema))))
    if (resetSequences)
      cat.allTables.foreach(t =>
        t.columns.filter(c => c.pgType == "serial" || c.pgType == "bigserial")
          .foreach(c => postDdl(Ddl.resetSequence(t, c.name))))
    cat.allTables.foreach { t =>
      t.checks.zipWithIndex.foreach { case (expr, i) =>
        postDdl(Ddl.addCheck(t, s"${t.name}_check_$i", expr)) }
      t.comment.foreach(cm => postDdl(Ddl.commentOnTable(t, cm)))
      t.columns.foreach(c =>
        c.comment.foreach(cm => postDdl(Ddl.commentOnColumn(t, c, cm))))
    }
    if (disableTriggers)
      postDdl("SET session_replication_role = 'origin';")
    // AFTER LOAD DO, last (core.clj:518-545)
    afterLoad.foreach { sql => executeDdl(sql); post += sql }

    // ---- 5. summary
    val byName = ordered.map(t => (t.schema, t.name)).zipWithIndex.toMap
    Summary(pre.result(),
      stats.asScala.toSeq.sortBy(s => byName((s.schema, s.table))),
      post.result(), (System.nanoTime() - t0) / 1000000)
  }
}
