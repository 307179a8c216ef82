package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.sinks.{PgWire, PgWireConnection}

/** Driver-free distributed PostgreSQL read over the native wire-protocol
  * client — the source-side twin of [[graft.sinks.PgWireCopyEndpoint]]:
  * no pgjdbc jar anywhere, matching the reference's own bundled protocol
  * client for its PG source (pgsql/pgsql.lisp map-rows).
  *
  * Partitioning mirrors the JDBC path's ctid strategy
  * ([[IntrospectionSql.pgsqlCtidPredicates]]): one block-range predicate
  * per Spark partition, one wire connection per partition task, opened
  * executor-side and consumed as a STREAM — DataRow frames decode one at
  * a time as Spark pulls the iterator, so a partition never holds its
  * page range in heap. Values arrive as TEXT (fidelity mode — the cast
  * engine applies types downstream, never the reader), so the output is
  * an all-string DataFrame like every other engine source.
  *
  * Identifiers from the catalog are quoted (`quote_ident` semantics) at
  * every SQL build site — mixed-case, reserved-word and
  * quote-bearing table names resolve to the right object.
  */
object PgWireSource {

  /** Catalog introspection over the wire: runs the shared
    * [[IntrospectionSql.pgsqlColumns]] pg_catalog query through
    * [[PgWireConnection.query]] and maps the TEXT rows with
    * [[IntrospectionRows.pgsqlTables]] — the full driver-free pg→pg
    * migration chain: introspect + read here, DDL + COPY through
    * [[graft.sinks.PgWireCopyEndpoint]]/`simpleCommand`. */
  def introspect(params: PgWire.ConnParams)
      : Seq[graft.catalog.Table] = {
    val conn = new PgWireConnection(params)
    try {
      val (_, rows) = conn.query(IntrospectionSql.pgsqlColumns)
      val tables = IntrospectionRows.pgsqlTables(rows.map { r =>
        IntrospectionRows.PgColumn(r(0), r(1), r(2), r(3),
          Option(r(4)),
          // boolean TEXT wire form is t/f
          nullable = r(5) == "t" || r(5) == "true",
          // tolerant of 6-column responses (test doubles serving the
          // pre-enum-labels shape)
          enumLabels = if (r.length > 6) Option(r(6)) else None,
          identity = r.length > 7 && (r(7) == "a" || r(7) == "d"))
      })
      val (_, idxRows) = conn.query(IntrospectionSql.pgsqlIndexes)
      val (_, fkRows) = conn.query(IntrospectionSql.pgsqlFKeys)
      val (_, tcRows) = conn.query(IntrospectionSql.pgsqlTableComments)
      val (_, ccRows) = conn.query(IntrospectionSql.pgsqlColumnComments)
      val (_, checkRows) = conn.query(IntrospectionSql.pgsqlChecks)
      IntrospectionRows.pgsqlAttachComments(
        IntrospectionRows.pgsqlAttachConstraints(tables, idxRows, fkRows),
        tcRows, ccRows, checkRows)
    } finally conn.close()
  }

  /** User-defined types referenced (directly or nested) by source
    * columns, with target-ready DDL bodies — the Migrator recreates
    * the needed subset before CREATE TABLE. */
  def introspectCustomTypes(params: PgWire.ConnParams)
      : Seq[graft.catalog.CustomType] = {
    val conn = new PgWireConnection(params)
    try IntrospectionRows.pgsqlCustomTypes(
      conn.query(IntrospectionSql.pgsqlCustomTypes)._2)
    finally conn.close()
  }

  /** The session's effective schema search path —
    * `current_schemas(false)`: $user resolved and non-existent
    * entries dropped server-side. This is the resolution order for
    * UNQUALIFIED type names in the custom-type closure
    * ([[graft.catalog.CustomTypes.resolver]]); a customized source
    * search_path or a percent-encoded login would mis-resolve under
    * any client-side guess. */
  def searchPathOf(params: PgWire.ConnParams): Seq[String] = {
    val conn = new PgWireConnection(params)
    try conn.query(
      "SELECT unnest(current_schemas(false))")._2.map(_(0)).toSeq
    finally conn.close()
  }

  /** View introspection for MATERIALIZE VIEWS — the same column query
    * over relkind v/m, restricted to `names` (None = ALL VIEWS). */
  def introspectViews(params: PgWire.ConnParams,
                      names: Option[Seq[String]])
      : Seq[graft.catalog.Table] = {
    val filter = names match {
      case Some(ns) if ns.nonEmpty =>
        s"AND c.relname IN (${ns.map(PgWire.quoteLiteral).mkString(", ")})"
      case _ => ""
    }
    val conn = new PgWireConnection(params)
    try {
      val (_, rows) = conn.query(IntrospectionSql.pgsqlViewColumns(filter))
      IntrospectionRows.pgsqlTables(rows.map { r =>
        IntrospectionRows.PgColumn(r(0), r(1), r(2), r(3),
          Option(r(4)),
          nullable = r(5) == "t" || r(5) == "true",
          enumLabels = if (r.length > 6) Option(r(6)) else None)
      })
    } finally conn.close()
  }

  /** `pg_class.relpages` for `table` (schema-qualified names accepted) —
    * the partition-count input [[readByCtid]] needs, same source the
    * reference uses for its ctid splits (pgsql.clj:206-208). relpages
    * lags VACUUM/ANALYZE; the last open-ended range covers growth. */
  def relpagesOf(params: PgWire.ConnParams, table: String): Long = {
    val conn = new PgWireConnection(params)
    try {
      // regclass parses its input as a (possibly qualified, possibly
      // quoted) identifier — quote both layers: ident inside, literal out
      val regclass = PgWire.quoteLiteral(PgWire.quoteQualified(table))
      val (_, rows) = conn.query(
        s"SELECT relpages FROM pg_class WHERE oid = $regclass::regclass")
      rows.headOption.map(_(0).toLong).getOrElse(0L)
    } finally conn.close()
  }

  /** Driver-local scan for tables below the single-ctid-chunk
    * threshold — the per-table Spark-job floor amortization
    * ([[graft.sinks.LocalCopy]]). A table whose relpages fit in ONE
    * [[IntrospectionSql.pgsqlCtidPredicates]] chunk would run as a
    * single Spark task anyway, so reading its wire stream on the
    * calling thread loses no parallelism and skips the job-submit
    * floor (and, in a mixed migration, the scheduler queueing behind
    * a big table's partitions — measured at whole seconds for 9-row
    * tables). Returns None for bigger tables; Some(open) hands back
    * (column names, streaming row iterator, close) — the stream holds
    * one row at a time, so even a stale-relpages surprise stays
    * bounded-memory (the distributed path would also read it on one
    * connection). */
  def localScanIfSmall(params: PgWire.ConnParams, table: String,
                       pagesPerChunk: Long = 1000L)
      : Option[() => (Seq[String], Iterator[Array[String]], () => Unit)] = {
    val pages = relpagesOf(params, table)
    if (pages >= pagesPerChunk) None
    else Some(() => {
      val conn = new PgWireConnection(params)
      val (cols, rows) = conn.queryStream(
        s"SELECT * FROM ${PgWire.quoteQualified(table)}")
      (cols, rows, () => conn.close())
    })
  }

  /** Column names of `table`, discovered driver-side from a LIMIT 0
    * RowDescription — no catalog query needed. */
  def columnsOf(params: PgWire.ConnParams, table: String): Seq[String] = {
    val conn = new PgWireConnection(params)
    try conn.query(
      s"SELECT * FROM ${PgWire.quoteQualified(table)} LIMIT 0")._1
    finally conn.close()
  }

  /** Read `table` split into ctid page ranges, `pagesPerChunk` blocks
    * per partition (relpages from pg_class, as the JDBC path does).
    * `selectCols` is (server-side expression, output name) pairs —
    * [[ColumnSqlExpressions.pgsqlPair]] output for per-type source
    * rewrites (expressions used verbatim; quote identifiers yourself
    * inside them); defaults to the discovered column list (quoted). */
  def readByCtid(spark: SparkSession, params: PgWire.ConnParams,
                 table: String, relpages: Long,
                 pagesPerChunk: Long = 1000L,
                 selectCols: Seq[(String, String)] = Nil): DataFrame =
    readWithPredicates(spark, params, table,
      IntrospectionSql.pgsqlCtidPredicates(relpages, pagesPerChunk),
      selectCols)

  /** Single-stream read WITHOUT ctid predicates — views (MATERIALIZE
    * VIEWS) have no ctid to split on, so the load is one streaming wire
    * connection. */
  def readView(spark: SparkSession, params: PgWire.ConnParams,
               table: String,
               selectCols: Seq[(String, String)] = Nil): DataFrame =
    readWithPredicates(spark, params, table, Seq("true"), selectCols)

  private def readWithPredicates(spark: SparkSession,
                                 params: PgWire.ConnParams,
                                 table: String, preds: Seq[String],
                                 selectCols: Seq[(String, String)])
      : DataFrame = {
    val discovered =
      if (selectCols.nonEmpty) Nil else columnsOf(params, table)
    val cols =
      if (selectCols.nonEmpty) selectCols.map { case (e, a) =>
        if (e == PgWire.quoteIdent(a)) e else s"$e AS ${PgWire.quoteIdent(a)}"
      } else discovered.map(PgWire.quoteIdent)
    require(cols.nonEmpty, s"no columns resolved for $table")
    val names =
      if (selectCols.nonEmpty) selectCols.map(_._2) else discovered
    val select = cols.mkString(", ")
    val qtable = PgWire.quoteQualified(table)
    val p = params // capture the case class, not this object
    // rows decode straight to catalyst form (UTF8String slices of the
    // wire payload, wrapped in GenericInternalRow) and enter the plan
    // via the internal-row scan — no per-field java-String round-trip
    // and no ExpressionEncoder pass. RDDScanExec's UnsafeProjection
    // copies each row out before anything downstream retains it.
    val rdd = spark.sparkContext
      .parallelize(preds, preds.length)
      .mapPartitions { it =>
        it.flatMap { pred =>
          val conn = new PgWireConnection(p)
          // backstop for early task termination (limit, failure): the
          // task-completion listener closes the socket regardless of
          // how much of the stream Spark consumed
          val tc = org.apache.spark.TaskContext.get()
          if (tc != null)
            tc.addTaskCompletionListener[Unit](_ => conn.close())
          val (_, rows) = conn.queryStreamData(
            s"SELECT $select FROM $qtable WHERE $pred")
          new Iterator[org.apache.spark.sql.catalyst.InternalRow] {
            private var closed = false
            override def hasNext: Boolean = {
              val h = rows.hasNext
              if (!h && !closed) { closed = true; conn.close() }
              h
            }
            override def next(): org.apache.spark.sql.catalyst.InternalRow =
              new org.apache.spark.sql.catalyst.expressions
                .GenericInternalRow(rows.next())
          }
        }
      }
    val schema = StructType(names.map(n =>
      StructField(n, StringType, nullable = true)))
    org.apache.spark.sql.graft.FunctionInstaller
      .internalDataFrame(spark, rdd, schema)
  }
}
