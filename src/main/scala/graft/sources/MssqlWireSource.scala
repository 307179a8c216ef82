package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Driver-free MS SQL Server read over the native TDS client — closes
  * the last driver gap (PG/MySQL speak their wire protocols, SQLite
  * reads the file format). Follows the reference's MSSQL source shape
  * (src/sources/mssql/mssql.lisp): sys-views introspection, streaming
  * SELECTs (range-partitioned where an integer identity/PK exists —
  * beyond the reference's single FreeTDS stream) with per-type
  * server-side rendering
  * ([[ColumnSqlExpressions.mssql]] — datetimes via convert(), bigints
  * via cast) so every value crosses the wire in a text-stable form. */
object MssqlWireSource {
  import TdsWire.quoteIdent

  /** Catalog introspection over the wire:
    * [[IntrospectionSql.mssqlColumns]] through the TDS client, mapped by
    * [[IntrospectionRows.mssqlTables]]. */
  def introspect(params: TdsWire.ConnParams): Seq[graft.catalog.Table] = {
    val conn = new TdsWireConnection(params)
    try {
      val (_, rows) = conn.query(IntrospectionSql.mssqlColumns)
      val tables = IntrospectionRows.mssqlTables(rows.map { r =>
        IntrospectionRows.MssqlColumn(r(0), r(1), r(2), r(3),
          maxLength = r(4).toInt, precision = r(5).toInt,
          scale = r(6).toInt,
          nullable = r(7) == "t" || r(7) == "1",
          identity = r(8) == "t" || r(8) == "1",
          default = Option(r(9)))
      })
      val (_, idxRows) = conn.query(IntrospectionSql.mssqlIndexes)
      val (_, fkRows) = conn.query(IntrospectionSql.mssqlFKeys)
      IntrospectionRows.mssqlAttachConstraints(tables, idxRows, fkRows)
    } finally conn.close()
  }

  /** User-defined sequences (sys.sequences → target CREATE SEQUENCE;
    * mssql-schema.lisp:172-194). dbo maps to public downstream via the
    * normal schema handling. */
  def introspectSequences(params: TdsWire.ConnParams)
      : Seq[graft.catalog.SequenceDef] = {
    val conn = new TdsWireConnection(params)
    try {
      val (_, rows) = conn.query(IntrospectionSql.mssqlSequences)
      rows.map { r =>
        graft.catalog.SequenceDef(
          schema = r(0), name = r(1),
          start = r(2).toLong, increment = r(3).toLong,
          minValue = r(4).toLong, maxValue = r(5).toLong,
          current = Option(r(6)).map(_.toLong),
          cycling = r(7) == "t" || r(7) == "1",
          cache = Option(r(8)).map(_.toLong).getOrElse(0L))
      }
    } finally conn.close()
  }

  /** View introspection for MATERIALIZE VIEWS — the same sys-views
    * column query over sys.views, restricted to `names` (None = ALL
    * VIEWS). */
  def introspectViews(params: TdsWire.ConnParams,
                      names: Option[Seq[String]])
      : Seq[graft.catalog.Table] = {
    val filter = names match {
      case Some(ns) if ns.nonEmpty =>
        s"AND t.name IN (${ns.map(n => "'" + n.replace("'", "''") + "'")
          .mkString(", ")})"
      case _ => ""
    }
    val conn = new TdsWireConnection(params)
    try {
      val (_, rows) = conn.query(IntrospectionSql.mssqlViewColumns(filter))
      IntrospectionRows.mssqlTables(rows.map { r =>
        IntrospectionRows.MssqlColumn(r(0), r(1), r(2), r(3),
          maxLength = r(4).toInt, precision = r(5).toInt,
          scale = r(6).toInt,
          nullable = r(7) == "t" || r(7) == "1",
          identity = r(8) == "t" || r(8) == "1",
          default = Option(r(9)))
      })
    } finally conn.close()
  }

  /** sys.partitions row-count ESTIMATE for the range-split guard and
    * load ordering (heap or clustered index partitions only). */
  def rowCountOf(params: TdsWire.ConnParams, schema: String,
                 table: String): Long = {
    val conn = new TdsWireConnection(params)
    try {
      val (_, rows) = conn.query(
        s"""SELECT cast(sum(p.rows) as bigint) FROM sys.partitions p
            JOIN sys.objects o ON p.object_id = o.object_id
            JOIN sys.schemas s ON o.schema_id = s.schema_id
            WHERE s.name = '${schema.replace("'", "''")}'
              AND o.name = '${table.replace("'", "''")}'
              AND p.index_id IN (0, 1)""")
      rows.headOption.flatMap(r => Option(r(0))).map(_.toLong).getOrElse(0L)
    } finally conn.close()
  }

  /** min/max of the integer partition key. */
  def integerBounds(params: TdsWire.ConnParams, schema: String,
                    table: String, column: String): (Long, Long) = {
    val conn = new TdsWireConnection(params)
    try {
      val (_, rows) = conn.query(
        s"SELECT MIN(${quoteIdent(column)}), MAX(${quoteIdent(column)}) " +
          s"FROM ${quoteIdent(schema)}.${quoteIdent(table)}")
      val r = rows.head
      (Option(r(0)).map(_.toLong).getOrElse(0L),
        Option(r(1)).map(_.toLong).getOrElse(0L))
    } finally conn.close()
  }

  /** Source types the TDS client cannot bring across the wire at all:
    * cursor / table types are not column data. Everything else
    * sys.types can surface is readable — natively decoded (including
    * sql_variant's per-value SSVARIANT layout), rendered server-side
    * ([[ColumnSqlExpressions.mssqlPair]]: xml, CLR UDTs, date/time
    * family), or an alias type whose underlying token is one of those.
    */
  private val unreadableTypeNames = Set("cursor", "table")

  /** Fail-BEFORE-DDL preflight: walk the introspected catalog against
    * the client's supported-type set, so a migration with an unreadable
    * column aborts while the target catalog is still untouched — not
    * after CREATE TABLE has run and the first read throws mid-load.
    * Returns human-readable `schema.table.column (type)` entries. */
  def unreadableColumns(tables: Seq[graft.catalog.Table]): Seq[String] =
    for {
      t <- tables
      f <- t.fields
      if unreadableTypeNames(f.typeName)
    } yield s"${t.schema}.${t.sourceName}.${f.name} (${f.typeName})"

  /** Wire-token → [[ColumnSqlExpressions.mssqlPair]] rendering for the
    * TOP-0 discovery path. At TDS 7.1 only the datetime family (the
    * server's default text rendering is locale-dependent) and bigint
    * (stabilized via numeric(20) on the JDBC twin) need server-side
    * expressions; everything else the client decodes to stable text. */
  private def discoveredPair(ci: TdsWire.ColInfo): (String, String) =
    ci.tpe match {
      case TdsWire.TDateTime | TdsWire.TDateTimeN =>
        ColumnSqlExpressions.mssqlPair(ci.name, "datetime")
      case TdsWire.TDateTim4 =>
        ColumnSqlExpressions.mssqlPair(ci.name, "smalldatetime")
      // the 7.3 family must route server-side too: the native token
      // decoders render e.g. datetime2 as '… 12:34:56.1230000' while
      // introspection-driven reads use convert style 126 — the two
      // paths must stay byte-identical (queryMeta's contract)
      case TdsWire.TDate =>
        ColumnSqlExpressions.mssqlPair(ci.name, "date")
      case TdsWire.TTime =>
        ColumnSqlExpressions.mssqlPair(ci.name, "time")
      case TdsWire.TDateTime2 =>
        ColumnSqlExpressions.mssqlPair(ci.name, "datetime2")
      case TdsWire.TDateTimeOffset =>
        ColumnSqlExpressions.mssqlPair(ci.name, "datetimeoffset")
      case TdsWire.TInt8 =>
        ColumnSqlExpressions.mssqlPair(ci.name, "bigint")
      case TdsWire.TIntN if ci.maxLen == 8 =>
        ColumnSqlExpressions.mssqlPair(ci.name, "bigint")
      case _ => (quoteIdent(ci.name), ci.name)
    }

  /** Driver-local scan for tables [[read]] would load as ONE
    * full-scan partition anyway (no identity partition key, or below
    * the `2 * rowsPerRange` split guard) — the per-table Spark-job
    * floor amortization ([[graft.sinks.LocalCopy]]). `selectCols`
    * must be the SAME per-type server-side rendering pairs the
    * distributed read uses, so datetime/geometry columns arrive in
    * identical text either way. Returns None when the read would
    * actually split. */
  def localScanIfSmall(params: TdsWire.ConnParams, schema: String,
                       table: String, partitionKey: Option[String],
                       rowsPerRange: Long,
                       selectCols: Seq[(String, String)])
      : Option[() => (Seq[String], Iterator[Array[String]], () => Unit)] = {
    // keyless tables are single-partition regardless of size — skip
    // the row-count probe connection entirely
    if (partitionKey.isDefined &&
        rowCountOf(params, schema, table) >= 2 * rowsPerRange) None
    else Some(() => {
      val qtable = s"${quoteIdent(schema)}.${quoteIdent(table)}"
      val resolved: Seq[(String, String)] =
        if (selectCols.nonEmpty) selectCols
        else {
          // separate probe connection, like read(): the data stream
          // below must start on a fresh single-use batch
          val pc = new TdsWireConnection(params)
          try pc.queryMeta(s"SELECT TOP 0 * FROM $qtable")
            .map(discoveredPair)
          finally pc.close()
        }
      val conn = new TdsWireConnection(params)
      val cols = resolved.map { case (e, a) =>
        if (e == quoteIdent(a)) e else s"$e AS ${quoteIdent(a)}"
      }
      val (_, it) = conn.queryStream(
        s"SELECT ${cols.mkString(", ")} FROM $qtable")
      (resolved.map(_._2), it, () => conn.close())
    })
  }

  /** Read `schema.table` over TDS. With an integer `partitionKey`
    * (identity / clustered integer PK from introspection) and enough
    * rows (the `2 * rowsPerRange` guard) the read splits into one
    * WHERE-range per Spark partition — BEYOND the reference, whose
    * FreeTDS path is single-stream (src/sources/mssql/mssql.lisp): at
    * 100× the biggest table this is the difference between one stream
    * and N. Range count capped via [[RangeSplit.predicates]]; otherwise
    * a single full-scan partition. `selectCols` is (server-side
    * expression, output name) pairs — [[ColumnSqlExpressions.mssqlPair]]
    * output for type-stable rendering; when empty, columns and their
    * wire types are discovered via a TOP-0 probe and routed through the
    * same rendering ([[discoveredPair]]). */
  def read(spark: SparkSession, params: TdsWire.ConnParams,
           schema: String, table: String,
           partitionKey: Option[String] = None,
           rowCountEstimate: Long = 0L,
           rowsPerRange: Long = 10000L,
           selectCols: Seq[(String, String)] = Nil): DataFrame = {
    val qtable = s"${quoteIdent(schema)}.${quoteIdent(table)}"
    val resolved: Seq[(String, String)] =
      if (selectCols.nonEmpty) selectCols
      else {
        // TOP 0 probe: COLMETADATA tokens carry each column's wire type,
        // so the discovered read composes the SAME per-type server-side
        // rendering as an introspection-driven read — datetimes arrive
        // ISO-8601, not in the server's locale default
        val conn = new TdsWireConnection(params)
        try conn.queryMeta(s"SELECT TOP 0 * FROM $qtable").map(discoveredPair)
        finally conn.close()
      }
    val cols = resolved.map { case (e, a) =>
      if (e == quoteIdent(a)) e else s"$e AS ${quoteIdent(a)}"
    }
    require(cols.nonEmpty, s"no columns resolved for $schema.$table")
    val names = resolved.map(_._2)
    val preds = partitionKey match {
      case Some(pk) if rowCountEstimate >= 2 * rowsPerRange =>
        val (lo, hi) = integerBounds(params, schema, table, pk)
        RangeSplit.predicates(quoteIdent(pk), lo, hi, rowsPerRange,
          rowCountEstimate)
      case _ => Seq("1 = 1")
    }
    val select = cols.mkString(", ")
    val p = params
    val rdd = spark.sparkContext
      .parallelize(preds, preds.length)
      .mapPartitions { it =>
        it.flatMap { pred =>
          val conn = new TdsWireConnection(p)
          val tc = org.apache.spark.TaskContext.get()
          if (tc != null)
            tc.addTaskCompletionListener[Unit](_ => conn.close())
          val (_, rows) = conn.queryStream(
            s"SELECT $select FROM $qtable WHERE $pred")
          // TDS values arrive UTF-16 and must transcode anyway; the
          // internal-row wrap still skips the Row +
          // ExpressionEncoder pass per row
          new Iterator[org.apache.spark.sql.catalyst.InternalRow] {
            private var closed = false
            override def hasNext: Boolean = {
              val h = rows.hasNext
              if (!h && !closed) { closed = true; conn.close() }
              h
            }
            override def next(): org.apache.spark.sql.catalyst.InternalRow = {
              val vs = rows.next()
              val out = new Array[Any](vs.length)
              var i = 0
              while (i < vs.length) {
                if (vs(i) != null)
                  out(i) = org.apache.spark.unsafe.types.UTF8String
                    .fromString(vs(i))
                i += 1
              }
              new org.apache.spark.sql.catalyst.expressions
                .GenericInternalRow(out)
            }
          }
        }
      }
    val sparkSchema = StructType(names.map(n =>
      StructField(n, StringType, nullable = true)))
    org.apache.spark.sql.graft.FunctionInstaller
      .internalDataFrame(spark, rdd, sparkSchema)
  }
}
