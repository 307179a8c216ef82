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

  /** Read `schema.table` over TDS. With an integer `partitionKey`
    * (identity / clustered integer PK from introspection) and enough
    * rows (the `2 * rowsPerRange` guard) the read splits into one
    * WHERE-range per Spark partition — BEYOND the reference, whose
    * FreeTDS path is single-stream (src/sources/mssql/mssql.lisp): at
    * 100× the biggest table this is the difference between one stream
    * and N. Range count capped via [[RangeSplit.predicates]]; otherwise
    * a single full-scan partition. `selectCols` is (server-side
    * expression, output name) pairs — [[ColumnSqlExpressions.mssqlPair]]
    * output for type-stable rendering; defaults to bracket-quoted
    * discovered columns. */
  def read(spark: SparkSession, params: TdsWire.ConnParams,
           schema: String, table: String,
           partitionKey: Option[String] = None,
           rowCountEstimate: Long = 0L,
           rowsPerRange: Long = 10000L,
           selectCols: Seq[(String, String)] = Nil): DataFrame = {
    val qtable = s"${quoteIdent(schema)}.${quoteIdent(table)}"
    val discovered =
      if (selectCols.nonEmpty) Nil
      else {
        val conn = new TdsWireConnection(params)
        try conn.query(s"SELECT TOP 0 * FROM $qtable")._1
        finally conn.close()
      }
    val cols =
      if (selectCols.nonEmpty) selectCols.map { case (e, a) =>
        if (e == quoteIdent(a)) e else s"$e AS ${quoteIdent(a)}"
      } else discovered.map(quoteIdent)
    require(cols.nonEmpty, s"no columns resolved for $schema.$table")
    val names =
      if (selectCols.nonEmpty) selectCols.map(_._2) else discovered
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
          new Iterator[Row] {
            private var closed = false
            override def hasNext: Boolean = {
              val h = rows.hasNext
              if (!h && !closed) { closed = true; conn.close() }
              h
            }
            override def next(): Row = Row.fromSeq(rows.next().toSeq)
          }
        }
      }
    val sparkSchema = StructType(names.map(n =>
      StructField(n, StringType, nullable = true)))
    spark.createDataFrame(rdd, sparkSchema)
  }
}
