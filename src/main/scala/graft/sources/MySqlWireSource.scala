package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Driver-free distributed MySQL read over the native wire-protocol
  * client — the MySQL twin of [[PgWireSource]], closing the reference's
  * #1 use case (mysql→pg migration, src/sources/mysql/mysql.lisp) with
  * zero Connector/J jars.
  *
  * Partitioning follows the reference's integer-key range split
  * (mysql.lisp:10-62: `rowsPerRange` rows per WHERE range, only when the
  * table is big enough — the JDBC path's logic, re-expressed for the
  * wire). One wire connection per partition task, opened executor-side,
  * rows consumed as a STREAM (one packet decoded per iterator pull).
  * Values arrive as TEXT (fidelity mode; the cast engine types them
  * downstream). Identifiers are back-quoted at every SQL build site.
  */
object MySqlWireSource {
  import MySqlWire.{quoteIdent, quoteLiteral}

  /** Catalog introspection over the wire: the
    * [[IntrospectionSql.mysqlColumns]] information_schema query with the
    * schema inlined (the text protocol has no placeholders), mapped by
    * [[IntrospectionRows.mysqlTables]]; secondary indexes and foreign
    * keys from information_schema statistics/key_column_usage so the
    * target gets them rebuilt (mysql-schema.lisp list-all-indexes /
    * list-all-fkeys). */
  def introspect(params: MySqlWire.ConnParams,
                 schema: String): Seq[graft.catalog.Table] = {
    val conn = new MySqlWireConnection(params)
    try {
      val sql =
        s"""SELECT c.table_name, c.column_name, c.column_type,
            c.column_default, c.is_nullable, c.extra
            FROM information_schema.columns c
            JOIN information_schema.tables t
              USING (table_schema, table_name)
            WHERE c.table_schema = ${quoteLiteral(schema)}
              AND t.table_type = 'BASE TABLE'
            ORDER BY c.table_name, c.ordinal_position"""
      val (_, rows) = conn.query(sql)
      val tables = IntrospectionRows.mysqlTables(schema, rows.map { r =>
        IntrospectionRows.MySqlColumn(r(0), r(1), r(2), Option(r(3)),
          nullable = r(4) == "YES", extra = Option(r(5)).getOrElse(""))
      })
      // the server-default group_concat_max_len (1024) silently
      // TRUNCATES the index column list on wide composite indexes,
      // corrupting the trailing column name; raise it for this session
      // before the GROUP_CONCAT query
      try conn.simpleCommand("SET SESSION group_concat_max_len = 1048576")
      catch { case _: MySqlWire.MySqlServerError => () }
      val (_, idxRows) = conn.query(
        IntrospectionSql.mysqlIndexesInline(quoteLiteral(schema)))
      val (_, fkRows) = conn.query(
        IntrospectionSql.mysqlFKeysInline(quoteLiteral(schema)))
      val (_, tcRows) = conn.query(
        IntrospectionSql.mysqlTableCommentsInline(quoteLiteral(schema)))
      val (_, ccRows) = conn.query(
        IntrospectionSql.mysqlColumnCommentsInline(quoteLiteral(schema)))
      val checkRows =
        // information_schema.CHECK_CONSTRAINTS appeared in MySQL 8.0.16;
        // older servers raise ER_UNKNOWN_TABLE (1109) / ER_NO_SUCH_TABLE
        // (1146) for the query itself — migrate without checks, exactly
        // what those servers have
        try conn.query(
          IntrospectionSql.mysqlChecksInline(quoteLiteral(schema)))._2
        catch {
          case e: MySqlWire.MySqlServerError
              if e.code == 1109 || e.code == 1146 => Nil
        }
      IntrospectionRows.mysqlAttachComments(
        IntrospectionRows.mysqlAttachConstraints(tables, idxRows, fkRows),
        tcRows, ccRows, checkRows)
    } finally conn.close()
  }

  /** View introspection for MATERIALIZE VIEWS — the same
    * information_schema query over table_type VIEW, restricted to
    * `names` (None = ALL VIEWS). */
  def introspectViews(params: MySqlWire.ConnParams, schema: String,
                      names: Option[Seq[String]])
      : Seq[graft.catalog.Table] = {
    val conn = new MySqlWireConnection(params)
    try {
      val nameFilter = names match {
        case Some(ns) if ns.nonEmpty =>
          s" AND c.table_name IN (${ns.map(quoteLiteral).mkString(", ")})"
        case _ => ""
      }
      val sql =
        s"""SELECT c.table_name, c.column_name, c.column_type,
            c.column_default, c.is_nullable, c.extra
            FROM information_schema.columns c
            JOIN information_schema.tables t
              USING (table_schema, table_name)
            WHERE c.table_schema = ${quoteLiteral(schema)}
              AND t.table_type IN ('VIEW', 'SYSTEM VIEW')$nameFilter
            ORDER BY c.table_name, c.ordinal_position"""
      val (_, rows) = conn.query(sql)
      IntrospectionRows.mysqlTables(schema, rows.map { r =>
        IntrospectionRows.MySqlColumn(r(0), r(1), r(2), Option(r(3)),
          nullable = r(4) == "YES", extra = Option(r(5)).getOrElse(""))
      })
    } finally conn.close()
  }

  /** information_schema.tables row-count ESTIMATE (the reference's
    * sizing input for range splits and load ordering). */
  def rowCountOf(params: MySqlWire.ConnParams, schema: String,
                 table: String): Long = {
    val conn = new MySqlWireConnection(params)
    try {
      val (_, rows) = conn.query(
        s"""SELECT table_rows FROM information_schema.tables
            WHERE table_schema = ${quoteLiteral(schema)}
              AND table_name = ${quoteLiteral(table)}""")
      rows.headOption.flatMap(r => Option(r(0))).map(_.toLong).getOrElse(0L)
    } finally conn.close()
  }

  /** min/max of the integer partition key (mysql.lisp:35-43). */
  def integerBounds(params: MySqlWire.ConnParams, schema: String,
                    table: String, column: String): (Long, Long) = {
    val conn = new MySqlWireConnection(params)
    try {
      val (_, rows) = conn.query(
        s"SELECT MIN(${quoteIdent(column)}), MAX(${quoteIdent(column)}) " +
          s"FROM ${quoteIdent(schema)}.${quoteIdent(table)}")
      val r = rows.head
      (Option(r(0)).map(_.toLong).getOrElse(0L),
        Option(r(1)).map(_.toLong).getOrElse(0L))
    } finally conn.close()
  }

  /** WHERE ranges for the split — [[RangeSplit.predicates]] with
    * back-quoted MySQL identifiers (count capped by the row estimate so
    * sparse snowflake-style keys cannot explode the driver-side
    * predicate list). */
  private[graft] def rangePredicates(col: String, lo: Long, hi: Long,
                                     rowsPerRange: Long,
                                     rowCountEstimate: Long): Seq[String] =
    RangeSplit.predicates(quoteIdent(col), lo, hi, rowsPerRange,
      rowCountEstimate)

  /** Driver-local scan for tables [[read]] would load as ONE
    * full-scan partition anyway (no integer partition key, or below
    * the reference's `2 * rowsPerRange` split guard) — the per-table
    * Spark-job floor amortization ([[graft.sinks.LocalCopy]], same
    * contract as [[PgWireSource.localScanIfSmall]]). The stream
    * decodes with the SAME per-table charset override the distributed
    * read applies. Returns None when the read would actually split. */
  def localScanIfSmall(params: MySqlWire.ConnParams, schema: String,
                       table: String, partitionKey: Option[String],
                       rowsPerRange: Long,
                       charsetName: String = "UTF-8")
      : Option[() => (Seq[String], Iterator[Array[String]], () => Unit)] = {
    // keyless tables are single-partition REGARDLESS of size — skip
    // the row-count probe connection entirely
    if (partitionKey.isDefined &&
        rowCountOf(params, schema, table) >= 2 * rowsPerRange) None
    else Some(() => {
      val conn = new MySqlWireConnection(params)
      val (cols, it) = conn.queryStream(
        s"SELECT * FROM ${quoteIdent(schema)}.${quoteIdent(table)}",
        java.nio.charset.Charset.forName(charsetName))
      (cols, it, () => conn.close())
    })
  }

  /** Read `schema.table` over the wire. With an integer `partitionKey`
    * and enough rows (the reference's `2 * rowsPerRange` guard) the read
    * splits into one range predicate per Spark partition; otherwise it
    * is a single full-scan partition. `selectCols` is (server-side
    * expression, output name) pairs — [[ColumnSqlExpressions.mysqlPair]]
    * output for per-type rendering (st_astext for geometry); defaults to
    * the discovered columns back-quoted. */
  def read(spark: SparkSession, params: MySqlWire.ConnParams,
           schema: String, table: String,
           partitionKey: Option[String] = None,
           rowCountEstimate: Long = 0L,
           rowsPerRange: Long = 10000L,
           selectCols: Seq[(String, String)] = Nil,
           charsetName: String = "UTF-8"): DataFrame = {
    val qtable = s"${quoteIdent(schema)}.${quoteIdent(table)}"
    val discovered =
      if (selectCols.nonEmpty) Nil
      else {
        val conn = new MySqlWireConnection(params)
        try conn.query(s"SELECT * FROM $qtable LIMIT 0")._1
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
        rangePredicates(pk, lo, hi, rowsPerRange, rowCountEstimate)
      case _ => Seq("1 = 1")
    }
    val select = cols.mkString(", ")
    val p = params // capture the case class, not this object
    val rdd = spark.sparkContext
      .parallelize(preds, preds.length)
      .mapPartitions { it =>
        it.flatMap { pred =>
          val conn = new MySqlWireConnection(p)
          val tc = org.apache.spark.TaskContext.get()
          if (tc != null)
            tc.addTaskCompletionListener[Unit](_ => conn.close())
          // catalyst-form rows (UTF8String packet slices for UTF-8
          // connections) through the internal-row scan — same
          // String-free path as PgWireSource.readWithPredicates
          val (_, rows) = conn.queryStreamData(
            s"SELECT $select FROM $qtable WHERE $pred",
            java.nio.charset.Charset.forName(charsetName))
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
    val sparkSchema = StructType(names.map(n =>
      StructField(n, StringType, nullable = true)))
    org.apache.spark.sql.graft.FunctionInstaller
      .internalDataFrame(spark, rdd, sparkSchema)
  }
}
