package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Driver-free MS SQL Server read over the native TDS client — closes
  * the last driver gap (PG/MySQL speak their wire protocols, SQLite
  * reads the file format). Follows the reference's MSSQL source shape
  * (src/sources/mssql/mssql.lisp): sys-views introspection, one
  * streaming SELECT per table with per-type server-side rendering
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

  /** Read `schema.table`: one streaming TDS connection (the reference
    * reads MSSQL single-stream too — no ctid/rowid analog to split on;
    * the map-side work downstream is where Spark parallelism applies).
    * `selectExpr` defaults to bracket-quoted discovered columns — pass
    * [[ColumnSqlExpressions.mssql]] output for type-stable rendering. */
  def read(spark: SparkSession, params: TdsWire.ConnParams,
           schema: String, table: String,
           selectExpr: Seq[String] = Nil): DataFrame = {
    val qtable = s"${quoteIdent(schema)}.${quoteIdent(table)}"
    val discovered =
      if (selectExpr.nonEmpty) Nil
      else {
        val conn = new TdsWireConnection(params)
        try conn.query(s"SELECT TOP 0 * FROM $qtable")._1
        finally conn.close()
      }
    val cols =
      if (selectExpr.nonEmpty) selectExpr else discovered.map(quoteIdent)
    require(cols.nonEmpty, s"no columns resolved for $schema.$table")
    val names =
      if (selectExpr.nonEmpty) selectExpr.map(c =>
        c.split("(?i) AS ").last.trim.stripPrefix("[").stripSuffix("]"))
      else discovered
    val select = cols.mkString(", ")
    val p = params
    val rdd = spark.sparkContext
      .parallelize(Seq(0), 1)
      .mapPartitions { it =>
        it.flatMap { _ =>
          val conn = new TdsWireConnection(p)
          val tc = org.apache.spark.TaskContext.get()
          if (tc != null)
            tc.addTaskCompletionListener[Unit](_ => conn.close())
          val (_, rows) = conn.queryStream(s"SELECT $select FROM $qtable")
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
