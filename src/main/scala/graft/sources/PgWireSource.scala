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
    // modern catalog columns (attgenerated PG 12+, indnullsnotdistinct
    // PG 15+) degrade per-query on older sources — the legacy shapes
    // keep identical column positions (constants), so mappers are
    // untouched; the simple protocol recovers after a server error
    def queryOr(modern: String, legacy: String) =
      try conn.query(modern)._2
      catch { case _: PgWire.PgServerError => conn.query(legacy)._2 }
    try {
      val rows = queryOr(IntrospectionSql.pgsqlColumns,
        IntrospectionSql.pgsqlColumnsLegacy)
      val tables = IntrospectionRows.pgsqlTables(rows.map { r =>
        IntrospectionRows.PgColumn(r(0), r(1), r(2), r(3),
          Option(r(4)),
          // boolean TEXT wire form is t/f
          nullable = r(5) == "t" || r(5) == "true",
          // tolerant of 6-column responses (test doubles serving the
          // pre-enum-labels shape)
          enumLabels = if (r.length > 6) Option(r(6)) else None,
          identity = r.length > 7 && (r(7) == "a" || r(7) == "d"),
          relkind = if (r.length > 8 && r(8) != null) r(8) else "r",
          generated = r.length > 9 && r(9) == "s",
          unlogged = r.length > 10 && r(10) == "u",
          // absent column (test doubles) = legacy nextval→serial
          ownedSeq = r.length <= 11 || r(11) == "t" || r(11) == "true")
      })
      val idxRows = queryOr(IntrospectionSql.pgsqlIndexes,
        IntrospectionSql.pgsqlIndexesLegacy)
      val (_, fkRows) = conn.query(IntrospectionSql.pgsqlFKeys)
      val (_, tcRows) = conn.query(IntrospectionSql.pgsqlTableComments)
      val (_, ccRows) = conn.query(IntrospectionSql.pgsqlColumnComments)
      val (_, checkRows) = conn.query(IntrospectionSql.pgsqlChecks)
      val (_, exclRows) = conn.query(IntrospectionSql.pgsqlExclusions)
      IntrospectionRows.pgsqlAttachComments(
        IntrospectionRows.pgsqlAttachConstraints(tables, idxRows, fkRows),
        tcRows, ccRows, checkRows,
        // tolerant of test doubles answering with null/short rows
        exclRows.filter(r => r.length > 3 && r(1) != null && r(3) != null))
    } finally conn.close()
  }

  /** Standalone user sequences ([[IntrospectionSql.pgsqlSequences]])
    * — recreated on the target BEFORE the tables whose nextval
    * defaults reference them (Migrator pre phase). */
  def introspectSequences(params: PgWire.ConnParams)
      : Seq[graft.catalog.SequenceDef] = {
    val conn = new PgWireConnection(params)
    try {
      val (_, rows) = conn.query(IntrospectionSql.pgsqlSequences)
      // tolerant of test doubles answering with null/short rows
      rows.filter(r => r.length > 8 && r(2) != null && r(3) != null &&
        r(4) != null && r(5) != null).map { r =>
        graft.catalog.SequenceDef(
          schema = r(0), name = r(1),
          start = r(2).toLong, increment = r(3).toLong,
          minValue = r(4).toLong, maxValue = r(5).toLong,
          current = Option(r(6)).map(_.toLong),
          cycling = r(7) == "t" || r(7) == "true",
          cache = Option(r(8)).map(_.toLong).getOrElse(0L))
      }.toSeq
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
    * (column names, streaming row iterator, close).
    *
    * Two relpages=0 liars would otherwise stream an arbitrarily large
    * table through one driver thread; both are capacity-probed with a
    * `LIMIT 1 OFFSET maxRowsPerChunk` scalar subquery (bounded
    * server-side scan, at most one row on the wire, CASE-guarded so it
    * rides the relpages lookup as a lazily-executed SubPlan — ONE
    * round-trip per table, the manytables fixture pins that cost):
    * - relkind 'p' partitioned parents, whose relpages is 0 by
    *   construction (parents own no storage): probed over the WHOLE
    *   tree (plain FROM expands every partition) — a genuinely small
    *   parent keeps the ORM-scale fast path, a big one routes to
    *   [[readPartitioned]];
    * - never-ANALYZEd heaps, whose relpages lags VACUUM/ANALYZE:
    *   probed over the table's OWN rows (FROM ONLY) against what
    *   `pagesPerChunk` 8 KiB pages can physically hold (~290 28-byte
    *   rows/page). */
  def localScanIfSmall(params: PgWire.ConnParams, table: String,
                       pagesPerChunk: Long = 1000L,
                       selectCols: Seq[(String, String)] = Nil)
      : Option[() => (Seq[String], Iterator[Array[String]], () => Unit)] = {
    val conn = new PgWireConnection(params)
    val qtable = PgWire.quoteQualified(table)
    val smallKind: Option[String] =
      try {
        val regclass = PgWire.quoteLiteral(qtable)
        val cap = pagesPerChunk * 300L
        val (_, rows) = conn.query(
          s"""SELECT relpages, relkind::text,
             CASE WHEN relkind = 'r' AND relpages < $pagesPerChunk
                  THEN (SELECT 1 FROM ONLY $qtable LIMIT 1 OFFSET $cap)
                  WHEN relkind = 'p'
                  THEN (SELECT 1 FROM $qtable LIMIT 1 OFFSET $cap)
             END
             FROM pg_class WHERE oid = $regclass::regclass""")
        rows.headOption.collect {
          case r if r(2) == null &&
            (r(1) == "p" ||
              (r(1) == "r" && r(0).toLong < pagesPerChunk)) => r(1)
        }
      } finally conn.close()
    smallKind.map { kind => () => {
      val c = new PgWireConnection(params)
      // heaps read ONLY their own rows (an INHERITS parent's plain
      // FROM would also stream every child's rows — children migrate
      // as their own tables; see readByCtid); partitioned parents
      // NEED the plain FROM's whole-tree expansion
      val from = if (kind == "p") qtable else s"ONLY $qtable"
      val sel =
        if (selectCols.isEmpty) "*"
        else selectCols.map { case (e, n) =>
          s"$e AS ${PgWire.quoteIdent(n)}" }.mkString(", ")
      val (cols, rows) = c.queryStream(s"SELECT $sel FROM $from")
      (cols, rows, () => c.close())
    }}
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
    // FROM ONLY: every heap migrates as its own table, so each read
    // must take the table's OWN rows — a plain FROM on an old-style
    // INHERITS parent also returns every descendant's rows, loading
    // the children's data twice (the reference has this blind spot:
    // its read-rows SELECT has no ONLY, pgsql.clj:204-210, while its
    // relkind='r' table list includes the children as tables)
    readWithPredicates(spark, params, table,
      IntrospectionSql.pgsqlCtidPredicates(relpages, pagesPerChunk),
      selectCols, only = true)

  /** Leaf relations under a partitioned parent — the recursive
    * pg_inherits closure (multi-level partitioning walks through
    * intermediate relkind 'p' nodes), each with its OWN relpages and
    * relkind. Ordered by (schema, name) so the partition layout is
    * deterministic across runs. */
  def leafPartitionsOf(params: PgWire.ConnParams, table: String)
      : Seq[(String, Long, String)] = {
    val regclass = PgWire.quoteLiteral(PgWire.quoteQualified(table))
    val conn = new PgWireConnection(params)
    try {
      val (_, rows) = conn.query(
        s"""WITH RECURSIVE parts(oid) AS (
           SELECT $regclass::regclass::oid
           UNION ALL
           SELECT i.inhrelid FROM pg_inherits i
           JOIN parts p ON i.inhparent = p.oid
         )
         SELECT n.nspname, c.relname, c.relpages, c.relkind::text
         FROM parts p
         JOIN pg_class c ON c.oid = p.oid
         JOIN pg_namespace n ON n.oid = c.relnamespace
         WHERE c.relkind <> 'p'
         ORDER BY n.nspname, c.relname""")
      rows.map(r => (PgWire.joinQualified(r(0), r(1)), r(2).toLong, r(3)))
    } finally conn.close()
  }

  /** Read a partitioned PARENT by enumerating its leaf partitions and
    * ctid-splitting EACH leaf by its own relpages — the scale path a
    * parent's relpages=0 would otherwise deny it (a parent has no ctid
    * system column at all, so `WHERE ctid >= …` on the parent ERRORS;
    * and relpages-driven planning would read terabytes through one
    * stream). Column list and output names come from the PARENT (leaf
    * attnum order can differ after ATTACH PARTITION of an older table;
    * selecting parent columns by name per leaf is order-safe). A leaf
    * that is not a plain heap (e.g. a foreign-table partition, relkind
    * 'f' — no ctid there either) demotes the WHOLE read to the
    * predicate-free single-stream parent scan, which PG routes through
    * every partition correctly. The reference reads parents through
    * the same relpages machinery as heaps (pgsql.clj:206-208) and so
    * single-streams them — this path beats it instead of matching it. */
  def readPartitioned(spark: SparkSession, params: PgWire.ConnParams,
                      table: String,
                      pagesPerChunk: Long = 1000L,
                      selectCols: Seq[(String, String)] = Nil): DataFrame = {
    val leaves = leafPartitionsOf(params, table)
    if (leaves.isEmpty)
      // no leaves yet (empty parent): one predicate-free stream over
      // the parent is trivially correct
      readView(spark, params, table, selectCols)
    else {
      // heap leaves ctid-split by their own relpages; a non-heap leaf
      // (e.g. a postgres_fdw foreign-table partition — no ctid there)
      // gets ONE predicate-free target of its own, so a single archive
      // FDW partition does NOT demote the hot heap partitions to a
      // single stream. ONLY is safe: partitions cannot take part in
      // old-style inheritance (PG rejects INHERITS from/into partition
      // trees), so a leaf's ONLY rows ARE all its rows.
      val targets = leaves.flatMap { case (leaf, relpages, kind) =>
        val q = PgWire.quoteQualified(leaf)
        if (kind == "r")
          IntrospectionSql.pgsqlCtidPredicates(relpages, pagesPerChunk)
            .map(pred => (q, pred))
        else Seq((q, "true"))
      }
      readTargets(spark, params, table, targets, selectCols, only = true)
    }
  }

  /** Single-stream read WITHOUT ctid predicates — views (MATERIALIZE
    * VIEWS) have no ctid to split on, so the load is one streaming wire
    * connection. */
  def readView(spark: SparkSession, params: PgWire.ConnParams,
               table: String,
               selectCols: Seq[(String, String)] = Nil): DataFrame =
    // no ONLY: views reject it, and the partitioned-parent demotion
    // path NEEDS the whole-tree expansion
    readWithPredicates(spark, params, table, Seq("true"), selectCols,
      only = false)

  private def readWithPredicates(spark: SparkSession,
                                 params: PgWire.ConnParams,
                                 table: String, preds: Seq[String],
                                 selectCols: Seq[(String, String)],
                                 only: Boolean)
      : DataFrame =
    readTargets(spark, params, table,
      preds.map(p => (PgWire.quoteQualified(table), p)), selectCols,
      only)

  /** The shared distributed-read core: one Spark partition per
    * (quoted relation, predicate) target — identical relation for the
    * ctid/view reads, per-leaf relations for [[readPartitioned]].
    * `columnsTable` names the relation whose LIMIT 0 row description
    * defines the column list and output schema. */
  private def readTargets(spark: SparkSession,
                          params: PgWire.ConnParams,
                          columnsTable: String,
                          targets: Seq[(String, String)],
                          selectCols: Seq[(String, String)],
                          only: Boolean)
      : DataFrame = {
    val discovered =
      if (selectCols.nonEmpty) Nil else columnsOf(params, columnsTable)
    val cols =
      if (selectCols.nonEmpty) selectCols.map { case (e, a) =>
        if (e == PgWire.quoteIdent(a)) e else s"$e AS ${PgWire.quoteIdent(a)}"
      } else discovered.map(PgWire.quoteIdent)
    require(cols.nonEmpty, s"no columns resolved for $columnsTable")
    val names =
      if (selectCols.nonEmpty) selectCols.map(_._2) else discovered
    val select = cols.mkString(", ")
    val p = params // capture the case class, not this object
    // rows decode straight to catalyst form (UTF8String slices of the
    // wire payload, wrapped in GenericInternalRow) and enter the plan
    // via the internal-row scan — no per-field java-String round-trip
    // and no ExpressionEncoder pass. RDDScanExec's UnsafeProjection
    // copies each row out before anything downstream retains it.
    val rdd = spark.sparkContext
      .parallelize(targets, targets.length)
      .mapPartitions { it =>
        it.flatMap { case (qtable, pred) =>
          val conn = new PgWireConnection(p)
          // backstop for early task termination (limit, failure): the
          // task-completion listener closes the socket regardless of
          // how much of the stream Spark consumed
          val tc = org.apache.spark.TaskContext.get()
          if (tc != null)
            tc.addTaskCompletionListener[Unit](_ => conn.close())
          val (_, rows) = conn.queryStreamData(
            s"SELECT $select FROM ${if (only) "ONLY " else ""}$qtable " +
              s"WHERE $pred")
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
