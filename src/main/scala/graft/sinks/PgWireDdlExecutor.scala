package graft.sinks

import java.util.concurrent.ConcurrentLinkedQueue

/** Pooled DDL executor for the CLI — the per-STATEMENT connection
  * churn was the last table-count-linear cost after the small-table
  * fast path landed ("Create tables" on the 100-table fixture spent
  * ~4–5 ms per statement on loopback-trust dial+auth; SCRAM or TLS
  * multiplies that). pgloader keeps its pgconn open across a phase
  * (pgsql/connection.lisp); this pool gives the same amortization
  * while preserving the fresh-connection SEMANTICS the per-statement
  * wiring guaranteed:
  *
  *   - every REUSED connection runs `DISCARD ALL` first (SET
  *     SESSION AUTHORIZATION default + RESET ALL + DEALLOCATE ALL +
  *     drop temp tables + unlock advisory locks — PG's own
  *     back-to-initial-state statement), so a user BEFORE LOAD DO
  *     `SET …` can never leak into later statements the way it never
  *     leaked across fresh connections;
  *   - the session-setup statements (GUCs) re-apply after the
  *     discard, exactly as they applied on every fresh connection.
  *
  * A [[PgServerError]] leaves the wire at ReadyForQuery
  * ([[PgWireConnection.simpleCommand]] drains before throwing), so
  * the connection returns to the pool — tolerated post-phase DDL
  * failures (comments, FKs) keep their amortization. Any OTHER
  * exception (I/O, protocol) closes the connection. Pool size is
  * bounded by the caller's concurrency (the Migrator's index pool +
  * the driver thread); `close()` drains it. Thread-safe. */
final class PgWireDdlExecutor(params: PgWire.ConnParams)
    extends ((String, Seq[String]) => Unit) with AutoCloseable {

  private val pool = new ConcurrentLinkedQueue[PgWireConnection]
  @volatile private var closed = false

  /** connections dialed over the executor's lifetime (diagnostics —
    * the fixture spec asserts amortization actually happened). */
  val dialed = new java.util.concurrent.atomic.AtomicLong(0L)

  def apply(sql: String, sessionSetup: Seq[String]): Unit = {
    val (conn, reused) = Option(pool.poll()) match {
      case Some(c) => (c, true)
      case None => dialed.incrementAndGet()
        (new PgWireConnection(params), false)
    }
    var reusable = false
    try {
      if (reused) conn.simpleCommand("DISCARD ALL")
      sessionSetup.foreach(s => conn.simpleCommand(s.stripSuffix(";")))
      conn.simpleCommand(sql.stripSuffix(";"))
      reusable = true
    } catch {
      // server-reported SQL errors leave the wire synced at
      // ReadyForQuery — the connection is healthy; rethrow but keep it
      case e: PgWire.PgServerError => reusable = true; throw e
    } finally {
      if (reusable && !closed) pool.offer(conn) else conn.close()
      // a close() racing the offer above: drain whatever landed late
      if (closed) drain()
    }
  }

  /** Pooled catalog query — the CLI's `queryTarget` channel (one
    * query per table under `WITH copy binary` resolution). Same
    * discipline as [[apply]]: DISCARD ALL on reuse, server errors
    * keep the connection, anything else closes it. */
  def query(sql: String): Seq[Array[String]] = {
    val (conn, reused) = Option(pool.poll()) match {
      case Some(c) => (c, true)
      case None => dialed.incrementAndGet()
        (new PgWireConnection(params), false)
    }
    var reusable = false
    try {
      if (reused) conn.simpleCommand("DISCARD ALL")
      val rows = conn.query(sql)._2
      reusable = true
      rows
    } catch {
      case e: PgWire.PgServerError => reusable = true; throw e
    } finally {
      if (reusable && !closed) pool.offer(conn) else conn.close()
      if (closed) drain()
    }
  }

  private def drain(): Unit = {
    var c = pool.poll()
    while (c != null) { c.close(); c = pool.poll() }
  }

  override def close(): Unit = { closed = true; drain() }
}
