package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.{PgWire, PgWireDdlExecutor}

/** The pooled DDL executor: one dialed connection serves many
  * statements, every reuse runs DISCARD ALL before the session setup
  * (fresh-connection semantics), and close() drains the pool. The
  * server-error-keeps-the-connection path is live-pinned in
  * LiveManyTablesSpec (FakePgServer has no DDL error hook). */
class PgWireDdlExecutorSpec extends AnyFunSuite {

  test("sequential statements reuse ONE connection; DISCARD ALL + " +
    "session setup precede every reused statement") {
    val srv = new FakePgServer()
    try {
      val exec = new PgWireDdlExecutor(PgWire.ConnParams(
        "127.0.0.1", srv.port, "db", "graft", "secret"))
      val setup = Seq("SET work_mem = '16MB';")
      (1 to 5).foreach(i => exec(s"CREATE TABLE t$i (id int4);", setup))
      exec.close()
      assert(exec.dialed.get() == 1, s"dialed ${exec.dialed.get()}")
      val ev = srv.executed.synchronized(srv.executed.toList)
      // first statement: setup + DDL (no discard — fresh connection);
      // each later one: ROLLBACK (stray-BEGIN guard), DISCARD ALL,
      // setup, DDL
      assert(ev.take(2) ==
        List("SET work_mem = '16MB'", "CREATE TABLE t1 (id int4)"))
      assert(ev.drop(2).grouped(4).toList.zipWithIndex.forall {
        case (List(r, d, s, c), i) =>
          r == "ROLLBACK" && d == "DISCARD ALL" &&
            s == "SET work_mem = '16MB'" &&
            c == s"CREATE TABLE t${i + 2} (id int4)"
        case _ => false
      }, ev.mkString("; "))
      assert(srv.connections.get() == 1)
    } finally srv.close()
  }

  test("query shares the pool with the same DISCARD-on-reuse " +
    "discipline") {
    val srv = new FakePgServer(tableCols = Seq("a"),
      tableRows = Seq(Array("1")))
    try {
      val exec = new PgWireDdlExecutor(PgWire.ConnParams(
        "127.0.0.1", srv.port, "db", "graft", "secret"))
      exec("CREATE TABLE q1 (id int4);", Nil)
      val rows = exec.query("SELECT a FROM t")
      assert(rows.map(_.toSeq) == Seq(Seq("1")))
      exec("CREATE TABLE q2 (id int4);", Nil)
      exec.close()
      assert(exec.dialed.get() == 1, s"dialed ${exec.dialed.get()}")
      val ev = srv.executed.synchronized(srv.executed.toList)
      // the SELECT itself goes to the resultset handler, not
      // `executed`; the reuse discipline shows as the guard pairs
      assert(ev == List("CREATE TABLE q1 (id int4)",
        "ROLLBACK", "DISCARD ALL",
        "ROLLBACK", "DISCARD ALL", "CREATE TABLE q2 (id int4)"),
        ev.mkString("; "))
    } finally srv.close()
  }

  test("concurrent statements bound the pool by concurrency and " +
    "close() leaves no live connections") {
    val srv = new FakePgServer()
    try {
      val exec = new PgWireDdlExecutor(PgWire.ConnParams(
        "127.0.0.1", srv.port, "db", "graft", "secret"))
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      try {
        val futures = (1 to 40).map(i => pool.submit(new Runnable {
          def run(): Unit = exec(s"CREATE TABLE c$i (id int4);", Nil)
        }))
        futures.foreach(_.get())
      } finally pool.shutdown()
      assert(exec.dialed.get() <= 4,
        s"dialed ${exec.dialed.get()} for 4 threads")
      assert(srv.executed.synchronized(srv.executed.count(
        _.startsWith("CREATE TABLE c"))) == 40)
      exec.close()
      // a post-close statement dials fresh and closes straight away —
      // never pools (the drain raced nothing here, this pins behavior)
      exec("CREATE TABLE late (id int4);", Nil)
      assert(srv.executed.synchronized(
        srv.executed.exists(_.contains("late"))))
    } finally srv.close()
  }
}
