package graft

import org.scalatest.funsuite.AnyFunSuite
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._
import graft.casting.{DefaultCastRules, SourceColumn}
import graft.catalog._
import graft.dsl.Ast._
import graft.orchestration.Migrator

/** Orchestrator phase ordering and catalog-rewrite semantics
  * (migrate-database.lisp:326-574): DDL before any load; a finished
  * table's indexes overlap remaining copies; PK/FK/sequences strictly
  * after; stats roll up. */
class MigrateSpec extends AnyFunSuite {

  private def mkCatalog: Catalog = {
    def tbl(name: String, rows: Long, withFk: Boolean = false) = Table(
      name = name, schema = "public", rowCountEstimate = rows,
      fields = Seq(
        SourceColumn(name, "id", "int(10)", autoIncrement = true,
          nullable = false),
        SourceColumn(name, "val", "varchar(20)")),
      indexes = Seq(Index(s"${name}_pkey", name, primary = true,
        unique = true, columns = Seq("id"))),
      fkeys = if (withFk)
        Seq(FKey(s"${name}_fk", name, Seq("val"), "big", Seq("id")))
      else Nil)
    Catalog("test", Seq(Schema("public", tables = Seq(
      tbl("small", 10), tbl("big", 1000), tbl("mid", 100, withFk = true),
      tbl("tempthing", 5)))))
  }

  test("phases order correctly and index builds overlap copies") {
    val events = new ConcurrentLinkedQueue[String]
    val loading = new ConcurrentLinkedQueue[String]
    val migrator = new Migrator(
      executeDdl = (sql, _) => events.add(sql.replaceAll("\\s+", " ")),
      loadTable = (t, _) => {
        events.add(s"LOAD:${t.name}")
        loading.add(t.name)
        Thread.sleep(if (t.name == "big") 150 else 10)
        loading.remove(t.name)
        (t.rowCountEstimate, 0L)
      },
      workers = 4, maxParallelIndexes = 2)
    val summary = migrator.migrate(mkCatalog,
      defaults = DefaultCastRules.mysql,
      excluding = Seq(TableFilter(Seq(NamePattern("^temp", isRegex = true)),
        None)))
    val ev = events.asScala.toSeq

    // filtered table never appears
    assert(!ev.exists(_.contains("tempthing")))
    // every CREATE TABLE precedes every LOAD
    val lastCreate = ev.lastIndexWhere(_.startsWith("CREATE TABLE"))
    val firstLoad = ev.indexWhere(_.startsWith("LOAD:"))
    assert(lastCreate >= 0 && firstLoad > lastCreate)
    // per table: its index build comes after its own load
    for (t <- Seq("small", "big", "mid")) {
      val li = ev.indexOf(s"LOAD:$t")
      val ii = ev.indexWhere(e => e.startsWith("CREATE UNIQUE INDEX") &&
        e.contains(s"${t}_pkey"))
      assert(li >= 0 && ii > li, s"index for $t not after its load: $ev")
    }
    // small's index build happened BEFORE big's (overlap with copies):
    // big's copy sleeps 150ms, small's 10ms
    val smallIdx = ev.indexWhere(e => e.startsWith("CREATE UNIQUE INDEX") &&
      e.contains("small_pkey"))
    val bigIdx = ev.indexWhere(e => e.startsWith("CREATE UNIQUE INDEX") &&
      e.contains("big_pkey"))
    assert(smallIdx < bigIdx)
    // PK attach and FK strictly after all loads and index builds
    val firstAlter = ev.indexWhere(_.startsWith("ALTER TABLE"))
    val lastIdx = ev.lastIndexWhere(_.startsWith("CREATE UNIQUE INDEX"))
    val lastLoad = ev.lastIndexWhere(_.startsWith("LOAD:"))
    assert(firstAlter > lastIdx && firstAlter > lastLoad)
    // serial column → sequence reset in post phase
    assert(ev.exists(_.contains("setval")))

    // stats: ordered biggest-first, totals roll up
    assert(summary.tables.map(_.table) == Seq("big", "mid", "small"))
    assert(summary.totalRows == 1110 && summary.totalRejected == 0)
    assert(summary.render.contains("public.big"))
    assert(summary.render.contains("Total"))
  }

  test("including/excluding filters with schema scope") {
    val cat = mkCatalog
    val inc = CatalogRewrite.filter(cat,
      including = Seq(TableFilter(Seq(NamePattern("^(big|mid)$",
        isRegex = true)), None)),
      excluding = Nil)
    assert(inc.allTables.map(_.name).sorted == Seq("big", "mid"))
    val scoped = CatalogRewrite.filter(cat,
      including = Nil,
      excluding = Seq(TableFilter(Seq(NamePattern("big", isRegex = false)),
        Some("other")))) // wrong schema → no effect
    assert(scoped.allTables.map(_.name).contains("big"))
  }

  test("alter table rename and set schema rewrite the catalog") {
    val cat = mkCatalog
    val renamed = CatalogRewrite.alterTable(cat, Seq(
      AlterTableRule(Seq(NamePattern("^big$", isRegex = true)),
        RenameTo("orders"))))
    assert(renamed.allTables.exists(_.name == "orders"))
    assert(!renamed.allTables.exists(_.name == "big"))
    val moved = CatalogRewrite.alterTable(cat, Seq(
      AlterTableRule(Seq(NamePattern("mid", isRegex = false)),
        SetSchema("archive"))))
    val archived = moved.schemas.find(_.name == "archive").get
    assert(archived.tables.map(_.name) == Seq("mid"))
    assert(archived.tables.head.schema == "archive")
  }

  test("before/after DO, SET params, enum types, checks and comments") {
    val events = new ConcurrentLinkedQueue[String]
    val cat = Catalog("c", Seq(Schema("public", tables = Seq(Table(
      name = "shirts", schema = "public", rowCountEstimate = 1,
      comment = Some("a table"),
      fields = Seq(
        SourceColumn("shirts", "id", "int(10)"),
        SourceColumn("shirts", "size", "enum('S','M','L')"),
        SourceColumn("shirts", "tags", "set('a','b')")),
      checks = Seq("id > 0"))))))
    val setups = new ConcurrentLinkedQueue[Seq[String]]
    val loadSetups = new ConcurrentLinkedQueue[Seq[String]]
    val m = new Migrator(
      executeDdl = (sql, setup) => {
        events.add(sql.replaceAll("\\s+", " ")); setups.add(setup) },
      loadTable = (_, setup) => { loadSetups.add(setup); (1L, 0L) })
    m.migrate(cat, defaults = DefaultCastRules.mysql,
      beforeLoad = Seq("DROP TABLE IF EXISTS shirts;"),
      afterLoad = Seq("ANALYZE shirts;"),
      setParams = Seq("maintenance_work_mem" -> "128MB"),
      disableTriggers = true,
      withIndexes = false, withFKeys = false, resetSequences = false)
    val ev = events.asScala.toSeq
    // ordering: BEFORE DO → CREATE TYPE/TABLE → load → checks/comments →
    // AFTER DO. SET gucs are per-connection setup handed to EVERY ddl
    // call and every load; the trigger-disabling replica role reaches
    // ONLY the data-copy connections — BEFORE/AFTER LOAD DO and DDL run
    // with triggers and FK enforcement live (core.clj:821,909 scopes
    // replica to copy-table connections).
    val gucOnly = Seq("SET maintenance_work_mem = '128MB';")
    val copySetup = gucOnly :+ "SET session_replication_role = 'replica';"
    assert(setups.asScala.toSeq.nonEmpty &&
      setups.asScala.toSeq.forall(_ == gucOnly))
    assert(loadSetups.asScala.toSeq == Seq(copySetup))
    assert(ev.head == "DROP TABLE IF EXISTS shirts;")
    val enumIdx = ev.indexWhere(_.startsWith(
      "CREATE TYPE shirts_size AS ENUM ('S', 'M', 'L')"))
    val setIdx = ev.indexWhere(_.startsWith(
      "CREATE TYPE shirts_tags AS ENUM ('a', 'b')"))
    val createIdx = ev.indexWhere(_.startsWith("CREATE TABLE"))
    assert(enumIdx >= 0 && setIdx >= 0 && createIdx > enumIdx)
    // column types rewritten to the registered enum types
    assert(ev(createIdx).contains("size shirts_size"))
    assert(ev(createIdx).contains("tags shirts_tags[]"))
    val checkIdx = ev.indexWhere(_.contains("ADD CONSTRAINT"))
    val commentIdx = ev.indexWhere(_.startsWith("COMMENT ON TABLE"))
    assert(checkIdx > createIdx && commentIdx > createIdx)
    assert(ev.last == "ANALYZE shirts;")
  }

  test("failed loads and index DDL surface in the summary, not as aborts") {
    val m = new Migrator(
      executeDdl = (sql, _) =>
        if (sql.startsWith("CREATE UNIQUE INDEX") && sql.contains("big_pkey"))
          throw new RuntimeException("index blew up")
        else (),
      loadTable = (t, _) =>
        if (t.name == "mid") throw new RuntimeException("disk full")
        else (t.rowCountEstimate, 0L))
    val summary = m.migrate(mkCatalog,
      defaults = DefaultCastRules.mysql,
      withFKeys = false, resetSequences = false)
    // mid failed: recorded with its error, everything else loaded
    assert(summary.failedTables.map(_.table) == Seq("mid"))
    assert(summary.failedTables.head.error.get.contains("disk full"))
    assert(summary.totalRows == 1015) // big 1000 + small 10 + tempthing 5
    // big's index DDL failed: collected, run completed anyway
    assert(summary.ddlErrors.exists { case (sql, msg) =>
      sql.contains("big_pkey") && msg.contains("index blew up") })
    // and its PK attach was skipped — attaching a PK USING a missing
    // index would have aborted the post phase
    assert(!summary.postDdl.exists(_.contains("big_pkey")))
  }

  test("post-phase DDL failures are collected, not fatal") {
    val m = new Migrator(
      executeDdl = (sql, _) =>
        if (sql.startsWith("ALTER TABLE") && sql.contains("FOREIGN KEY"))
          throw new RuntimeException("fkey violation")
        else (),
      loadTable = (t, _) => (t.rowCountEstimate, 0L))
    val summary = m.migrate(mkCatalog,
      defaults = DefaultCastRules.mysql, resetSequences = false)
    assert(summary.failedTables.isEmpty)
    assert(summary.ddlErrors.exists { case (sql, msg) =>
      sql.contains("FOREIGN KEY") && msg.contains("fkey violation") })
    // failed FK DDL is not recorded as applied
    assert(!summary.postDdl.exists(_.contains("FOREIGN KEY")))
  }

  test("identifier collision check fails fast") {
    val longA = "public." + ("x" * 62) + "a"
    val longB = ("x" * 62) + "b"
    val cat = Catalog("c", Seq(Schema("public", tables = Seq(
      Table(name = ("x" * 62) + "ay", schema = "public"),
      Table(name = ("x" * 62) + "az", schema = "public")))))
    val m = new Migrator((_, _) => (), (_, _) => (0L, 0L))
    val e = intercept[IllegalArgumentException](m.migrate(cat))
    assert(e.getMessage.contains("collision"))
  }
}
