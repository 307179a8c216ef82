package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.{PgService, PgWire}

/** libpq-compatible `.pgpass` / `pg_service.conf` resolution — the
  * cases mirror the reference's own unit suite
  * (clojure/test/pgloader/pg_service_test.clj) plus the CL parser's
  * escape grammar (src/parsers/parse-pgpass.lisp). */
class PgServiceSpec extends AnyFunSuite {

  private def tmpFile(contents: String): String = {
    val f = java.io.File.createTempFile("pgsvc", null)
    f.deleteOnExit()
    java.nio.file.Files.writeString(f.toPath, contents)
    f.getAbsolutePath
  }

  test("pgpass: exact match, wildcards, first-match-wins, comments, " +
    "no-match, missing file") {
    def lookup(contents: String, host: String = "localhost",
               port: Int = 5432, db: String = "mydb",
               user: String = "myuser"): Option[String] =
      PgService.pgpassLookup(host, port, db, user, tmpFile(contents))
    assert(lookup("localhost:5432:mydb:myuser:s3cr3t\n")
      .contains("s3cr3t"))
    assert(lookup("*:5432:mydb:myuser:pass1\n", host = "anyhost")
      .contains("pass1"))
    assert(lookup("*:*:*:*:defaultpass\n", host = "h", db = "d",
      user = "u").contains("defaultpass"))
    assert(lookup("otherhost:5432:mydb:myuser:pass\n").isEmpty)
    assert(lookup("localhost:5432:mydb:myuser:first\n" +
      "localhost:5432:mydb:myuser:second\n").contains("first"))
    assert(lookup("# comment line\nlocalhost:5432:mydb:myuser:thepass\n")
      .contains("thepass"))
    assert(PgService.pgpassLookup("h", 5432, "d", "u",
      "/nonexistent/pgpass").isEmpty)
  }

  test("pgpass: escaped colons and backslashes inside fields " +
    "(parse-pgpass.lisp grammar)") {
    // a password containing ':' and '\' spelled with libpq escapes
    assert(PgService.pgpassLookup("localhost", 5432, "mydb", "myuser",
        tmpFile("""localhost:5432:mydb:myuser:pa\:ss\\word""" + "\n"))
      .contains("pa:ss\\word"))
    // an escaped colon inside the HOST field doesn't split it
    assert(PgService.pgpassLookup("we:ird", 5432, "d", "u",
        tmpFile("""we\:ird:5432:d:u:pw""" + "\n")).contains("pw"))
  }

  test("pg_service.conf: section lookup with defaults; dbname and " +
    "database spellings; missing service") {
    val conf = tmpFile(
      """# services
        |[prod]
        |host=db.example.com
        |port=5433
        |dbname=sales
        |user=app
        |password=pw1
        |
        |[mini]
        |database=tiny
        |""".stripMargin)
    val p = PgService.serviceLookup("prod", conf).get
    assert(p == PgService.Service("db.example.com", 5433, "sales",
      "app", "pw1"))
    val m = PgService.serviceLookup("mini", conf).get
    assert(m == PgService.Service("localhost", 5432, "tiny", "", ""))
    assert(PgService.serviceLookup("absent", conf).isEmpty)
  }

  test("connParams: a password-less URI consults PGPASSFILE; " +
    "?service= resolves through PGSERVICEFILE") {
    // connParams reads the env-configured paths — this test can't set
    // env vars in-JVM, so it exercises the lookups directly above and
    // here only pins that a URI WITH a password never consults pgpass
    val p = PgWire.connParams(
      "postgresql://u:explicit@h:5/d",
      s => java.net.URLDecoder.decode(s, "UTF-8"))
    assert(p.password == "explicit" && p.port == 5)
  }
}
