package graft

import graft.sinks.{PgWire, PgWireConnection, PgWireCopyEndpoint}

/** Env-gated LIVE golden regressions: the reference's own regress method
  * (src/regress/regress.lisp:17-112) — run each `.load` fixture
  * end-to-end into a REAL PostgreSQL (DDL + COPY over the wire client),
  * COPY the reference's `expected/<name>.out` into a `(LIKE target)`
  * twin, and assert `EXCEPT ALL` empty BOTH WAYS inside the database.
  * Unlike GoldenRegressSpec (plan-level, compares DataFrames), this
  * proves the full production path — DDL, typed COPY text rendering,
  * reject/tolerated-error semantics — against a genuine server's
  * parsing and type system.
  *
  * Gated on GRAFT_LIVE_PG_URI (a scratch database — fixtures DROP and
  * recreate their tables). The fixture's own `INTO postgresql:///…`
  * only contributes the target TABLE name; the Runner routes every
  * statement and COPY to the live URI.
  */
class LiveGoldenSpec extends SparkSpec {

  private val base = "/root/reference/test"
  private def liveUri: Option[String] = LivePg.uri
  private val decode =
    (s: String) => java.net.URLDecoder.decode(s, "UTF-8")

  private def runner(uri: String): Runner = {
    val dp = PgWire.connParams(uri, decode)
    new Runner(
      executeDdl = (sql, setup) => {
        val c = new PgWireConnection(dp)
        try {
          setup.foreach(s => c.simpleCommand(s.stripSuffix(";")))
          c.simpleCommand(sql.stripSuffix(";"))
        } finally c.close()
      },
      endpointFactory = (table, setup) => _ => new PgWireCopyEndpoint(
        dp, s"COPY ${PgWire.quoteQualified(table)} FROM STDIN", setup),
      queryTarget = sql => {
        val c = new PgWireConnection(dp)
        try c.query(sql)._2 finally c.close()
      })
  }

  /** Fixtures with an expected/<name>.out and only local/inline inputs
    * — the driving list is exactly the names here. The ONLY exclusion
    * is csv-before-after, whose AFTER LOAD needs the ip4r server
    * extension (not in a stock PostgreSQL; plan-level golden covers
    * it). */
  private val fixtures = Seq(
    "copy-hex", "copy", "csv-header", "csv-non-printable", "csv-nulls",
    "csv-trim-extra-blanks", "csv-keep-extra-blanks", "csv-parse-date",
    "csv-escape-mode", "csv-missing-col", "csv-using-sexp", "csv-json",
    "fields-with-periods", "fixed", "serial", "udc", "xzero",
    "overflow", "partial", "errors", "csv-error", "csv-guess",
    "csv-filename-pattern", "dbf-31", "dbf-8b", "ixf", "fk-reject",
    "allcols", "csv", "csv-temp", "dbf", "dbf-memo", "csv-districts")
  // csv-before-after additionally requires the ip4r extension on the
  // server (its AFTER LOAD casts to ip4r) — not part of a stock
  // PostgreSQL install; covered at plan level by GoldenRegressSpec

  for (name <- fixtures)
    test(s"live golden: $name.load loads + matches expected inside PG") {
      assume(liveUri.isDefined, "set GRAFT_LIVE_PG_URI to run")
      val uri = liveUri.get
      val text = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$base/$name.load")), "UTF-8")
      val (cmd, _) = graft.dsl.Parser.parseWithInline(text, base)
      val table = (cmd.targetSchema, cmd.targetTable) match {
        case (Some(s), Some(t)) => s"$s.$t"
        case (_, t) => t.getOrElse("data")
      }
      val q = PgWire.quoteQualified(table)

      // rerun-proof: fixtures relying on `WITH create table` use
      // CREATE TABLE IF NOT EXISTS, so a stale table from an earlier
      // run (or an older type mapping) would silently survive
      locally {
        val p0 = PgWire.connParams(uri, decode)
        val c0 = new PgWireConnection(p0)
        // CASCADE: other suites' fixtures may have hung FKs off this
        // table (clojure tests/csv/playlist-track references csv.track)
        try c0.simpleCommand(s"DROP TABLE IF EXISTS $q CASCADE")
        finally c0.close()
      }

      runner(uri).runFile(spark, text, base)

      val p = PgWire.connParams(uri, decode)
      val c = new PgWireConnection(p)
      try {
        // the command's SET params (search_path!) must apply on the
        // compare connection too — the loaded table may resolve
        // through them
        cmd.setParams.foreach { case (k, v) =>
          c.simpleCommand(s"SET $k = '$v'") }
        c.simpleCommand("DROP TABLE IF EXISTS __graft_expected")
        c.simpleCommand(s"CREATE TABLE __graft_expected (LIKE $q)")
        val exp = java.nio.file.Files.readAllBytes(java.nio.file.Paths
          .get(s"$base/regress/expected/$name.out"))
        c.copyIn("COPY __graft_expected FROM STDIN", exp)
        // the reference renders a missing dbf memo pointer as the
        // literal string NIL (its lisp nil); we store SQL NULL — same
        // normalization the plan-level dbf goldens apply
        Map("dbf-8b" -> "memo", "dbf-memo" -> "docname").get(name)
          .foreach(col => c.simpleCommand(
            s"UPDATE __graft_expected SET $col = NULL WHERE $col = 'NIL'"))
        // v3/v4 divergence, documented in GoldenRegressSpec: row 7's
        // space-then-quote field errors under the v3 CL parser (this
        // 6-row .out) but LOADS under v4 (clojure/tests/csv/blanks-keep
        // pins 7 rows; ClojureGoldenSpec runs it). The engine follows
        // v4 — drop the one extra row before comparing to the v3 out.
        if (name == "csv-keep-extra-blanks")
          c.simpleCommand(
            s"DELETE FROM $q WHERE f1 = 'keep extra blanks'")
        // compare the canonical COMPOSITE-TEXT rendering of each row:
        // identical to EXCEPT ALL on the rows, but types without an
        // equality operator (point, csv-districts) still compare
        val r = c.query(
          s"SELECT (SELECT count(*) FROM (" +
            s"SELECT (t.*)::text FROM $q t EXCEPT ALL " +
            "SELECT (t.*)::text FROM __graft_expected t) a) AS extra, " +
            "(SELECT count(*) FROM (" +
            "SELECT (t.*)::text FROM __graft_expected t EXCEPT ALL " +
            s"SELECT (t.*)::text FROM $q t) b) AS missing, " +
            s"(SELECT count(*) FROM $q) AS n")._2.head
        assert(r(0) == "0" && r(1) == "0",
          s"$name: extra=${r(0)} missing=${r(1)} (n=${r(2)})")
        info(s"live golden $name: ${r(2)} rows byte-equal inside PG")
        c.simpleCommand("DROP TABLE IF EXISTS __graft_expected")
      } finally c.close()
    }

  test("live golden: csv-hstore.load — quoted target table, hstore " +
    "values over COPY, the bad row rejects server-side") {
    // the fixture ships no expected/.out (it's not in the reference's
    // regress list), so the assertions pin its DOCUMENTED semantics:
    // rows 1-3 are hstore literals and load; row 4 ('baddata') is not
    // an hstore and rejects per-row; the `quote identifiers` WITH
    // option keeps the "HS" spelling
    assume(liveUri.isDefined, "set GRAFT_LIVE_PG_URI to run")
    val uri = liveUri.get
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$base/csv-hstore.load")), "UTF-8")
    val stats = runner(uri).runFile(spark, text, base)
    assert(stats.map(s => (s.rows, s.rejected)) == Seq((3L, 1L)),
      stats.mkString("; "))
    val p = PgWire.connParams(uri, decode)
    val c = new PgWireConnection(p)
    try {
      val r = c.query("""SELECT id, kv -> 'email', kv -> 'c' """ +
        """FROM "HS" ORDER BY id""")._2.map(_.toSeq)
      assert(r == Seq(
        Seq("1", "foo@example.com", null),
        Seq("2", null, null),
        Seq("3", null, "quoted hstore value")), r.mkString("; "))
      c.simpleCommand("""DROP TABLE "HS"""")
    } finally c.close()
  }
}
