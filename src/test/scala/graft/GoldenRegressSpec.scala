package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.dsl.{Parser, PlanBuilder}
import graft.sources.CopyText

/** More of the reference's golden regressions
  * (src/regress/regress.lisp:17-112): run the .load command, read the
  * expected COPY text, assert EXCEPT-empty both ways. Type normalization
  * mirrors the PG column types each command's own BEFORE LOAD DO declares
  * (the reference compares inside PG; we compare typed values). */
class GoldenRegressSpec extends SparkSpec {

  private val base = "/root/reference/test"

  private def plan(name: String): DataFrame = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$base/$name")), "UTF-8")
    val (cmd, inline) = Parser.parseWithInline(text)
    PlanBuilder.build(spark, cmd, base, inline)
  }

  private def expected(name: String, fields: Seq[String]): DataFrame =
    CopyText.read(spark, s"$base/regress/expected/$name.out", fields)

  private def assertGolden(actual: DataFrame, exp: DataFrame): Unit = {
    assert(actual.count() == exp.count())
    val missing = exp.exceptAll(actual).count()
    val extra = actual.exceptAll(exp).count()
    assert(missing == 0 && extra == 0,
      s"golden mismatch: missing=$missing extra=$extra\n" +
        s"actual: ${actual.collect().take(5).mkString("; ")}\n" +
        s"expect: ${exp.collect().take(5).mkString("; ")}")
  }

  test("copy-hex.load: \\xHH input escapes, custom null marker") {
    // input: \x1a decodes to 0x1a; `\N` with null='--' stays literal
    // backslash-N; `--` is NULL (reference issue-style copy-hex fixture)
    // no field list in the command: positional names c1/c2
    val act = plan("copy-hex.load").select(
      col("c1").cast("long").as("id"), col("c2").as("text"))
    val exp = expected("copy-hex", Seq("id", "text")).select(
      col("id").cast("long").as("id"), col("text"))
    assertGolden(act, exp)
  }

  test("csv-non-printable.load: control bytes pass through untouched") {
    val fields = Seq("c1", "c2", "c3")
    val act = plan("csv-non-printable.load")
      .select(fields.map(col): _*)
    assertGolden(act, expected("csv-non-printable", fields))
  }

  test("csv-header.load: header line names the columns") {
    // no field list, `csv header` set: the PLAN names its columns from
    // the header line (the live COPY path sends them as the column
    // list); the target table orders `another` before `fields` —
    // reorder + type here like the name-matching server side would
    val act = plan("csv-header.load").select(
      col("somefields"), col("rekplcode"), col("`repl$grpid`"),
      col("`repl$id`"), col("another"), col("fields").cast("long"))
    val exp = expected("csv-header",
        Seq("somefields", "rekplcode", "grpid", "id", "another", "fields"))
      .select(col("somefields"), col("rekplcode"), col("grpid"),
        col("id"), col("another"), col("fields").cast("long"))
    assertGolden(act, exp)
  }

  /** PG datestyle=dmy parsing emulated test-side: 4-digit-first dates
    * are y-m-d, otherwise d-m-y; 2-digit years pivot into 2000s;
    * invalid dates (month 13 etc.) yield NULL — PG would error. */
  private lazy val pgDmy = udf { (s: String) =>
    if (s == null) null
    else try {
      val parts = s.trim.split("[-/]")
      val t = parts.map(_.toInt)
      val (y, m, d) =
        if (parts(0).length == 4) (t(0), t(1), t(2))
        else (t(2), t(1), t(0))
      // PG's documented two-digit-year pivot: < 70 -> 20xx, else 19xx
      val yy = if (y < 70) 2000 + y else if (y < 100) 1900 + y else y
      java.time.LocalDate.of(yy, m, d).toString
    } catch { case _: Exception => null }
  }

  test("xzero.load: trailing separator, null-if blank, dmy date parsing") {
    val act = plan("xzero.load").select(
      col("a").cast("long").as("a"),
      pgDmy(col("b")).as("b"), col("c"))
    val exp = expected("xzero", Seq("a", "b", "c")).select(
      col("a").cast("long").as("a"), col("b"), col("c"))
    assertGolden(act, exp)
  }

  test("csv-before-after.load: ip-range transform, ip4r rendering") {
    // PG's ip4r type renders an exactly-CIDR-aligned range as a/prefix,
    // a single address bare, and anything else dashed — emulate that
    // rendering over our `ip-range` transform output ("a-b")
    val ip4r = udf { (s: String) =>
      if (s == null) null
      else {
        def toLong(ip: String) =
          ip.split("\\.").map(_.toLong).reduce(_ * 256 + _)
        def toIp(v: Long) =
          Seq(24, 16, 8, 0).map(sh => (v >> sh) & 255).mkString(".")
        val Array(a, b) = s.split("-")
        val (lo, hi) = (toLong(a), toLong(b))
        val span = hi - lo + 1
        if (lo == hi) toIp(lo)
        else if ((span & (span - 1)) == 0 && lo % span == 0) {
          val prefix = 32 - java.lang.Long.numberOfTrailingZeros(span)
          s"${toIp(lo)}/$prefix"
        } else s"${toIp(lo)}-${toIp(hi)}"
      }
    }
    val act = plan("csv-before-after.load").select(
      ip4r(col("iprange")).as("iprange"),
      col("locId").cast("long").as("locid"))
    val exp = expected("csv-before-after", Seq("iprange", "locid")).select(
      col("iprange"), col("locid").cast("long").as("locid"))
    assertGolden(act, exp)
  }

  test("overflow.load: preflight rejects both rows (int overflow, NOT NULL)") {
    import graft.operators.Validate
    // no field list in the command: positional col1/col2
    val rules = Seq(Validate.Rule("col1", "int"),
      Validate.Rule("col2", "string", notNull = true))
    val staged = plan("overflow.load")
    // the expected golden is EMPTY: one row overflows int4, the other
    // has a NULL in the NOT NULL column — preflight classifies both
    // without a server round-trip
    assert(Validate.valid(staged, rules).count() == 0)
    val rej = Validate.rejects(staged, rules)
      .select(col("col1"), col("reasons")).collect()
      .map(r => (r.getString(0), r.getSeq[String](1).mkString(";")))
      .sortBy(_._1)
    assert(rej.length == 2)
    assert(rej(0)._1 == "12" &&
      rej(0)._2.contains("null value in NOT NULL column"))
    assert(rej(1)._2.contains("invalid input for type int"))
  }

  test("allcols.load: colon separator, subseq identity transform") {
    val act = plan("allcols.load").select(
      col("a").cast("long").as("a"), col("b").cast("date").as("b"),
      col("c"))
    val exp = expected("allcols", Seq("a", "b", "c")).select(
      col("a").cast("long").as("a"), col("b").cast("date").as("b"),
      col("c"))
    assertGolden(act, exp)
  }

  test("csv-keep-extra-blanks.load: blanks kept; v3/v4 divergence on " +
    "the space-then-quote row documented") {
    // 7 input rows. Row 7's third field starts with a space then a
    // quote: the reference's TWO engines disagree — the v3 CL parser
    // errors the row (this fixture's 6-row expected .out), the v4
    // reader ignores whitespace in front of an opening quote and LOADS
    // it (clojure/tests/csv/blanks-keep commits a 7-row baseline and
    // runs it for both engines). This engine follows v4 — blanks-keep
    // in ClojureGoldenSpec pins the 7-row behavior — so the one
    // extra row is excluded here before comparing against the v3 .out.
    val act = plan("csv-keep-extra-blanks.load")
      .select(col("f1"), col("f2"), col("f3"))
      .filter(col("f1") =!= "keep extra blanks")
    val exp = expected("csv-keep-extra-blanks",
        Seq("id", "f1", "f2", "f3"))
      .select(col("f1"), col("f2"), col("f3"))
    assertGolden(act, exp)
  }

  test("csv-error.load: char(20) overflow + encoding errors reject rows") {
    import graft.operators.Validate
    // quoting disabled (fields not enclosed): the lone quote in row 3
    // is data; rows 4 (28-char value vs char(20)) and 5 (non-ascii
    // bytes in a file declared ascii -> U+FFFD after decode) reject
    val rules = Seq(
      Validate.Rule("col1", "string", maxLength = Some(20),
        wellEncoded = true),
      Validate.Rule("col2", "string", maxLength = Some(20),
        wellEncoded = true))
    val act = Validate.valid(plan("csv-error.load"), rules)
      .select(rpad(col("col1"), 20, " ").as("nom"),
        rpad(col("col2"), 20, " ").as("prenom"))
    val exp = expected("csv-error", Seq("nom", "prenom"))
    assertGolden(act, exp)
  }

  test("csv-parse-date.load: per-field + command date formats, tz render") {
    // the PLAN now parses both: hr via its per-field [date format
    // 'HH24:MI.SS'] (rendered time-of-day), ts via the command-level
    // 'MM-DD-YYYY HH24-MI-SS.US' applied through the BEFORE LOAD DO
    // DDL's timestamptz typing — only PG's Europe/Paris timestamptz
    // RENDERING (SET timezone) is emulated here
    val pgTsTz = udf { (s: String) =>
      if (s == null) null
      else {
        val m = ("(\\d{4})-(\\d{2})-(\\d{2}) " +
          "(\\d{2}):(\\d{2}):(\\d{2})(?:\\.(\\d+))?").r
        s.trim match {
          case m(y, mo, d, h, mi, se, frac) =>
            val zone = java.time.ZoneId.of("Europe/Paris")
            val zdt = java.time.ZonedDateTime.of(y.toInt, mo.toInt,
              d.toInt, h.toInt, mi.toInt, se.toInt, 0, zone)
            val off = zdt.getOffset.getTotalSeconds / 3600
            val f = Option(frac).map(x => "." +
              x.reverse.dropWhile(_ == '0').reverse).filter(_ != ".")
              .getOrElse("")
            f"${y.toInt}%04d-${mo.toInt}%02d-${d.toInt}%02d " +
              f"${h.toInt}%02d:${mi.toInt}%02d:${se.toInt}%02d$f+$off%02d"
          case other => other
        }
      }
    }
    val act = plan("csv-parse-date.load").select(
      col("row num").cast("long").as("rn"),
      pgTsTz(col("ts")).as("ts"),
      col("hr"))
    val exp = expected("csv-parse-date", Seq("rn", "ts", "hr")).select(
      col("rn").cast("long").as("rn"), col("ts"), col("hr"))
    assertGolden(act, exp)
  }

  test("fk-reject.load: FK-violating row rejected engine-side (issue #1333)") {
    import graft.operators.Validate
    import spark.implicits._
    // parent keys come from the command's BEFORE LOAD DO inserts
    val parent = Seq(1, 2, 3).toDF("id")
    val staged = plan("fk-reject.load").select(
      col("id").cast("int").as("id"),
      col("parent_id").cast("int").as("parent_id"))
    val (valid, rejected) = Validate.fkSplit(staged, Seq("parent_id"),
      parent, Seq("id"))
    val exp = expected("fk-reject", Seq("id", "parent_id")).select(
      col("id").cast("int").as("id"),
      col("parent_id").cast("int").as("parent_id"))
    assertGolden(valid, exp)
    assert(rejected.collect().map(_.getInt(0)).toSeq == Seq(2))
  }

  test("errors.load: invalid dates and an unterminated quote reject rows") {
    import graft.operators.Validate
    // rejected: rows 2/3/5 (month 13/16 — PG date validation, emulated
    // with the dmy helper as a CUSTOM preflight reason) and row 10
    // (unterminated quote — parser-level reject). Ragged row 7 keeps
    // NULLs; extra columns on row 8 are ignored.
    val staged = plan("errors.load")
    val badDate = when(col("b").isNotNull && pgDmy(col("b")).isNull,
      lit("b: date/time field value out of range"))
    val act = Validate.valid(staged, Seq(Validate.Rule("a", "int")),
        custom = Seq(badDate))
      .select(col("a").cast("long").as("a"), pgDmy(col("b")).as("b"),
        col("c"))
    val exp = expected("errors", Seq("a", "b", "c")).select(
      col("a").cast("long").as("a"), col("b"), col("c"))
    assertGolden(act, exp)
  }

  test("serial.load: serial ids assigned in load order") {
    import graft.sources.{CsvDialect, CsvSource}
    // the serial column is PG-assigned in load order; readWithSerial
    // reproduces it from the (file, byte-offset) total order
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$base/serial.load")), "UTF-8")
    val (cmd, inline) = Parser.parseWithInline(text)
    val tmp = java.nio.file.Files.createTempFile("serial", ".dat")
    java.nio.file.Files.writeString(tmp, inline.get)
    val d = PlanBuilder.csvDialect(cmd, "ISO-8859-1")
    assert(d.separator == ';') // derived from the command, not re-typed
    val act = CsvSource.readWithSerial(spark, tmp.toString, d,
        Seq("c", "b"))
      .select(col("__serial").as("a"), pgDmy(col("b")).as("b"), col("c"))
    val exp = expected("serial", Seq("a", "b", "c")).select(
      col("a").cast("long").as("a"), col("b"), col("c"))
    assertGolden(act, exp)
  }

  test("csv-missing-col.load: short rows all reject (missing data for col)") {
    import graft.sources.{CsvDialect, CsvSource}
    // 7 declared fields, 6 data columns: PG COPY raises 'missing data
    // for column g' for EVERY row -> the expected golden is empty.
    // requireFullArity reproduces that engine-side.
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$base/csv-missing-col.load")), "UTF-8")
    val (cmd, inline) = Parser.parseWithInline(text)
    val tmp = java.nio.file.Files.createTempFile("missingcol", ".dat")
    java.nio.file.Files.writeString(tmp, inline.get)
    val fields = cmd.fields.map(_.name)
    assert(fields == Seq("a", "b", "c", "d", "e", "f", "g"))
    val d = PlanBuilder.csvDialect(cmd, "UTF-8")
    val loaded = CsvSource.read(spark, tmp.toString, d,
      fields, requireFullArity = true)
    assert(loaded.count() == 0)
    // and without the arity gate the 6 present columns parse fine
    assert(CsvSource.read(spark, tmp.toString, d, fields).count() == 6)
  }

  /** PG time rendering drops trailing fraction zeros. */
  private def normTime(c: Column): Column =
    regexp_replace(regexp_replace(c, "(\\.\\d*?)0+$", "$1"), "\\.$", "")

  test("copy.load: COPY text source passthrough (track_full)") {
    val fields = Seq("trackid", "track", "album", "media", "genre",
      "composer", "milliseconds", "bytes", "unitprice")
    assertGolden(plan("copy.load"), expected("copy", fields))
  }

  test("fixed.load: inline fixed-width, trim/null-if, time transform") {
    val act = plan("fixed.load").select(
      trim(col("a")).cast("long").as("a"),
      to_date(col("b"), "yyyyMMdd").as("b"),
      normTime(col("c")).as("c"),
      col("d"))
    val exp = expected("fixed", Seq("a", "b", "c", "d")).select(
      col("a").cast("long").as("a"),
      col("b").cast("date").as("b"),
      normTime(col("c")).as("c"),
      col("d"))
    assertGolden(act, exp)
  }

  test("csv.load: inline csv, doubled-quote escape, column subset/reorder") {
    val act = plan("csv.load").select(
      col("a").cast("long").as("a"), col("b").cast("long").as("b"),
      col("c"), col("camelCase"))
    val exp = expected("csv", Seq("a", "b", "c", "camelCase")).select(
      col("a").cast("long").as("a"), col("b").cast("long").as("b"),
      col("c"), col("camelCase"))
    assertGolden(act, exp)
  }

  test("udc.load: user-defined constant column, reorder") {
    val act = plan("udc.load").select(
      col("b").cast("long").as("b"), col("c"), col("d").cast("long").as("d"))
    val exp = expected("udc", Seq("b", "c", "d")).select(
      col("b").cast("long").as("b"), col("c"), col("d").cast("long").as("d"))
    assertGolden(act, exp)
  }

  test("partial.load: column subset dropped from the target") {
    val act = plan("partial.load").select(
      col("a").cast("long").as("a"), col("b"), col("c"), col("e"))
    val exp = expected("partial", Seq("a", "b", "c", "d", "e")).select(
      col("a").cast("long").as("a"), col("b"), col("c"), col("e"))
    assertGolden(act, exp)
  }

  test("csv-trim-extra-blanks.load: quoted blanks survive, unquoted trim to null") {
    val act = plan("csv-trim-extra-blanks.load")
      .select(col("f1"), col("f2"), col("f3"))
    // id is a PG serial (generated target-side); compare the data columns
    val exp = expected("csv-trim-extra-blanks",
        Seq("id", "f1", "f2", "f3"))
      .select(col("f1"), col("f2"), col("f3"))
    assertGolden(act, exp)
  }

  test("fields-with-periods.load: quoted identifiers with dots") {
    val act = plan("fields-with-periods.load")
      .select(col("`CHARS.LETTERS`"), col("`CHARS.NUMBERS`"))
    val exp = expected("fields-with-periods",
        Seq("CHARS.LETTERS", "CHARS.NUMBERS"))
      .select(col("`CHARS.LETTERS`"), col("`CHARS.NUMBERS`"))
    assertGolden(act, exp)
  }

  test("dbf-8b.load: real dBase IV file with memo (.dbt) fields") {
    import graft.sources.DbfSource
    // the plan applies the db3 default transforms itself
    val raw = plan("dbf-8b.load")
    val fields = Seq(("character", 'C', 0), ("numerical", 'N', 2),
      ("date", 'D', 0), ("logical", 'L', 0), ("float", 'F', 18),
      ("memo", 'M', 0))
    // float: PG prints 15 significant digits; compare rounded doubles
    val act = raw.select(
      col("character"), col("numerical"),
      col("date"), col("logical"),
      round(col("float").cast("double"), 10).as("float"), col("memo"))
    // the reference prints a missing memo reference as the literal
    // string NIL (its nil rendering); we keep SQL NULL
    val exp = expected("dbf-8b", fields.map(_._1)).select(
      col("character"), col("numerical"), col("date"), col("logical"),
      round(col("float").cast("double"), 10).as("float"),
      when(col("memo") === "NIL", lit(null: String))
        .otherwise(col("memo")).as("memo"))
    assertGolden(act, exp)
  }

  test("csv-using-sexp.load: split-sequence/format collapse (issue #965)") {
    val act = plan("csv-using-sexp.load").select(
      col("id").cast("long").as("id"), col("f1"))
    val exp = expected("csv-using-sexp", Seq("id", "f1")).select(
      col("id").cast("long").as("id"), col("f1"))
    assertGolden(act, exp)
  }

  test("csv-escape-mode.load: backslash escapes + identity transform") {
    val act = plan("csv-escape-mode.load").select(
      col("id").cast("long").as("id"), col("doctype"))
    val exp = expected("csv-escape-mode", Seq("id", "doctype")).select(
      col("id").cast("long").as("id"), col("doctype"))
    assertGolden(act, exp)
  }

  test("dbf-memo.load: cp866 DBF with .DBT memo and typed transforms") {
    import graft.sources.DbfSource
    // derive the per-column default transforms from the real header,
    // exactly like the command's cast layer would
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$base/data/DNORDOC.DBF"))
    val header = DbfSource.parseHeader(bytes)
    val raw = plan("dbf-memo.load")
    // the plan applies the db3 defaults itself; layer only the
    // command's USER casts on top (both idempotent over the defaults)
    val cols = header.fields.map { f =>
      val t =
        if (f.name == "normdocid")
          graft.functions.Transforms.registry("empty-string-to-null")(
            graft.functions.Transforms.registry("right-trim")(col(f.name)))
        else if (f.name == "doctype")
          graft.functions.Transforms.registry(
            "db3-numeric-to-pgsql-integer")(col(f.name))
        else col(f.name)
      t.as(f.name)
    }
    val act = raw.select(cols: _*)
    // the reference renders a missing memo reference as the literal
    // string NIL (same normalization as the dbf-8b golden)
    val exp = expected("dbf-memo", header.fields.map(_.name))
      .withColumn("docname",
        when(col("docname") === "NIL", lit(null: String))
          .otherwise(col("docname")))
    assertGolden(act, exp)
  }

  test("dbf.load: cp850 reg2013 file (accented region names)") {
    import graft.sources.DbfSource
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$base/data/reg2013.dbf"))
    val header = DbfSource.parseHeader(bytes)
    val raw = plan("dbf.load") // plan applies the db3 defaults itself
    val act = raw.select(header.fields.map(f => col(f.name)): _*)
    val exp = expected("dbf", header.fields.map(_.name))
    assertGolden(act, exp)
  }

  test("dbf-31.load: Visual FoxPro binary I/Y fields + _NullFlags") {
    import graft.sources.DbfSource
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$base/data/dbase_31.dbf"))
    val header = DbfSource.parseHeader(bytes)
    val raw = plan("dbf-31.load") // plan applies the db3 defaults itself
    val act = raw.select(header.fields.map(f => col(f.name)): _*)
    val exp = expected("dbf-31", header.fields.map(_.name))
    assertGolden(act, exp)
  }

  test("USING dq-string: field reference when it names a field") {
    // csv-non-printable.load's `c1 text using "Some-Field"` — a quoted
    // string naming an existing field is a reference, not a constant
    // (the full golden is not reproducible here: cl-csv skips blanks
    // before an opening quote while keeping control bytes, a whitespace
    // model univocity cannot express)
    val dir = java.nio.file.Files.createTempDirectory("dqref").toFile
    val f = new java.io.File(dir, "x.csv")
    java.nio.file.Files.writeString(f.toPath, "a,b\nc,d\n")
    val cmd = Parser.parse(
      s"""LOAD CSV FROM '${f.getAbsolutePath}'
          HAVING FIELDS ("Some-Field", other)
          INTO postgresql:///g TARGET TABLE t
          (c1 text using "Some-Field", marker text using "a constant")""")
    val got = PlanBuilder.build(spark, cmd)
      .orderBy(col("c1")).collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq == Seq(("a", "a constant"), ("c", "a constant")))
  }

  test("guessed dialect still honors skip header / csv header") {
    // regression: the guessed-dialect branch used to build the dialect
    // with default skipLines=0/header=false, loading the header line
    // as a data row
    val dir = java.nio.file.Files.createTempDirectory("guesshdr").toFile
    val f = new java.io.File(dir, "h.csv")
    java.nio.file.Files.writeString(f.toPath,
      "id,name,city\n1,ann,nyc\n2,bob,sfo\n3,cat,lax\n")
    val cmd = Parser.parse(
      s"""LOAD CSV FROM '${f.getAbsolutePath}'
          INTO postgresql:///g TARGET TABLE t
          WITH skip header = 1;""")
    val rows = PlanBuilder.build(spark, cmd).collect()
    assert(rows.length == 3, "header line must not load as data")
    assert(!rows.exists(_.getString(0) == "id"))
  }

  test("csv-guess.load: dialect guessed from the file sample") {
    val names = Seq("trackid", "track", "album", "media", "genre",
      "composer", "ms", "bytes", "price")
    val raw = plan("csv-guess.load") // positional col1..col9
    val act = raw.toDF(names: _*).select(
      col("trackid").cast("long").as("trackid"), col("track"),
      col("album"), col("media"), col("genre"), col("composer"),
      col("ms").cast("long").as("ms"),
      col("bytes").cast("long").as("bytes"),
      col("price").cast("double").as("price"))
    val exp = expected("csv-guess", names).select(
      col("trackid").cast("long").as("trackid"), col("track"),
      col("album"), col("media"), col("genre"), col("composer"),
      col("ms").cast("long").as("ms"),
      col("bytes").cast("long").as("bytes"),
      col("price").cast("double").as("price"))
    assertGolden(act, exp)
  }

  test("csv-filename-pattern.load: ~<regex> glob in data directory") {
    val act = plan("csv-filename-pattern.load").select(
      col("id").cast("long").as("id"), col("field"))
    val exp = expected("csv-filename-pattern", Seq("id", "field")).select(
      col("id").cast("long").as("id"), col("field"))
    assertGolden(act, exp)
  }

  test("csv-temp.load: semicolon separator, nil field name (issue #297)") {
    val act = plan("csv-temp.load").select(
      col("a").cast("long").as("a"), col("b"),
      col("nil").cast("double").as("nil"),
      col("t").cast("double").as("t"))
    val exp = expected("csv-temp", Seq("a", "b", "nil", "t")).select(
      col("a").cast("long").as("a"), col("b"),
      col("nil").cast("double").as("nil"),
      col("t").cast("double").as("t"))
    assertGolden(act, exp)
  }

  test("csv-json.load: 0x02 separator, fields not enclosed") {
    val act = plan("csv-json.load").toDF("json")
    val exp = expected("csv-json", Seq("json"))
    assertGolden(act, exp)
  }

  test("csv-nulls.load: null if '\\N' on an unquoted field") {
    val act = plan("csv-nulls.load").select(
      col("id").cast("long").as("id"),
      col("number").cast("long").as("number"), col("data"))
    val exp = expected("csv-nulls", Seq("id", "number", "data")).select(
      col("id").cast("long").as("id"),
      col("number").cast("long").as("number"), col("data"))
    assertGolden(act, exp)
  }
}
