package graft

import org.apache.spark.sql.functions._
import graft.dsl.{Parser, PlanBuilder}
import graft.sources.CopyText

/** The reference's golden regression mechanism (src/regress/regress.lisp:
  * 81-112): run the load command, load the expected COPY-text file, and
  * assert `expected EXCEPT actual` is empty. Point columns are compared
  * by their numeric components (the reference casts them to text because
  * point has no equality operator; the driver here compares doubles,
  * which also absorbs float-rendering differences). */
class DslGoldenSpec extends SparkSpec {

  test("csv-districts.load matches test/regress/expected/csv-districts.out") {
    val base = "/root/reference/test"
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$base/csv-districts.load")), "UTF-8")
    val cmd = Parser.parse(text)
    val plan = PlanBuilder.build(spark, cmd, baseDir = base)

    // target types from the command's own BEFORE LOAD DO create-table DDL:
    // usps/geoid text, aland/awater bigint, *_sqmi double, location point
    val actual = plan.select(
      trim(col("usps")).as("usps"),
      trim(col("geoid")).as("geoid"),
      trim(col("aland")).cast("long").as("aland"),
      trim(col("awater")).cast("long").as("awater"),
      trim(col("aland_sqmi")).cast("double").as("aland_sqmi"),
      trim(col("awater_sqmi")).cast("double").as("awater_sqmi"),
      regexp_extract(col("location"), "\\(([^,]+),", 1)
        .cast("double").as("loc_x"),
      regexp_extract(col("location"), ",([^)]+)\\)", 1)
        .cast("double").as("loc_y"))

    val expected = CopyText.read(spark, s"$base/regress/expected/csv-districts.out",
        Seq("usps", "geoid", "aland", "awater", "aland_sqmi", "awater_sqmi",
          "location"))
      .select(
        col("usps"), col("geoid"),
        col("aland").cast("long").as("aland"),
        col("awater").cast("long").as("awater"),
        col("aland_sqmi").cast("double").as("aland_sqmi"),
        col("awater_sqmi").cast("double").as("awater_sqmi"),
        regexp_extract(col("location"), "\\(([^,]+),", 1)
          .cast("double").as("loc_x"),
        regexp_extract(col("location"), ",([^)]+)\\)", 1)
          .cast("double").as("loc_y"))

    assert(actual.count() == expected.count())
    val missing = expected.exceptAll(actual).count()
    val extra = actual.exceptAll(expected).count()
    assert(missing == 0 && extra == 0,
      s"golden mismatch: missing=$missing extra=$extra")
  }

  test("DECODING TABLE NAMES MATCHING overrides the read encoding") {
    // a latin-1 file: 'café,münchen' with real 0xE9/0xFC bytes — read as
    // UTF-8 these bytes are malformed and would mangle to U+FFFD
    val dir = java.nio.file.Files.createTempDirectory("decoding").toFile
    val f = new java.io.File(dir, "accents_latin.csv")
    val out = new java.io.FileOutputStream(f)
    out.write("1,café\n2,münchen\n".getBytes("ISO-8859-1"))
    out.close()
    val loadText =
      s"""LOAD CSV
         FROM '${f.getAbsolutePath}'
         HAVING FIELDS (id, name)
         INTO postgresql:///graft
         TARGET TABLE accents
         DECODING TABLE NAMES MATCHING ~/accents/ AS latin1"""
    val cmd = Parser.parse(loadText)
    assert(cmd.decodingAs.nonEmpty)
    val got = PlanBuilder.build(spark, cmd)
      .orderBy(col("id")).collect().map(_.getString(1)).toSeq
    assert(got == Seq("café", "münchen"), s"bad decode: $got")
    // same file WITHOUT the decoding rule → UTF-8 default mangles bytes
    val plain = Parser.parse(loadText.split("DECODING")(0))
    val mangled = PlanBuilder.build(spark, plain)
      .orderBy(col("id")).collect().map(_.getString(1)).toSeq
    assert(mangled != Seq("café", "münchen"),
      "control: latin-1 bytes must NOT survive a UTF-8 read")
  }

  test("DECODING applies per file within a glob, not to siblings") {
    val dir = java.nio.file.Files.createTempDirectory("decoding2").toFile
    val a = new java.io.File(dir, "latin_a.csv")
    val fa = new java.io.FileOutputStream(a)
    fa.write("1,café\n".getBytes("ISO-8859-1")); fa.close()
    val b = new java.io.File(dir, "utf_b.csv")
    val fb = new java.io.FileOutputStream(b)
    fb.write("2,naïve\n".getBytes("UTF-8")); fb.close()
    val cmd = Parser.parse(
      s"""LOAD CSV
         FROM all filenames matching ~/.*csv$$/ in directory '${dir.getAbsolutePath}'
         HAVING FIELDS (id, name)
         INTO postgresql:///graft
         TARGET TABLE accents
         DECODING TABLE NAMES MATCHING ~/latin/ AS latin1""")
    val got = PlanBuilder.build(spark, cmd)
      .orderBy(col("id")).collect().map(_.getString(1)).toSeq
    // the latin file decodes as latin1, the sibling stays UTF-8
    assert(got == Seq("café", "naïve"), s"bad per-file decode: $got")
  }
}
