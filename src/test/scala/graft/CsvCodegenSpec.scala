package graft

import java.nio.file.Files

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.LogEvent
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.CsvParseLine
import graft.sources.{CsvDialect, CsvSource}

/** Regression suite for the round-9 finding: [[CsvParseLine]] introduces
  * NULL (malformed row → reject) even when its child is non-nullable, so
  * it must declare `nullable = true` itself. With the inherited
  * nullability, a non-nullable child (textFile value after an isnotnull
  * constraint — the shape of EVERY CsvSource read) bound `ev.isNull` to
  * the `false` literal, the generated `isNull = true` assignment failed
  * Janino compilation ("not an rvalue", 325 times per test run), and the
  * CSV hot path silently fell back to interpreted eval. Worse,
  * NullPropagation was entitled to fold `csv_parse_line(x) IS NULL` to
  * `false` on the declared-non-nullable expression, which would have
  * silently emptied the parse-reject path. */
class CsvCodegenSpec extends SparkSpec {

  private val dialect = CsvDialect()

  test("codegen compiles with a NON-nullable child and yields NULL " +
    "for a malformed row") {
    // GenerateUnsafeProjection.generate compiles directly — no
    // interpreted fallback — so a Janino failure throws here.
    val expr = CsvParseLine(
      BoundReference(0, StringType, nullable = false), dialect)
    assert(expr.nullable, "CsvParseLine must declare nullable=true: it " +
      "returns NULL for malformed rows regardless of child nullability")
    val proj = GenerateUnsafeProjection.generate(Seq(expr))

    val good = proj(InternalRow(UTF8String.fromString("a,\"b,c\",d")))
    assert(!good.isNullAt(0))
    assert(good.getArray(0).toSeq[UTF8String](StringType)
      .map(_.toString) == Seq("a", "b,c", "d"))

    // stray quote in an unquoted field → parse error → SQL NULL
    val bad = proj(InternalRow(UTF8String.fromString("a,mid\"quote,b")))
    assert(bad.isNullAt(0),
      "malformed row must surface as SQL NULL through GENERATED code")
  }

  test("codegen compiles with a nullable child; NULL input stays NULL") {
    val expr = CsvParseLine(
      BoundReference(0, StringType, nullable = true), dialect)
    val proj = GenerateUnsafeProjection.generate(Seq(expr))
    assert(proj(InternalRow(null)).isNullAt(0))
    val good = proj(InternalRow(UTF8String.fromString("x,y")))
    assert(good.getArray(0).toSeq[UTF8String](StringType)
      .map(_.toString) == Seq("x", "y"))
  }

  /** Captures ERROR events from Spark's codegen compiler logger. */
  private class CodegenErrorCapture
      extends AbstractAppender("graft-codegen-capture", null, null,
        false, org.apache.logging.log4j.core.config.Property.EMPTY_ARRAY) {
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    override def append(e: LogEvent): Unit =
      if (e.getLevel.isMoreSpecificThan(Level.ERROR))
        errors.add(e.getMessage.getFormattedMessage)
  }

  test("full read + reject path over a non-nullable child runs with " +
    "ZERO CodeGenerator errors, and rejects still land") {
    val dir = Files.createTempDirectory("csv-codegen").toFile
    dir.deleteOnExit()
    val f = new java.io.File(dir, "rows.csv")
    f.deleteOnExit()
    // 2 malformed rows (stray quote / unterminated quote) among 4 good
    Files.write(f.toPath, java.util.Arrays.asList(
      "1,alpha", "2,mid\"quote", "3,beta", "4,\"unclosed",
      "5,gamma", "6,delta"))

    val capture = new CodegenErrorCapture
    capture.start()
    val logger = LogManager.getLogger(
      "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator")
      .asInstanceOf[org.apache.logging.log4j.core.Logger]
    logger.addAppender(capture)
    try {
      val rows = CsvSource.read(spark, f.getPath, dialect,
        Seq("id", "name")).collect()
      // the unterminated quote on row 4 absorbs the following lines
      // into ONE (rejected) record — record stitching, exactly what
      // the reference's reader does with a stray opening quote
      assert(rows.map(_.getString(0)).sorted.toSeq == Seq("1", "3"))

      // the NullPropagation hazard: the reject filter is
      // `__fields IS NULL` over the same non-nullable-child plan — a
      // mis-declared non-nullable expression lets the optimizer fold it
      // to false and silently lose every parse reject
      val rejects = CsvSource.rejects(spark, f.getPath, dialect).collect()
      assert(rejects.map(_.getString(0)).sorted.toSeq ==
        Seq("2,mid\"quote", "4,\"unclosed\n5,gamma\n6,delta"))
    } finally {
      logger.removeAppender(capture)
      capture.stop()
    }
    assert(capture.errors.isEmpty,
      "CSV parse must stay codegen'd (no Janino fallback); got:\n" +
        capture.errors.toArray.mkString("\n"))
  }
}
