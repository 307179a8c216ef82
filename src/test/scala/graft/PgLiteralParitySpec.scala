package graft

import java.time.{Instant, LocalDateTime}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.sinks.PgLiteral
import graft.sources.CopyText

/** [[PgLiteral]] (scalar, pinned UTC) is the executable SPEC for
  * [[CopyText.pgLiteralColumn]] (codegen, what the sink actually runs).
  * This suite holds the two equal — including under a non-UTC session
  * time zone, where a naive `date_format` would shift instants
  * (ADVICE: the renderings must not drift). */
class PgLiteralParitySpec extends SparkSpec {

  private def columnRender(dt: DataType, values: Seq[Any]): Seq[String] = {
    val schema = StructType(Seq(StructField("v", dt)))
    val rows = values.map(v => Row(v))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)
    df.select(CopyText.pgLiteralColumn(
        org.apache.spark.sql.functions.col("v"), dt).as("s"))
      .collect().map(_.getString(0)).toSeq
  }

  private def scalarRender(dt: DataType, values: Seq[Any]): Seq[String] = {
    val f = PgLiteral.formatter(dt)
    values.map(f)
  }

  private def assertParity(dt: DataType, values: Seq[Any]): Unit =
    assert(columnRender(dt, values) == scalarRender(dt, values),
      s"codegen vs scalar drift for $dt")

  private val instants = Seq(
    Instant.parse("2004-10-02T15:29:52Z"),
    Instant.parse("2004-10-02T15:29:52.500000Z"),
    Instant.parse("1999-12-31T23:59:59.000001Z"),
    Instant.parse("2024-02-29T00:00:00Z"),
    // UTC wall clock 07:30 lands inside America/New_York's 2024 DST
    // spring-forward gap (02:00–03:00 local on Mar 10) — a renderer that
    // round-trips through the session zone's local calendar resolves it
    // an hour off
    Instant.parse("2024-03-10T07:30:00Z"),
    // and one inside the fall-back overlap (01:30 local occurs twice)
    Instant.parse("2024-11-03T05:30:00Z"),
    // pre-epoch: negative unix_micros with a fractional second
    Instant.parse("1969-12-31T23:59:59.250000Z"))

  test("timestamps render the UTC instant under any session time zone") {
    // half-hour and DST zones — exactly where date_format alone shifts
    for (tz <- Seq("UTC", "America/New_York", "Asia/Kolkata",
        "Australia/Eucla")) {
      val prev = spark.conf.get("spark.sql.session.timeZone")
      spark.conf.set("spark.sql.session.timeZone", tz)
      try assertParity(TimestampType, instants.map(java.sql.Timestamp.from))
      finally spark.conf.set("spark.sql.session.timeZone", prev)
    }
  }

  test("timestamp-ntz wall clocks are session-TZ independent") {
    val locals = Seq(
      LocalDateTime.parse("2004-10-02T15:29:52"),
      LocalDateTime.parse("2004-10-02T15:29:52.500"),
      LocalDateTime.parse("1999-12-31T23:59:59.000001"))
    for (tz <- Seq("UTC", "America/New_York", "Australia/Eucla")) {
      val prev = spark.conf.get("spark.sql.session.timeZone")
      spark.conf.set("spark.sql.session.timeZone", tz)
      try assertParity(TimestampNTZType, locals)
      finally spark.conf.set("spark.sql.session.timeZone", prev)
    }
  }

  test("binary, boolean, decimal, double, date match the scalar spec") {
    assertParity(BinaryType, Seq(Array[Byte](0, 1, -1, 127),
      Array[Byte](), "abc".getBytes("UTF-8")))
    assertParity(BooleanType, Seq(true, false))
    assertParity(DecimalType(12, 4), Seq(
      new java.math.BigDecimal("1234.5000"),
      new java.math.BigDecimal("-0.0001")))
    assertParity(DoubleType, Seq(1.5d, -0.0d,
      Double.PositiveInfinity, Double.NegativeInfinity))
    assertParity(DateType, Seq(java.sql.Date.valueOf("2004-10-02"),
      java.sql.Date.valueOf("1970-01-01")))
  }
}
