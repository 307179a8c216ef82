package graft

import graft.sources.{CsvDialect, CsvSource}

class CsvParseFieldsSpec extends SparkSpec {

  private val trimD = CsvDialect(trimUnquoted = true)
  private val keepD = CsvDialect(trimUnquoted = false)

  private def p(line: String, d: CsvDialect) = CsvSource.parseFields(line, d)

  test("quoted vs unquoted empties: NULL only when unquoted") {
    assert(p("""a,"",b""", keepD).toSeq == Seq("a", "", "b"))
    assert(p("a,,b", keepD).toSeq == Seq("a", null, "b"))
    assert(p("a,b,", keepD).toSeq == Seq("a", "b", null))
  }

  test("trim mode: space/TAB trimmed, control bytes are data") {
    assert(p("a, b ,c", trimD).toSeq == Seq("a", "b", "c"))
    assert(p("a, \u0005b ,c", trimD).toSeq == Seq("a", "\u0005b", "c"))
    assert(p("a,   ,c", trimD).toSeq == Seq("a", null, "c"))
    // keep mode: blanks survive
    assert(p("a, b ,c", keepD).toSeq == Seq("a", " b ", "c"))
  }

  test("trim mode recognizes a quote after leading blanks") {
    assert(p("""a, "b,c" ,d""", trimD).toSeq == Seq("a", "b,c", "d"))
    // keep mode: the quote is data (field starts with a blank)
    assert(p("""a, "b" """, keepD).toSeq == Seq("a", " \"b\" "))
  }

  test("doubled-quote and backslash escape modes") {
    assert(p("""a,"x""y",b""", keepD).toSeq == Seq("a", "x\"y", "b"))
    val esc = keepD.copy(doubledQuote = false)
    assert(p("""a,"x\"y",b""", esc).toSeq == Seq("a", "x\"y", "b"))
  }

  test("NUL quote disables quoting entirely") {
    val noq = keepD.copy(quote = '\u0000')
    assert(p("""a,"b",c""", noq).toSeq == Seq("a", "\"b\"", "c"))
  }

  test("TAB separator: TAB is never a trimmable blank") {
    val tab = CsvDialect(separator = '\t', trimUnquoted = true)
    assert(p("a\t b \tc", tab).toSeq == Seq("a", "b", "c"))
    assert(p("a\t\tc", tab).toSeq == Seq("a", null, "c"))
  }

  test("custom null marker matches unquoted post-trim values") {
    val d = trimD.copy(nullValue = "NA")
    assert(p("a, NA ,b", d).toSeq == Seq("a", null, "b"))
    assert(p("""a,"NA",b""", d).toSeq == Seq("a", "NA", "b"))
  }

  test("unbalanced quote is lenient: rest of line is the value") {
    assert(p("""a,"unclosed value""", keepD).toSeq ==
      Seq("a", "unclosed value"))
  }

  test("column expression path matches the scalar spec") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val lines = Seq("""a, "b,c" ,d""", "x,,z", "1,\u00052,3")
    val got = lines.toDF("value")
      .select(graft.functions.StringExpressions
        .csvParseLine(col("value"), trimD).as("f"))
      .collect().map(_.getSeq[String](0).toSeq)
    assert(got.toSeq == lines.map(l => p(l, trimD).toSeq))
  }
}
