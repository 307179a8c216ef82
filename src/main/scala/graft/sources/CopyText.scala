package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** PostgreSQL COPY TEXT format — both a first-class source (`LOAD COPY`,
  * src/parsers/command-copy.lisp:1-173) and the sink wire format
  * (src/pg-copy/copy-format.lisp:43-193). Also used to read the golden
  * regression files (src/regress/regress.lisp:81-112).
  *
  * Escapes: `\N` = NULL, and `\\ \b \f \n \r \t \v` inside values
  * (copy-format.lisp:123-193). A raw TAB byte only ever separates fields —
  * data tabs are escaped — so a line splits safely on TAB.
  */
object CopyText {

  /** Escape one value for COPY TEXT (copy-format.lisp:123-193). */
  def escape(v: String): String = {
    val sb = new StringBuilder(v.length + 8)
    var i = 0
    while (i < v.length) {
      v.charAt(i) match {
        case '\\' => sb.append("\\\\")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case 0x0B => sb.append("\\v")
        case c    => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Inverse of [[escape]]. */
  def unescape(v: String): String = {
    val sb = new StringBuilder(v.length)
    var i = 0
    while (i < v.length) {
      val c = v.charAt(i)
      if (c == '\\' && i + 1 < v.length) {
        v.charAt(i + 1) match {
          case '\\' => sb.append('\\')
          case 'b'  => sb.append('\b')
          case 'f'  => sb.append('\f')
          case 'n'  => sb.append('\n')
          case 'r'  => sb.append('\r')
          case 't'  => sb.append('\t')
          case 'v'  => sb.append(0x0B.toChar)
          case 'N'  => sb.append('\\').append('N') // handled at field level
          case o    => sb.append(o)
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** One row of string-or-null values → one COPY TEXT line (no newline).
    * This is `format-vector-row` (copy-format.lisp:43-98). */
  def formatRow(values: Array[String], delimiter: Char = '\t',
                nullAs: String = "\\N"): String =
    values.map(v => if (v == null) nullAs else escape(v))
      .mkString(delimiter.toString)

  /** One COPY TEXT line → values (null for `\N`). */
  def parseLine(line: String, delimiter: Char = '\t',
                nullAs: String = "\\N"): Array[String] = {
    // raw delimiter bytes are always separators (data ones are escaped)
    val parts = splitKeepAll(line, delimiter)
    parts.map(p => if (p == nullAs) null else unescape(p))
  }

  private def splitKeepAll(s: String, sep: Char): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == sep) { out += s.substring(start, i); start = i + 1 }
      i += 1
    }
    out += s.substring(start)
    out.toArray
  }

  /** Distributed read of a COPY TEXT file → all-string DataFrame. The parse
    * runs per-partition on executors; the text source splits large files by
    * line, so this scales with input size. */
  def read(spark: SparkSession, path: String, fieldNames: Seq[String],
           delimiter: Char = '\t', nullAs: String = "\\N"): DataFrame = {
    val schema = StructType(
      fieldNames.map(n => StructField(n, StringType, nullable = true)))
    val n = fieldNames.size
    val rows = spark.read.textFile(path).rdd.map { line =>
      val vs = parseLine(line, delimiter, nullAs)
      Row.fromSeq((0 until n).map(i => if (i < vs.length) vs(i) else null))
    }
    spark.createDataFrame(rows, schema)
  }

  /** Distributed write: every task writes its partition as COPY TEXT part
    * files under `dir` (the reject-file / golden-file format). Values are
    * rendered as PG text literals via the type-dispatched formatters
    * (bytea `\x…`, boolean t/f, timestamps without zone suffix). */
  def write(df: DataFrame, dir: String, delimiter: Char = '\t'): Unit = {
    val n = df.columns.length
    val fmts = graft.sinks.PgLiteral.formatters(df.schema)
    val line = df.rdd.map { row =>
      formatRow(Array.tabulate(n)(i =>
        if (row.isNullAt(i)) null else fmts(i)(row.get(i))), delimiter)
    }
    line.saveAsTextFile(dir)
  }
}
