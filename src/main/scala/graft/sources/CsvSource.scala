package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** CSV dialect — separator / quote / escape-mode / skip lines
  * (src/sources/csv/csv.lisp:84-127). `escapeQuoting` distinguishes the
  * doubled-quote RFC mode (`""`) from backslash mode (`\"`)
  * (csv-guess.lisp:40-55).
  */
final case class CsvDialect(
    separator: Char = ',',
    quote: Char = '"',
    doubledQuote: Boolean = true, // true: "" escapes; false: \" escapes
    skipLines: Int = 0,
    header: Boolean = false,
    encoding: String = "UTF-8",
    nullValue: String = "",
    /** `trim unquoted blanks`: whitespace around UNQUOTED values is
      * trimmed (then empty → NULL); quoted blanks survive — the
      * reference's unquoted-empty-string-is-nil semantics
      * (csv.lisp:77-78). */
    trimUnquoted: Boolean = false)

object CsvSource {

  /** Normalize common encoding aliases to canonical charset names
    * (Spark's CSV reader whitelists canonical names only; the reference
    * normalizes aliases the same way, dbf.clj charset-aliases). */
  def canonicalEncoding(name: String): String =
    name.toLowerCase.replace("_", "-") match {
      case "latin1" | "latin-1" => "iso-8859-1"
      case "latin2" | "latin-2" => "iso-8859-2"
      case "latin9" | "latin-9" => "iso-8859-15"
      case "utf8" => "utf-8"
      case "utf16" => "utf-16"
      case "ascii" => "us-ascii"
      case "cp950" => "Big5"
      case "cp932" => "windows-31j"
      case other => other
    }

  /** Read a CSV with an explicit dialect into an all-string DataFrame —
    * fidelity mode: types are applied later by the cast layer, never by the
    * reader (SURVEY §1.2: transforms run on strings).
    *
    * `skipLines`/`header` are PER-FILE head-line drops (csv.lisp:84-127
    * semantics): implemented via [[SkipLines.lines]] — Spark's CSV reader
    * has no preamble-skip option, and monotonically_increasing_id tricks
    * are wrong for multi-file/multi-split reads. */
  def read(spark: SparkSession, path: String, dialect: CsvDialect,
           fieldNames: Seq[String]): DataFrame = {
    val schema = StructType(
      fieldNames.map(n => StructField(n, StringType, nullable = true)))
    val base = spark.read
      .option("sep", dialect.separator.toString)
      .option("quote", dialect.quote.toString)
      .option("escape",
        if (dialect.doubledQuote) dialect.quote.toString else "\\")
      .option("encoding", canonicalEncoding(dialect.encoding))
      // unquoted empty → NULL, quoted "" → empty string (csv.lisp:77-78
      // :unquoted-empty-string-is-nil t :quoted-empty-string-is-nil nil).
      // univocity reports a missing/unquoted-empty field as the parser
      // nullValue; a NUL sentinel keeps that mapping without also
      // swallowing quoted empties.
      .option("nullValue",
        if (dialect.nullValue.isEmpty) "\u0000" else dialect.nullValue)
      .option("emptyValue", "") // quoted "" stays an empty string
      // univocity trims UNQUOTED whitespace only — exactly the
      // reference's trim-unquoted-blanks distinction
      .option("ignoreLeadingWhiteSpace", dialect.trimUnquoted.toString)
      .option("ignoreTrailingWhiteSpace", dialect.trimUnquoted.toString)
      .option("mode", "PERMISSIVE")
      .schema(schema)
    // a header line is just one more per-file line to drop — field names
    // come from the declared schema, matching the reference's HAVING FIELDS
    val skip = dialect.skipLines + (if (dialect.header) 1 else 0)
    if (skip == 0) base.csv(path.split(","): _*)
    else {
      import spark.implicits._
      base.csv(SkipLines.lines(spark, path, skip).as[String])
    }
  }

  /** Tiny driver-side CSV line parser used only by the guesser. Returns
    * None on unbalanced quotes. */
  private[graft] def parseLine(line: String, sep: Char, quote: Char,
                               doubled: Boolean): Option[Int] = {
    var i = 0
    var fields = 1
    var inQuote = false
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQuote) {
        if (c == '\\' && !doubled && i + 1 < line.length) i += 1
        else if (c == quote) {
          if (doubled && i + 1 < line.length && line.charAt(i + 1) == quote)
            i += 1
          else inQuote = false
        }
      } else {
        if (c == quote) inQuote = true
        else if (c == sep) fields += 1
      }
      i += 1
    }
    if (inQuote) None else Some(fields)
  }

  private val separators = Seq('\t', ',', ';', '|', '%', '^', '!', '$')

  /** Guess separator + escape mode from a sample: try each candidate until
    * every sampled row parses to the same column count (>= `nbCols` when
    * known) — csv-guess.lisp:40-77. */
  def guessDialect(sample: Seq[String], nbCols: Option[Int] = None,
                   quote: Char = '"'): Option[CsvDialect] = {
    val lines = sample.filter(_.nonEmpty)
    if (lines.isEmpty) return None
    val candidates = for {
      doubled <- Seq(true, false)
      sep <- separators
    } yield (sep, doubled)
    candidates.collectFirst {
      case (sep, doubled)
        if consistent(lines, sep, quote, doubled, nbCols) =>
        CsvDialect(separator = sep, quote = quote, doubledQuote = doubled)
    }
  }

  private def consistent(lines: Seq[String], sep: Char, quote: Char,
                         doubled: Boolean, nbCols: Option[Int]): Boolean = {
    val counts = lines.map(parseLine(_, sep, quote, doubled))
    counts.forall(_.nonEmpty) && {
      val cs = counts.flatten.distinct
      cs.size == 1 && cs.head > 1 && nbCols.forall(cs.head == _)
    }
  }

  /** Driver-side sample for guessing (first `n` lines of the file). */
  def sample(spark: SparkSession, path: String, n: Int = 1000): Seq[String] =
    spark.read.textFile(path.split(","): _*).limit(n).collect().toSeq
}

/** Fixed-width source (src/sources/fixed/fixed.lisp:51-78): substring
  * extraction per `(name, start, length)`; ragged right lines give NULL for
  * the missing tail fields.
  */
object FixedWidth {
  final case class FieldPos(name: String, start: Int, length: Int)

  def read(spark: SparkSession, path: String, specs: Seq[FieldPos],
           skipLines: Int = 0): DataFrame = {
    val text =
      if (skipLines > 0) SkipLines.lines(spark, path, skipLines)
        .toDF("__line")
      else spark.read.textFile(path.split(","): _*).toDF("__line")
    project(text, "__line", specs).drop("__line")
  }

  /** Columnize an existing single-string column (used by both the file
    * reader and tests). */
  def project(df: DataFrame, lineCol: String,
              specs: Seq[FieldPos]): DataFrame = {
    import org.apache.spark.sql.functions._
    val line = col(lineCol)
    specs.foldLeft(df) { (d, s) =>
      // substring is 1-based; ragged lines → empty substring → NULL
      val raw = substring(line, s.start + 1, s.length)
      d.withColumn(s.name,
        when(length(line) <= s.start, lit(null: String)).otherwise(raw))
    }
  }

  /** Infer column boundaries from a header line's whitespace runs
    * (src/sources/fixed/fixed-guess.lisp:29-74). */
  def guessSpecs(header: String): Seq[FieldPos] = {
    val boundaries = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var i = 0
    while (i < header.length) {
      if (!header.charAt(i).isWhitespace) {
        val start = i
        while (i < header.length && !header.charAt(i).isWhitespace) i += 1
        boundaries += ((start, i))
      } else i += 1
    }
    // column extends to the start of the next header token
    boundaries.zipWithIndex.map { case ((s, _), idx) =>
      val end =
        if (idx + 1 < boundaries.length) boundaries(idx + 1)._1
        else Int.MaxValue / 2
      FieldPos(header.substring(s,
        math.min(boundaries(idx)._2, header.length)).trim, s, end - s)
    }.toSeq
  }
}
