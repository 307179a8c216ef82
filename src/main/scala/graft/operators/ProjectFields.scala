package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Field→column projection — the reference's `project-fields` stage
  * (src/sources/common/project-fields.lisp:35-183): reorder / subset /
  * duplicate source fields, per-field null-if / trim / date-format
  * preprocessing, per-column `USING` expressions (row-level, may reference
  * several fields), and constant columns.
  *
  * Spark realization: one `df.select(...)` built from `Column` expressions,
  * so the whole stage is a single codegen'd Project that Catalyst can merge
  * with the scan (column pruning reaches the source).
  */
object ProjectFields {

  /** Column reference by literal name — backtick-quoted so names with
    * periods (test/fields-with-periods.load) don't parse as struct
    * paths. */
  def qcol(name: String): Column =
    col("`" + name.replace("`", "``") + "`")

  sealed trait TrimMode
  object TrimMode {
    case object None extends TrimMode
    case object Left extends TrimMode
    case object Right extends TrimMode
    case object Both extends TrimMode
  }

  /** Per-field `[null if …]` spec; several specs are OR'd
    * (project-fields.lisp:47-66). */
  sealed trait NullIf
  object NullIf {
    /** `[null if blanks]` — all-whitespace value → NULL. */
    case object Blanks extends NullIf
    /** `[null if 'literal']`. */
    final case class Value(v: String) extends NullIf
  }

  /** Declared source field with its preprocessing options
    * (grammar.clj:157-182). */
  final case class FieldSpec(
      name: String,
      nullIfs: Seq[NullIf] = Nil,
      trim: TrimMode = TrimMode.None,
      /** PG to_char-style format, e.g. `DD/MM/YYYY HH24:MI:SS.US`
        * (src/parsers/date-format.lisp:13-145). */
      dateFormat: Option[String] = None,
      /** Render the parsed value as a TIME-OF-DAY string (target column
        * is a PG time type) — a full timestamp string would fail the
        * server's time parser. Also inferred when the format itself has
        * no date tokens. */
      timeOnly: Boolean = false)

  /** Target column (TARGET COLUMNS clause). Exactly one of the value
    * sources applies; default is the same-named preprocessed field. */
  final case class TargetColumn(
      name: String,
      /** `USING` expression — Spark SQL text over ALL fields (the
        * reference compiles a row-level lambda,
        * project-fields.lisp:144-183). */
      usingExpr: Option[String] = None,
      /** Named transform from [[graft.functions.Transforms.registry]]
        * applied to the same-named field. */
      transform: Option[Column => Column] = None,
      /** Constant string column. */
      constant: Option[String] = None,
      /** Field to read when the column name differs from the field name. */
      fromField: Option[String] = None)

  /** Preprocess one raw field column: null-if specs OR'd, then trim, then
    * date-format parse (order matches project-fields.lisp:91-119). */
  def prepareField(raw: Column, spec: FieldSpec): Column = {
    val nulled = spec.nullIfs.foldLeft(raw) { (c, ni) =>
      ni match {
        case NullIf.Blanks   => when(trim(c) === "", lit(null: String)).otherwise(c)
        case NullIf.Value(v) => when(c === v, lit(null: String)).otherwise(c)
      }
    }
    val trimmed = spec.trim match {
      case TrimMode.None  => nulled
      case TrimMode.Left  => ltrim(nulled)
      case TrimMode.Right => rtrim(nulled)
      case TrimMode.Both  => trim(nulled)
    }
    spec.dateFormat match {
      case Some(fmt) =>
        // try_to_timestamp: a malformed value becomes NULL and flows to
        // the reject/preflight layer — plain to_timestamp THROWS under
        // ANSI mode on the first bad row and aborts the whole load,
        // the failure mode the Validate layer exists to prevent (same
        // precedent as Validate's try_cast)
        val pat = DateFormat.translate(fmt)
        val ts = try_to_timestamp(trimmed, lit(pat))
        // a time-typed target (or a format with no date tokens at all,
        // e.g. `HH24:MI.SS`) must render time-of-day — a full
        // timestamp string fails PG's time parser (live golden
        // csv-parse-date). Fractional seconds ride along only when the
        // format carries them; PG trims trailing zeros itself.
        if (spec.timeOnly || !DateFormat.hasDateTokens(pat)) {
          val out = if (pat.contains('S')) "HH:mm:ss.SSSSSS"
                    else "HH:mm:ss"
          date_format(ts, out).cast("string")
        } else ts.cast("string")
      case None => trimmed
    }
  }

  /** Apply the whole projection: `df` columns are the raw source fields. */
  def apply(df: DataFrame, fields: Seq[FieldSpec],
            targets: Seq[TargetColumn]): DataFrame = {
    // Preprocessed view of every field, available to USING expressions.
    val prepared = fields.foldLeft(df) { (d, f) =>
      d.withColumn(f.name, prepareField(qcol(f.name), f))
    }
    // case-INSENSITIVE membership, like Spark's own column resolution
    // (an uppercase DBF header field must still satisfy a lowercase
    // target column — only a truly ABSENT name injects NULL)
    val have = prepared.columns.map(_.toLowerCase).toSet
    val outCols = targets.map { t =>
      val value: Column = (t.constant, t.usingExpr, t.transform) match {
        case (Some(k), _, _) => lit(k)
        case (_, Some(e), _) => expr(e)
        case (_, _, Some(fn)) => fn(qcol(t.fromField.getOrElse(t.name)))
        case _ =>
          val nm = t.fromField.getOrElse(t.name)
          // v4 column injection: a target column that names no source
          // field loads as NULL (tests/csv/constant — TARGET TABLE
          // t (b,c,d) with no field c; csv.clj:383 projects a nil
          // source index, copy.clj renders it \N)
          if (have.contains(nm.toLowerCase)) qcol(nm)
          else lit(null).cast("string")
      }
      value.as(t.name)
    }
    prepared.select(outCols: _*)
  }
}

/** PG `to_char`-token date formats → Spark/java.time patterns.
  * Token set per the reference's parser (src/parsers/date-format.lisp:13-145;
  * v4 translation clojure/src/pgloader/source/csv.clj:118-170).
  */
object DateFormat {

  /** Does a TRANSLATED Java pattern reference any date field (year,
    * month, day) outside quoted literal runs? Time-only formats parse
    * to 1970-01-01 and must render as time-of-day. */
  def hasDateTokens(javaPattern: String): Boolean = {
    var inQuote = false
    javaPattern.exists { c =>
      if (c == '\'') { inQuote = !inQuote; false }
      else !inQuote && (c == 'y' || c == 'M' || c == 'd')
    }
  }

  // Longest-match-first token table.
  private val tokens: Seq[(String, String)] = Seq(
    "YYYY" -> "yyyy",
    "YY" -> "yy",
    "MM" -> "MM",
    "DD" -> "dd",
    "HH24" -> "HH",
    "HH12" -> "hh",
    "HH" -> "hh",
    "MI" -> "mm",
    "SS" -> "ss",
    "US" -> "SSSSSS",
    "MS" -> "SSS",
    "AM" -> "a",
    "PM" -> "a"
  )

  /** Translate a PG-style format to a Spark datetime pattern. PG
    * templates are CASE-INSENSITIVE (`dd/mm/yyyy` ≡ `DD/MM/YYYY` —
    * matched insensitively here; an exact-case match would pass the
    * lowercase spelling through, where `mm` means MINUTE to Spark),
    * `"..."` runs are literal text (emitted single-quote-escaped), and
    * any stray LETTER outside the token set is quoted too — unquoted
    * it would be a Spark pattern character with entirely different
    * meaning. Non-letter separators pass through unchanged. */
  def translate(pgFormat: String): String = {
    // Two passes: tokenize into pattern chunks vs literal text, then
    // render with CONSECUTIVE literals coalesced into ONE quoted run.
    // Emitting per-character quotes would put 'x''y' in the output for
    // adjacent stray letters, which Java datetime patterns read as the
    // literal x'y (doubled quote inside a run = escaped apostrophe),
    // not xy.
    val chunks = scala.collection.mutable.ArrayBuffer.empty[(Boolean, String)]
    def addLit(s: String): Unit = if (s.nonEmpty) {
      if (chunks.nonEmpty && chunks.last._1)
        chunks(chunks.length - 1) = (true, chunks.last._2 + s)
      else chunks += ((true, s))
    }
    var i = 0
    while (i < pgFormat.length) {
      val c = pgFormat.charAt(i)
      if (c == '"') {
        val close = pgFormat.indexOf('"', i + 1)
        val end = if (close < 0) pgFormat.length else close
        addLit(pgFormat.substring(i + 1, end))
        i = if (close < 0) end else end + 1
      } else {
        tokens.find { case (tok, _) =>
          pgFormat.regionMatches(true, i, tok, 0, tok.length) } match {
          case Some((tok, rep)) => chunks += ((false, rep)); i += tok.length
          case None =>
            if (c == '\'' || c.isLetter) addLit(c.toString)
            else chunks += ((false, c.toString))
            i += 1
        }
      }
    }
    val sb = new StringBuilder
    chunks.foreach {
      case (true, lit) =>
        sb.append('\'').append(lit.replace("'", "''")).append('\'')
      case (false, pat) => sb.append(pat)
    }
    // fractional seconds are OPTIONAL on input — PG's to_timestamp (and
    // the reference's date parser) accept `…HH24-MI-SS.US` against a
    // value with no fraction at all; Java patterns need an explicit
    // optional section for that (live golden csv-parse-date row 4)
    """\.S+""".r.replaceAllIn(sb.toString, m => "[" + m.group(0) + "]")
  }
}
