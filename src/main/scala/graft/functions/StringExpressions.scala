package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graft.{FunctionInstaller => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native expression for PG COPY TEXT unescaping — one pass over the
  * string implementing the full input escape set (control chars, `\\`,
  * `\xH[H]` hex, octal, literal `\N`), delegating to the property-tested
  * scalar spec [[graft.sources.CopyText.unescape]]. Replaces the previous
  * 8-chained-`replace` Column formulation, which couldn't express the
  * variable-length hex/octal escapes at all. */
case class CopyUnescape(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got " +
        child.dataType.simpleString)
  override def dataType: DataType = child.dataType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "copy_unescape"

  protected override def nullSafeEval(input: Any): Any =
    StringExpressions.copyUnescapeFast(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.StringExpressions.copyUnescapeFast($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** Native expression for PG COPY TEXT escaping — one byte-level pass,
  * returning the input UNCHANGED (zero allocation) when no escapable
  * byte occurs, which is the overwhelmingly common case. Replaces the
  * 7-chained-`replace` Column formulation, which re-scanned and
  * re-allocated every field seven times (profiled as the single
  * hottest sink-side cost: `UTF8String.find` from `StringReplace`).
  * Byte-level is correct because all seven escapable characters are
  * ASCII and UTF-8 continuation bytes are ≥ 0x80, so multi-byte
  * sequences can never alias them. Semantics equal the property-tested
  * scalar spec [[graft.sources.CopyText.escape]] (CopyTextProps pins
  * the equivalence). */
case class CopyEscape(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got " +
        child.dataType.simpleString)
  override def dataType: DataType = child.dataType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "copy_escape"

  protected override def nullSafeEval(input: Any): Any =
    StringExpressions.copyEscapeBytes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.StringExpressions.copyEscapeBytes($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** Native expression for the reference-exact CSV field parser: one line →
  * array<string> of field values (null element = SQL NULL), delegating to
  * the scalar spec [[graft.sources.CsvSource.parseFields]]. Replaces the
  * univocity-backed reader, whose trim semantics classify control bytes
  * (< 0x21) as whitespace — the reference trims space/TAB only — and
  * whose quoted/unquoted NULL distinction needed sentinel values. The
  * dialect rides along as a plan-serialized reference object. */
case class CsvParseLine(child: Expression,
                        dialect: graft.sources.CsvDialect)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got " +
        child.dataType.simpleString)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = true)
  override def nullIntolerant: Boolean = true
  // Introduces NULL on malformed rows even for a non-nullable child, so
  // nullability must NOT be inherited: with the default
  // `nullable = child.nullable`, a non-nullable child (textFile value,
  // post-isnotnull) makes nullSafeCodeGen bind ev.isNull to the `false`
  // literal — the assignment below then fails Janino compilation
  // ("not an rvalue") and the whole CSV hot path silently runs
  // interpreted — and entitles NullPropagation to fold
  // `csv_parse_line(x) IS NULL` to false, emptying the reject path.
  override def nullable: Boolean = true
  override def prettyName: String = "csv_parse_line"

  protected override def nullSafeEval(input: Any): Any =
    graft.sources.CsvSource.parseFieldsData(
      input.asInstanceOf[UTF8String], dialect)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("csvDialect", dialect,
      "graft.sources.CsvDialect")
    // not defineCodeGen: parseFieldsData returns null for a malformed
    // row, which must surface as SQL NULL (rejected row), not a null
    // ArrayData with isNull = false
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.sources.CsvSource.parseFieldsData($c, $ref);
       |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** Native expression for Unicode normalization (NFC/NFD/NFKC/NFKD) — the
  * text-curation step that folds combining sequences ("e" + U+0301) into
  * their canonical forms before hashing, dedup, or tokenization; without
  * it, byte-distinct spellings of identical text defeat every
  * exact-match operator. Delegates to `java.text.Normalizer` with an
  * `isNormalized` fast path: for already-normal text (virtually all of a
  * real corpus) the input UTF8String is returned as-is, no allocation.
  * Codegen keeps the hot path inside whole-stage codegen. */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  @transient private lazy val normForm: java.text.Normalizer.Form =
    java.text.Normalizer.Form.valueOf(form.toUpperCase(java.util.Locale.ROOT))

  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got " +
          child.dataType.simpleString)
    else if (!Set("NFC", "NFD", "NFKC", "NFKD")
        .contains(form.toUpperCase(java.util.Locale.ROOT)))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName form must be one of NFC/NFD/NFKC/NFKD, got $form")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = child.dataType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unicode_normalize"

  protected override def nullSafeEval(input: Any): Any =
    StringExpressions.unicodeNormalize(
      input.asInstanceOf[UTF8String], normForm)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("normForm", normForm,
      "java.text.Normalizer.Form")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.StringExpressions.unicodeNormalize($c, $ref)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** Native expression applying a learned BPE merge table to a text
  * column: lowercase, split on the [[graft.pipeline.Terms]] separator
  * class, encode each word by repeatedly merging its lowest-rank
  * adjacent pair ([[graft.pipeline.Bpe.encodeWord]] is the scalar
  * spec), emit one flat token array — the whole tokenize in a single
  * compiled pass with the merge ranks riding as a plan-serialized
  * reference object (broadcast with the plan, no shuffle, no per-row
  * driver involvement). */
case class BpeEncode(child: Expression,
                     merges: Seq[(String, String)])
    extends UnaryExpression {

  @transient private lazy val rank: Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got " +
        child.dataType.simpleString)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_encode"

  protected override def nullSafeEval(input: Any): Any =
    StringExpressions.bpeEncodeText(input.asInstanceOf[UTF8String], rank)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeRanks", rank,
      "scala.collection.immutable.Map")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.StringExpressions.bpeEncodeText($c, $ref)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object StringExpressions {
  def copyUnescape(c: Column): Column =
    ExpressionUtils.column(CopyUnescape(ExpressionUtils.expression(c)))

  def copyEscape(c: Column): Column =
    ExpressionUtils.column(CopyEscape(ExpressionUtils.expression(c)))

  /** [[CopyUnescape]]'s runtime: a field with no backslash byte (the
    * overwhelmingly common case) is returned unchanged — zero
    * allocation, no decode; only fields that actually carry an escape
    * pay the String-based spec ([[graft.sources.CopyText.unescape]],
    * which owns the full hex/octal/control grammar). A backslash is
    * ASCII, so the byte scan cannot false-negative on multi-byte
    * UTF-8. */
  def copyUnescapeFast(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      if (s.getByte(i) == 0x5C) // '\'
        return UTF8String.fromString(
          graft.sources.CopyText.unescape(s.toString))
      i += 1
    }
    s
  }

  /** One-pass COPY TEXT escape over UTF-8 bytes (called from codegen
    * and eval). Returns the INPUT object itself when nothing needs
    * escaping — no copy, no allocation. */
  def copyEscapeBytes(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var extra = 0
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      // \\ 0x5C, \b 0x08, \t 0x09, \n 0x0A, \v 0x0B, \f 0x0C, \r 0x0D
      if (b == 0x5C || (b >= 0x08 && b <= 0x0D)) extra += 1
      i += 1
    }
    if (extra == 0) return s
    val out = new Array[Byte](n + extra)
    var o = 0
    i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b == 0x5C) { out(o) = '\\'; out(o + 1) = '\\'; o += 2 }
      else if (b >= 0x08 && b <= 0x0D) {
        out(o) = '\\'
        out(o + 1) = (b: @annotation.switch) match {
          case 0x08 => 'b'
          case 0x09 => 't'
          case 0x0A => 'n'
          case 0x0B => 'v'
          case 0x0C => 'f'
          case _    => 'r'
        }
        o += 2
      } else { out(o) = b; o += 1 }
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  // compiled ONCE: String.split only fast-paths single-char patterns,
  // so splitting by the multi-char separator class per ROW would pay a
  // Pattern.compile on the expression's documented hot path
  private val SeparatorPattern =
    java.util.regex.Pattern.compile(graft.pipeline.Terms.SeparatorClass)

  /** Scalar spec for [[BpeEncode]] (called from codegen). */
  def bpeEncodeText(s: UTF8String,
                    rank: Map[(String, String), Int])
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val words = SeparatorPattern.split(
      s.toString.toLowerCase(java.util.Locale.ROOT))
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty)
        graft.pipeline.Bpe.encodeWord(words(i), rank)
          .foreach(t => out += UTF8String.fromString(t))
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out.toArray)
  }

  def bpeEncode(c: Column, merges: Seq[(String, String)]): Column =
    ExpressionUtils.column(BpeEncode(ExpressionUtils.expression(c), merges))

  /** Scalar spec for [[UnicodeNormalize]] (called from codegen): returns
    * the INPUT object untouched when already in `form` — the dominant
    * case — so the hot path is one table-driven quick-check pass. */
  def unicodeNormalize(s: UTF8String,
                       form: java.text.Normalizer.Form): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, form))
  }

  def unicodeNormalize(c: Column, form: String): Column =
    ExpressionUtils.column(
      UnicodeNormalize(ExpressionUtils.expression(c), form))

  def csvParseLine(c: Column, dialect: graft.sources.CsvDialect): Column =
    ExpressionUtils.column(CsvParseLine(ExpressionUtils.expression(c),
      dialect))
}
