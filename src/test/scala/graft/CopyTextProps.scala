package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.sources.CopyText

/** COPY TEXT escape/format round-trip properties
  * (copy-format.lisp:123-193 semantics, incl. the `\N` vs `\\N`
  * distinction: a literal backslash-N VALUE must not read back as NULL). */
object CopyTextProps extends Properties("CopyText") {

  // strings biased toward the interesting bytes
  private val hot: Gen[Char] =
    Gen.oneOf('\\', '\t', '\n', '\r', '\b', '\f', 0x0B.toChar, 'N', 'a')
  private val anyChar: Gen[Char] = Gen.frequency(
    3 -> hot, 2 -> Gen.alphaNumChar, 1 -> Gen.asciiPrintableChar)
  private val str: Gen[String] = Gen.listOf(anyChar).map(_.mkString)
  private val value: Gen[String] =
    Gen.frequency(5 -> str, 1 -> Gen.const(null: String))

  property("unescape∘escape = id") = forAll(str) { s =>
    CopyText.unescape(CopyText.escape(s)) == s
  }

  // multi-byte UTF-8 in the mix: the native escape works on BYTES and
  // must never touch continuation bytes
  private val unicodeStr: Gen[String] = Gen.listOf(Gen.frequency(
    3 -> anyChar.map(_.toString),
    1 -> Gen.oneOf("\u00e9", "\u03a9", "\u6f22", "\ud83d\ude42", "\u00a0")))
    .map(_.mkString)

  property("native copyEscapeBytes = scalar escape spec") =
    forAll(unicodeStr) { s =>
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
      graft.functions.StringExpressions.copyEscapeBytes(u).toString ==
        CopyText.escape(s)
    }

  property("copyEscapeBytes returns the input object when clean") = Prop {
    val u = org.apache.spark.unsafe.types.UTF8String
      .fromString("no escapes héré 漢字")
    graft.functions.StringExpressions.copyEscapeBytes(u) eq u
  }

  property("parseLine∘formatRow = id (nulls preserved)") =
    forAll(Gen.nonEmptyListOf(value)) { vs =>
      val arr = vs.toArray
      val parsed = CopyText.parseLine(CopyText.formatRow(arr))
      Prop(parsed.sameElements(arr))
    }

  property("hex and octal input escapes decode to their byte") = Prop {
    CopyText.unescape("\\x1a") == "\u001a" &&
      CopyText.unescape("a\\x41b") == "aAb" &&
      CopyText.unescape("\\x4") == "\u0004" &&     // 1 hex digit
      CopyText.unescape("\\x41c") == "Ac" &&        // max 2 digits
      CopyText.unescape("\\101") == "A" &&          // octal
      CopyText.unescape("\\7") == "\u0007" &&
      CopyText.unescape("\\1018") == "A8" &&        // max 3 digits
      CopyText.unescape("\\xzz") == "xzz" &&        // \x with no digit
      CopyText.unescape("\\q") == "q"               // unknown: char only
  }

  property("byte escapes decode at the byte level in UTF-8") = Prop {
    // a multi-byte UTF-8 sequence spelled as consecutive escapes is ONE
    // character, not per-escape latin-1 mojibake (PG semantics: \xHH is
    // a raw byte in the file's encoding)
    CopyText.unescape("\\xc3\\xa9") == "\u00e9" &&          // é, hex
      CopyText.unescape("\\303\\251") == "\u00e9" &&        // é, octal
      CopyText.unescape("a\\xc3\\xa9b") == "a\u00e9b" &&
      CopyText.unescape("\\xe2\\x82\\xac") == "\u20ac" && // €, 3 bytes
      // named escapes break a byte run (decode happens per run)
      CopyText.unescape("\\xc3\\n\\xa9") == "\ufffd\n\ufffd" &&
      // an invalid lone byte decodes to U+FFFD where PG would raise an
      // encoding error (\666 masks to byte 0xB6, not valid UTF-8 alone)
      CopyText.unescape("\\666") == "\ufffd" &&
      CopyText.unescape("\\xff") == "\ufffd"
  }

  property("column unescape equals the scalar spec") = Prop {
    import org.apache.spark.sql.functions.col
    val spark = SparkSpec.session
    import spark.implicits._
    val cases = Seq("\\x1a", "a\\x41b", "\\101\\n", "\\\\N", "plain",
      "tr\\tck", "\\q\\7", "ends with backslash\\")
    val got = cases.toDF("s")
      .select(CopyText.unescapeColumn(col("s"))).collect().map(_.getString(0))
    got.sameElements(cases.map(CopyText.unescape))
  }

  property("literal backslash-N value is not NULL") = Prop {
    val arr = Array[String]("\\N", null)
    val line = CopyText.formatRow(arr)
    val back = CopyText.parseLine(line)
    line == "\\\\N\t\\N" && back(0) == "\\N" && back(1) == null
  }

  property("escaped line never contains raw tab or newline") = forAll(str) {
    s => val e = CopyText.escape(s)
      !e.contains('\t') && !e.contains('\n') && !e.contains('\r')
  }
}
