package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.unsafe.types.UTF8String
import graft.sinks.{PgBinKind, PgBinary}

/** COPY BINARY encoder safety properties. The reject contract says an
  * unparseable value rejects ITS ROW; it must never escape as an
  * exception that kills the Spark task — so every encoder must be
  * total over arbitrary input: return well-formed length-prefixed
  * bytes or null, nothing else. */
object PgBinaryProps extends Properties("PgBinary") {

  private val kinds: Gen[PgBinKind] = Gen.oneOf(
    PgBinKind.Bool, PgBinKind.I2, PgBinKind.I4, PgBinKind.I8,
    PgBinKind.F4, PgBinKind.F8, PgBinKind.Date, PgBinKind.Ts,
    PgBinKind.TsTz, PgBinKind.Time, PgBinKind.Num, PgBinKind.Uuid,
    PgBinKind.Bytea, PgBinKind.Text, PgBinKind.Ival, PgBinKind.Jsonb,
    PgBinKind.Arr(PgBinKind.I4, 23), PgBinKind.Arr(PgBinKind.Text, 25),
    PgBinKind.Arr(PgBinKind.Num, 1700),
    PgBinKind.Arr(PgBinKind.Ival, 1186),
    PgBinKind.Rng(PgBinKind.I4, "int4range"),
    PgBinKind.Rng(PgBinKind.Num, "numrange"),
    PgBinKind.Rng(PgBinKind.Date, "daterange"),
    PgBinKind.Rng(PgBinKind.Text, "textrange"),
    PgBinKind.Mrng(PgBinKind.Rng(PgBinKind.I4, "int4range"),
      "int4multirange"),
    PgBinKind.Mrng(PgBinKind.Rng(PgBinKind.Text, "textrange"),
      "textmultirange"),
    PgBinKind.Comp(Seq((PgBinKind.I4, 23), (PgBinKind.Text, 25)), "pt"),
    PgBinKind.Comp(Seq((PgBinKind.Num, 1700)), "n1"),
    // stacked-quoting nests: array-of-composite, composite-with-range
    PgBinKind.Arr(
      PgBinKind.Comp(Seq((PgBinKind.I4, 23), (PgBinKind.Text, 25)),
        "pt"), 90001),
    PgBinKind.Comp(Seq(
      (PgBinKind.Rng(PgBinKind.I4, "int4range"), 3904),
      (PgBinKind.Text, 25)), "rc"))

  // hostile bias: number-ish and datetime-ish fragments glued
  // randomly, long digit runs, signs, separators, exponent markers,
  // plus plain garbage and unicode
  private val fragment: Gen[String] = Gen.oneOf(
    Gen.numStr.map(_.take(24)), Gen.const("-"), Gen.const("+"),
    Gen.const("."), Gen.const(":"), Gen.const("e"), Gen.const("E"),
    Gen.const(" "), Gen.const("T"), Gen.const("Z"), Gen.const("0x"),
    Gen.const("infinity"), Gen.const("nan"), Gen.const("1e999999999"),
    Gen.const("99999999999999999999"), Gen.const("2000-01-01"),
    Gen.const("12:34:56"), Gen.const("é漢"),
    Gen.const("\\x"), Gen.const("\\xdead"), Gen.const("\\xbee"),
    Gen.const("\\101"), Gen.const("\\\\"), Gen.const("\\9"),
    Gen.const("\\x0 1"), Gen.const("deadBEEF"),
    Gen.const("{"), Gen.const("}"), Gen.const("{}"), Gen.const(","),
    Gen.const("{1,2}"), Gen.const("{NULL}"), Gen.const("\"q\""),
    Gen.const("""{"a\"b",null}"""), Gen.const("{{1},{2}}"),
    Gen.const("{{1,2},{3,4}}"), Gen.const("{{}}"), Gen.const("{1,{2}}"),
    Gen.const("{{{1}}}"),
    Gen.const("P1Y2M3DT4H5M6.5S"), Gen.const("mons"), Gen.const("ago"),
    Gen.const("3 days"), Gen.const("-1 days +02:03:00"),
    Gen.const("P-1M-2DT-3.5S"), Gen.const("1.5 days"),
    Gen.const("[1,3)"), Gen.const("[1,3]"), Gen.const("empty"),
    Gen.const("(,)"), Gen.const("[,5]"), Gen.const("""["a",b)"""),
    Gen.const("[1,"), Gen.const("["), Gen.const("]"), Gen.const("("),
    Gen.const("{[1,3),[5,7)}"), Gen.const("{empty}"),
    Gen.const("(1,hi)"), Gen.const("(1,)"), Gen.const("(,)"),
    Gen.const("""(1,"a""b")"""), Gen.const(")"),
    Gen.asciiPrintableStr.map(_.take(8)))
  private val hostile: Gen[String] =
    Gen.listOfN(4, fragment).map(_.mkString).flatMap(s =>
      Gen.oneOf(s, s.trim, " " + s + " "))

  property("encodeField is total: well-formed frame bytes or null, " +
    "never a throw") = forAll(hostile, kinds) { (s, k) =>
    val out = PgBinary.encodeField(UTF8String.fromString(s), k)
    out == null || {
      val len = ((out(0) & 0xFF) << 24) | ((out(1) & 0xFF) << 16) |
        ((out(2) & 0xFF) << 8) | (out(3) & 0xFF)
      len == out.length - 4
    }
  }

  property("frameToTextLine is total over arbitrary bytes: decoded " +
    "line or the raw frame, never a throw") =
    forAll(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)),
      Gen.listOfN(3, kinds)) { (bytes, ks) =>
      val frame = bytes.toArray
      PgBinary.frameToTextLine(frame, ks) != null
    }

  property("encode→decode round-trips every encodable value through " +
    "the reject-file text rendering to the SAME datum") =
    forAll(hostile, kinds) { (s, k) =>
      val enc = PgBinary.encodeField(UTF8String.fromString(s), k)
      enc == null || {
        // a 1-field frame; decode to text; re-encode; byte equality —
        // the canonical rendering must denote the same datum
        val frame = Array[Byte](0, 1) ++ enc
        val line = new String(
          PgBinary.frameToTextLine(frame, Seq(k)), "UTF-8")
        val v2 = graft.sources.CopyText.unescape(line.stripSuffix("\n"))
        val enc2 = PgBinary.encodeField(UTF8String.fromString(v2), k)
        enc2 != null && java.util.Arrays.equals(enc, enc2)
      }
    }
}
