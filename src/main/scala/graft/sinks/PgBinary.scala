package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graft.{FunctionInstaller => ExpressionUtils}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** PostgreSQL COPY BINARY encoding — the opt-in `WITH copy binary` sink
  * path. The reference loads COPY TEXT only; this is a Spark-first
  * extension: the executor fleet parses each text value ONCE into the
  * server's native binary datum, so the single PostgreSQL writer end
  * skips `int4in`/`date_in`/`numeric_in` per field AND the escape scan
  * per row. At cluster scale that converts server-CPU (the bottleneck:
  * one server, a thousand executors) into executor-CPU (abundant).
  *
  * Wire format (PG docs "Binary Format", src/backend/commands/copy*):
  * 19-byte header (`PGCOPY\n\377\r\n\0` + int32 flags=0 + int32
  * extlen=0), then per tuple int16 field-count followed by, per field,
  * int32 byte-length (-1 = NULL) + the type's `recv` payload, then an
  * int16 -1 trailer. Header/trailer are written by the endpoint around
  * each COPY statement ([[PgWireConnection.copyInRowsBinary]]); this
  * object renders the per-tuple frames.
  *
  * Reject contract: a value the target type cannot parse must reject
  * THAT ROW, exactly as the server's own input routine would under
  * COPY TEXT — never fail the task. Encoders therefore return null on
  * any unparseable value; [[rowColumn]] propagates it (null-intolerant
  * concat) to a null row frame, and [[CopySink]] routes null frames to
  * the reject channel with the row's COPY TEXT rendering.
  *
  * Fidelity caveats, both narrower than COPY TEXT and documented here
  * rather than silent: (1) values are parsed by the STRICT grammars
  * below (ISO dates/times, plain/scientific numerics, `t/f/true/…`
  * booleans) — PG's text routines accept more spellings (e.g.
  * `Jan 8 1999`), and such rows reject under binary; (2) a zoneless
  * timestamptz value is interpreted as UTC (this engine pins UTC
  * everywhere), where COPY TEXT would consult the server's TimeZone.
  * Types outside [[kindOf]]'s map (bytea, intervals, arrays, enums,
  * domains, …) make the Runner fall back to COPY TEXT for the table.
  * `WITH exactly once` composes: the stage tables clone the target's
  * layout (LIKE), so the staged path ships the same binary datums.
  */
/** Supported COPY BINARY target-type encodings; top-level so generated
  * code can declare the reference-object field with a plain Java type
  * name (an inner `PgBinary.Kind` would need a `$` binary name Janino
  * can't parse in a declaration). `typname` is pg_type.typname. */
sealed abstract class PgBinKind(val typname: String) extends Serializable

object PgBinKind {
  case object Bool extends PgBinKind("bool")
  case object I2 extends PgBinKind("int2")
  case object I4 extends PgBinKind("int4")
  case object I8 extends PgBinKind("int8")
  case object F4 extends PgBinKind("float4")
  case object F8 extends PgBinKind("float8")
  case object Date extends PgBinKind("date")
  case object Ts extends PgBinKind("timestamp")
  case object TsTz extends PgBinKind("timestamptz")
  case object Time extends PgBinKind("time")
  case object Num extends PgBinKind("numeric")
  case object Uuid extends PgBinKind("uuid")
  case object Text extends PgBinKind("text")
}

object PgBinary {
  import PgBinKind._

  /** pg_type.typname → encoding, None = unsupported (text fallback).
    * char-family and name are length-prefixed raw bytes exactly like
    * text (server-side padding/truncation applies as in COPY TEXT). */
  def kindOf(typname: String): Option[PgBinKind] = typname match {
    case "bool" => Some(Bool)
    case "int2" => Some(I2)
    case "int4" => Some(I4)
    case "int8" => Some(I8)
    case "float4" => Some(F4)
    case "float8" => Some(F8)
    case "date" => Some(Date)
    case "timestamp" => Some(Ts)
    case "timestamptz" => Some(TsTz)
    case "time" => Some(Time)
    case "numeric" => Some(Num)
    case "uuid" => Some(Uuid)
    case "text" | "varchar" | "bpchar" | "name" => Some(Text)
    case _ => None
  }

  // PG epoch 2000-01-01: epoch-day 10957; date ±infinity sentinels
  // (datatype/timestamp.h DATEVAL_NOEND/NOBEGIN, DT_NOEND/NOBEGIN)
  private val PgEpochDay = 10957L
  private val DateInf = Int.MaxValue
  private val DateNegInf = Int.MinValue
  private val TsInf = Long.MaxValue
  private val TsNegInf = Long.MinValue

  /** A 4-byte −1 length: the NULL field frame. */
  val NullField: Array[Byte] = Array(-1, -1, -1, -1).map(_.toByte)

  /** 19-byte stream header: signature + flags 0 + extension length 0. */
  val Header: Array[Byte] =
    "PGCOPY\n".getBytes("ISO-8859-1") ++
      Array[Byte](-1, '\r', '\n', 0) ++ new Array[Byte](8)

  /** int16 −1: the stream trailer. */
  val Trailer: Array[Byte] = Array(-1, -1).map(_.toByte)

  // ---- scalar encoders: text value → length-prefixed field bytes ----

  /** Encode one field; null when the value doesn't parse as `kind`
    * (→ the row rejects, see class doc). Called from codegen. */
  def encodeField(v: UTF8String, kind: PgBinKind): Array[Byte] =
    kind match {
      case Text =>
        val n = v.numBytes()
        val out = new Array[Byte](4 + n)
        writeInt(out, 0, n)
        v.writeToMemory(out,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + 4)
        out
      case Bool => encodeBool(v)
      case I2 => parseLong(v) match {
        case null => null
        case l if l >= Short.MinValue && l <= Short.MaxValue =>
          val out = new Array[Byte](6); writeInt(out, 0, 2)
          out(4) = (l >> 8).toByte; out(5) = l.toByte; out
        case _ => null
      }
      case I4 => parseLong(v) match {
        case null => null
        case l if l >= Int.MinValue && l <= Int.MaxValue =>
          val out = new Array[Byte](8); writeInt(out, 0, 4)
          writeInt(out, 4, l.toInt); out
        case _ => null
      }
      case I8 => parseLong(v) match {
        case null => null
        case l => i8(l.longValue)
      }
      case F4 => parseDouble(v) match {
        case null => null
        case d =>
          // float4recv stores the bits as sent, so out-of-range must
          // reject HERE exactly as float4in would: a finite input that
          // narrows to ±inf overflowed; a nonzero one that narrows to
          // 0 underflowed
          val dd = d.doubleValue
          val f = dd.toFloat
          if ((java.lang.Float.isInfinite(f) &&
                !java.lang.Double.isInfinite(dd)) ||
              (f == 0.0f && dd != 0.0 && !java.lang.Double.isNaN(dd)))
            null
          else {
            val out = new Array[Byte](8); writeInt(out, 0, 4)
            writeInt(out, 4, java.lang.Float.floatToIntBits(f)); out
          }
      }
      case F8 => parseDouble(v) match {
        case null => null
        case d => i8(java.lang.Double.doubleToLongBits(d.doubleValue))
      }
      case Date => parseDateDays(v) match {
        case null => null
        case days =>
          val out = new Array[Byte](8); writeInt(out, 0, 4)
          writeInt(out, 4, days.intValue); out
      }
      case Ts => parseTimestampMicros(v, applyZone = false) match {
        case null => null; case m => i8(m.longValue)
      }
      case TsTz => parseTimestampMicros(v, applyZone = true) match {
        case null => null; case m => i8(m.longValue)
      }
      case Time => parseTimeMicros(v.toString, max24 = true) match {
        case null => null; case m => i8(m.longValue)
      }
      case Num => encodeNumeric(v)
      case Uuid => encodeUuid(v)
    }

  private def i8(l: Long): Array[Byte] = {
    val out = new Array[Byte](12)
    writeInt(out, 0, 8)
    var i = 0
    while (i < 8) { out(4 + i) = (l >> (56 - 8 * i)).toByte; i += 1 }
    out
  }

  private def writeInt(out: Array[Byte], off: Int, v: Int): Unit = {
    out(off) = (v >> 24).toByte; out(off + 1) = (v >> 16).toByte
    out(off + 2) = (v >> 8).toByte; out(off + 3) = v.toByte
  }

  private def encodeBool(v: UTF8String): Array[Byte] = {
    val s = v.trim().toString.toLowerCase(java.util.Locale.ROOT)
    val b: Int = s match {
      case "t" | "true" | "y" | "yes" | "on" | "1" => 1
      case "f" | "false" | "n" | "no" | "off" | "0" => 0
      case _ => -1
    }
    if (b < 0) null
    else Array[Byte](0, 0, 0, 1, b.toByte)
  }

  /** PG-style integer text: optional surrounding spaces, one sign,
    * digits. Overflow → null (boxed Long; null = unparseable). */
  private def parseLong(v: UTF8String): java.lang.Long = {
    val n = v.numBytes()
    var i = 0
    while (i < n && v.getByte(i) == ' ') i += 1
    var end = n
    while (end > i && v.getByte(end - 1) == ' ') end -= 1
    if (i >= end) return null
    var neg = false
    v.getByte(i) match {
      case '-' => neg = true; i += 1
      case '+' => i += 1
      case _ => ()
    }
    if (i >= end) return null
    var acc = 0L
    while (i < end) {
      val b = v.getByte(i)
      if (b < '0' || b > '9') return null
      val d = b - '0'
      if (acc < (Long.MinValue + d) / 10) return null // would overflow
      acc = acc * 10 - d // accumulate negative: |Long.MinValue| fits
      i += 1
    }
    if (neg) java.lang.Long.valueOf(acc)
    else if (acc == Long.MinValue) null
    else java.lang.Long.valueOf(-acc)
  }

  /** PG float text: Java grammar plus inf/infinity/nan spellings;
    * Java's trailing type-suffix laxity (`1.5f`) is rejected. */
  private def parseDouble(v: UTF8String): java.lang.Double = {
    val s = v.trim().toString
    if (s.isEmpty) return null
    s.toLowerCase(java.util.Locale.ROOT) match {
      case "inf" | "+inf" | "infinity" | "+infinity" =>
        return java.lang.Double.valueOf(Double.PositiveInfinity)
      case "-inf" | "-infinity" =>
        return java.lang.Double.valueOf(Double.NegativeInfinity)
      case "nan" | "+nan" | "-nan" =>
        return java.lang.Double.valueOf(Double.NaN)
      case _ => ()
    }
    val last = s.charAt(s.length - 1)
    if (last == 'd' || last == 'D' || last == 'f' || last == 'F')
      return null
    try {
      val d = java.lang.Double.parseDouble(s)
      // an infinite result from a NUMERIC spelling (handled above) is
      // an overflow — float8in rejects "1e309" as out of range
      if (java.lang.Double.isInfinite(d)) null
      else java.lang.Double.valueOf(d)
    } catch { case _: NumberFormatException => null }
  }

  /** ISO `y-m-d` → days since 2000-01-01; ±infinity sentinels. */
  private def parseDateDays(v: UTF8String): Integer = {
    val s = v.trim().toString
    val low = s.toLowerCase(java.util.Locale.ROOT)
    if (low == "infinity") return Integer.valueOf(DateInf)
    if (low == "-infinity") return Integer.valueOf(DateNegInf)
    val d = parseIsoDate(s)
    if (d == null) null
    else Integer.valueOf((d.toEpochDay - PgEpochDay).toInt)
  }

  private def parseIsoDate(s: String): java.time.LocalDate = {
    val parts = s.split("-", -1)
    if (parts.length != 3) return null
    try java.time.LocalDate.of(parts(0).toInt, parts(1).toInt,
      parts(2).toInt)
    catch { case scala.util.control.NonFatal(_) => null }
  }

  /** `y-m-d[ T]h:m[:s[.f]][±HH[:MM]|Z]` → micros since 2000-01-01.
    * `applyZone`: timestamptz applies the offset (zoneless = UTC, see
    * class doc); plain timestamp ignores a trailing offset exactly as
    * `timestamp_in` does. */
  private def parseTimestampMicros(v: UTF8String,
                                   applyZone: Boolean): java.lang.Long = {
    val s = v.trim().toString
    val low = s.toLowerCase(java.util.Locale.ROOT)
    if (low == "infinity") return java.lang.Long.valueOf(TsInf)
    if (low == "-infinity") return java.lang.Long.valueOf(TsNegInf)
    val sep = s.indexWhere(c => c == ' ' || c == 'T')
    if (sep < 0) {
      // date-only input is a valid timestamp (midnight), as
      // timestamp_in accepts
      val d = parseIsoDate(s)
      return if (d == null) null
        else java.lang.Long.valueOf(
          (d.toEpochDay - PgEpochDay) * 86400000000L)
    }
    val date = parseIsoDate(s.substring(0, sep))
    if (date == null) return null
    // zone suffix: trailing Z or the LAST +/- after the time separator
    var timeEnd = s.length
    var zoneMinutes = 0
    var zoned = false
    if (s.endsWith("Z") || s.endsWith("z")) {
      timeEnd = s.length - 1; zoned = true
    } else {
      var i = s.length - 1
      var zi = -1
      while (i > sep && zi < 0) {
        val c = s.charAt(i)
        if (c == '+' || c == '-') zi = i
        i -= 1
      }
      if (zi > sep) {
        val z = s.substring(zi)
        val m = parseZoneMinutes(z)
        if (m == null) return null
        zoneMinutes = m.intValue; zoned = true; timeEnd = zi
      }
    }
    val tod = parseTimeMicros(s.substring(sep + 1, timeEnd),
      max24 = false)
    if (tod == null) return null
    var micros = (date.toEpochDay - PgEpochDay) * 86400000000L +
      tod.longValue
    if (applyZone && zoned) micros -= zoneMinutes * 60000000L
    java.lang.Long.valueOf(micros)
  }

  /** `±HH`, `±HHMM`, `±HH:MM` → signed minutes. */
  private def parseZoneMinutes(z: String): Integer = {
    if (z.length < 3) return null
    val sign = if (z.charAt(0) == '-') -1 else 1
    val body = z.substring(1).replace(":", "")
    if (!body.forall(_.isDigit)) return null
    val (h, m) = body.length match {
      case 2 => (body.toInt, 0)
      case 4 => (body.substring(0, 2).toInt, body.substring(2).toInt)
      case _ => return null
    }
    if (h > 15 || m > 59) return null
    Integer.valueOf(sign * (h * 60 + m))
  }

  /** `h:m[:s[.ffffff]]` → micros since midnight; `max24` allows the
    * 24:00:00 endpoint PG's time type accepts. */
  private def parseTimeMicros(s0: String, max24: Boolean)
      : java.lang.Long = {
    val s = s0.trim
    val main = s.split("\\.", 2)
    val hms = main(0).split(":", -1)
    if (hms.length < 2 || hms.length > 3) return null
    if (!hms.forall(p => p.nonEmpty && p.forall(_.isDigit))) return null
    val h = hms(0).toInt
    val m = hms(1).toInt
    val sec = if (hms.length == 3) hms(2).toInt else 0
    if (m > 59 || sec > 59) return null
    var frac = 0L
    if (main.length == 2) {
      val f = main(1)
      if (f.isEmpty || f.length > 6 || !f.forall(_.isDigit)) return null
      frac = (f + "000000").substring(0, 6).toLong
    }
    val micros = ((h * 3600L + m * 60L + sec) * 1000000L) + frac
    val limit = if (max24) 86400000000L else 86399999999L
    if (h > 24 || micros > limit) return null
    java.lang.Long.valueOf(micros)
  }

  /** numeric text → base-10000 wire form: int16 ndigits, int16 weight,
    * int16 sign (0x4000 neg, 0xC000 NaN, 0xD000/0xF000 ±inf), int16
    * dscale, then ndigits MSD-first int16 groups. dscale is the input's
    * displayed fraction digits (BigDecimal scale after exponent),
    * matching `numeric_in`. */
  private def encodeNumeric(v: UTF8String): Array[Byte] = {
    val s = v.trim().toString
    s.toLowerCase(java.util.Locale.ROOT) match {
      case "nan" => return numericSpecial(0xC000)
      case "infinity" | "inf" | "+infinity" | "+inf" =>
        return numericSpecial(0xD000)
      case "-infinity" | "-inf" => return numericSpecial(0xF000)
      case _ => ()
    }
    val bd =
      try new java.math.BigDecimal(s)
      catch { case _: NumberFormatException => return null }
    val dscale = math.max(0, bd.scale)
    if (dscale > 0x3FFF) return null // wire field is 14 bits
    val neg = bd.signum < 0
    val plain = bd.abs.stripTrailingZeros
    if (plain.unscaledValue.signum == 0)
      return numericGroups(Array.empty, 0, neg = false, dscale)
    // digits left of the point, grouped in 4 from the point outwards
    val text = plain.toPlainString
    val dot = text.indexOf('.')
    val intPart = if (dot < 0) text else text.substring(0, dot)
    val fracPart = if (dot < 0) "" else text.substring(dot + 1)
    val intPad = (4 - intPart.length % 4) % 4
    val fracPad = (4 - fracPart.length % 4) % 4
    val grouped = ("0" * intPad) + intPart + fracPart + ("0" * fracPad)
    var groups = grouped.grouped(4).map(_.toInt).toArray
    var weight = (intPart.length + intPad) / 4 - 1
    // strip leading/trailing zero groups (weight tracks the first)
    var lead = 0
    while (lead < groups.length && groups(lead) == 0) lead += 1
    weight -= lead
    var tail = groups.length
    while (tail > lead && groups(tail - 1) == 0) tail -= 1
    groups = groups.slice(lead, tail)
    if (weight > Short.MaxValue || weight < Short.MinValue) return null
    numericGroups(groups, weight, neg, dscale)
  }

  private def numericSpecial(sign: Int): Array[Byte] =
    numericRaw(Array.empty, 0, sign, 0)

  private def numericGroups(groups: Array[Int], weight: Int,
                            neg: Boolean, dscale: Int): Array[Byte] =
    numericRaw(groups, weight, if (neg) 0x4000 else 0x0000, dscale)

  private def numericRaw(groups: Array[Int], weight: Int, sign: Int,
                         dscale: Int): Array[Byte] = {
    val len = 8 + 2 * groups.length
    val out = new Array[Byte](4 + len)
    writeInt(out, 0, len)
    def i16(off: Int, v: Int): Unit = {
      out(off) = (v >> 8).toByte; out(off + 1) = v.toByte
    }
    i16(4, groups.length); i16(6, weight); i16(8, sign); i16(10, dscale)
    var i = 0
    while (i < groups.length) { i16(12 + 2 * i, groups(i)); i += 1 }
    out
  }

  private def encodeUuid(v: UTF8String): Array[Byte] = {
    val s = v.trim().toString.replace("-", "")
      .stripPrefix("{").stripSuffix("}")
    if (s.length != 32) return null
    val out = new Array[Byte](4 + 16)
    writeInt(out, 0, 16)
    var i = 0
    while (i < 16) {
      val hi = Character.digit(s.charAt(2 * i), 16)
      val lo = Character.digit(s.charAt(2 * i + 1), 16)
      if (hi < 0 || lo < 0) return null
      out(4 + i) = ((hi << 4) | lo).toByte
      i += 1
    }
    out
  }

  // ---- plan-side assembly -------------------------------------------

  /** One COPY BINARY tuple frame per row, fully inside codegen: int16
    * field count ++ per-field length-prefixed payloads (NULL → −1).
    * Null result = some field failed to parse (concat is
    * null-intolerant) → the sink rejects the row. */
  def rowColumn(df: DataFrame, kinds: Seq[PgBinKind]): Column = {
    import org.apache.spark.sql.functions.{col, concat, lit, when}
    require(kinds.length == df.columns.length,
      s"${kinds.length} kinds for ${df.columns.length} columns")
    val n = df.columns.length
    val cnt = lit(Array[Byte]((n >> 8).toByte, n.toByte))
    val fields = df.schema.fields.zip(kinds).map { case (f, k) =>
      val c = col("`" + f.name.replace("`", "``") + "`")
      // non-string inputs go through the canonical PG text rendering
      // first (dates, timestamps, decimals — CopyText owns that
      // grammar), then parse into the binary datum
      val txt =
        if (f.dataType == StringType) c
        else graft.sources.CopyText.pgLiteralColumn(c, f.dataType)
      when(c.isNull, lit(NullField))
        .otherwise(ExpressionUtils.column(
          PgBinaryField(ExpressionUtils.expression(txt), k)))
    }
    concat((cnt +: fields.toIndexedSeq): _*)
  }

  /** [[CopySink]] renderer for the binary path: `value` = the tuple
    * frame, `reject` = the row's COPY TEXT line (only materialized for
    * rows whose encode failed — the `when` keeps it off the hot path).
    */
  def renderer(kinds: Seq[PgBinKind]): DataFrame => DataFrame = { df =>
    import org.apache.spark.sql.functions.{concat, lit, when}
    val v = rowColumn(df, kinds)
    df.select(v.as("value"),
      when(v.isNull,
        concat(graft.sources.CopyText.lineColumn(df), lit("\n"))
          .cast(BinaryType))
        .otherwise(lit(null).cast(BinaryType)).as("reject"))
  }
}

/** Native expression: one string value → its length-prefixed COPY
  * BINARY field bytes for `kind`; NULL when the value doesn't parse
  * (the reject contract — see [[PgBinary]]). */
case class PgBinaryField(child: Expression, kind: PgBinKind)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got " +
        child.dataType.simpleString)
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  // introduces NULL on unparseable values even for a non-nullable
  // child — same nullability trap as CsvParseLine (see its comment)
  override def nullable: Boolean = true
  override def prettyName: String = "pg_binary_field"

  protected override def nullSafeEval(input: Any): Any =
    PgBinary.encodeField(input.asInstanceOf[UTF8String], kind)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pgBinKind", kind,
      "graft.sinks.PgBinKind")
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.sinks.PgBinary.encodeField($c, $ref);
       |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
