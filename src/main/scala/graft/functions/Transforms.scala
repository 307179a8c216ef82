package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar transform library — the string→string per-column functions the
  * reference applies between source read and target cast.
  *
  * Semantics follow the reference's transform library
  * (src/utils/transforms.lisp:118-618 and
  * clojure/src/pgloader/transforms.clj), re-expressed as Spark `Column`
  * expressions built from `org.apache.spark.sql.functions` so every one of
  * them stays inside whole-stage codegen (no UDFs in the hot path).
  *
  * Invariant shared with the reference: every function maps NULL → NULL.
  * Built-in `functions._` compositions preserve that automatically except
  * where noted (explicit `when(c.isNull, ...)` guards).
  */
object Transforms {

  /** Dates with a zero year, month, OR day component → NULL
    * (transforms.lisp:118-129): MySQL permits `2004-00-15` and
    * `0000-12-25`, not just the all-zero `0000-00-00`. The reference also
    * returns NIL for the empty string here (its `(string= "" date-string)`
    * branch) — kept, since zero-dates-to-null is the default date cast and
    * a bare `""` would otherwise fail in COPY. */
  def zeroDatesToNull(c: Column): Column =
    when(c.isNull
        || c === ""
        || substring(c, 1, 4) === "0000"
        || substring(c, 6, 2) === "00"
        || substring(c, 9, 2) === "00", lit(null: String))
      .otherwise(c)

  /** `20041002152952` → `2004-10-02 15:29:52` (transforms.lisp:131-158).
    * Separators are stripped first; an all-zero digit string is NULL.
    * Accepts bare dates (8 digits) and full timestamps (>= 14 digits).
    */
  def dateWithNoSeparator(c: Column): Column = {
    val d = regexp_replace(c, "[ :\\-.,;]", "")
    val ts = concat(
      substring(d, 1, 4), lit("-"), substring(d, 5, 2), lit("-"),
      substring(d, 7, 2), lit(" "), substring(d, 9, 2), lit(":"),
      substring(d, 11, 2), lit(":"), substring(d, 13, 2))
    val dateOnly = concat(
      substring(d, 1, 4), lit("-"), substring(d, 5, 2), lit("-"),
      substring(d, 7, 2))
    when(c.isNull, lit(null: String))
      .when(d.rlike("^0+$"), lit(null: String))
      .when(length(d) >= 14, ts)
      .when(length(d) === 8, dateOnly)
      .otherwise(c)
  }

  /** `08231560` → `08:23:15.60` (transforms.lisp:160-174). Fractional
    * seconds beyond position 6 become the sub-second part. */
  def timeWithNoSeparator(c: Column): Column = {
    val base = concat(
      substring(c, 1, 2), lit(":"), substring(c, 3, 2), lit(":"),
      substring(c, 5, 2))
    when(c.isNull, lit(null: String))
      .when(length(c) > 6, concat(base, lit("."), substring(c, 7, 10)))
      .otherwise(base)
  }

  /** MySQL tinyint used as boolean: "0" → "f", anything else → "t"
    * (transforms.lisp:176-181). Output uses PG boolean text literals. */
  def tinyintToBoolean(c: Column): Column =
    when(c.isNull, lit(null: String))
      .when(c === "0", lit("f"))
      .otherwise(lit("t"))

  /** bit(1) byte → "f"/"t" (transforms.lisp:183-193). Input BinaryType. */
  def bitsToBoolean(c: Column): Column =
    when(c.isNull, lit(null: String))
      .when(conv(hex(c), 16, 10) === "0", lit("f"))
      .otherwise(lit("t"))

  /** bit(n) → hex bitstring literal `X0ff` (transforms.lisp:195-216). */
  def bitsToHexBitstring(c: Column): Column =
    when(c.isNull, lit(null: String))
      .otherwise(concat(lit("X"), lower(hex(c))))

  /** uint32 → dotted-quad IPv4 (transforms.lisp:218-237). Input is the
    * decimal string or integer form of the address. */
  def intToIp(c: Column): Column = {
    val v = c.cast("long")
    val quad = concat(
      shiftright(v, 24).bitwiseAND(255).cast("string"), lit("."),
      shiftright(v, 16).bitwiseAND(255).cast("string"), lit("."),
      shiftright(v, 8).bitwiseAND(255).cast("string"), lit("."),
      v.bitwiseAND(255).cast("string"))
    when(c.isNull, lit(null: String)).otherwise(quad)
  }

  /** two uint32s → `a.b.c.d-e.f.g.h` ip4r range (transforms.lisp:239-246). */
  def ipRange(lo: Column, hi: Column): Column =
    when(lo.isNull || hi.isNull, lit(null: String))
      .otherwise(concat(intToIp(lo), lit("-"), intToIp(hi)))

  /** MySQL `POINT(x y)` astext form → PG `(x,y)` (transforms.lisp:248-257). */
  def convertMysqlPoint(c: Column): Column =
    when(c.isNull, lit(null: String)).otherwise(
      concat(lit("("),
        regexp_replace(regexp_extract(c, "POINT\\(([^)]*)\\)", 1), " ", ","),
        lit(")")))

  /** MySQL `LINESTRING(x1 y1,x2 y2,…)` → PG path `[(x1,y1),(x2,y2),…]`
    * (transforms.lisp:259-275). */
  def convertMysqlLinestring(c: Column): Column = {
    val inner = regexp_extract(c, "LINESTRING\\(([^)]*)\\)", 1)
    val pgPairs = regexp_replace(regexp_replace(inner, ",", "),("), " ", ",")
    when(c.isNull, lit(null: String))
      .otherwise(concat(lit("[("), pgPairs, lit(")]")))
  }

  /** Strip layered quotes then parse integer: `'"0"'` → `0`
    * (transforms.lisp:277-297). */
  def integerToString(c: Column): Column =
    when(c.isNull, lit(null: String))
      .otherwise(regexp_replace(c, "['\"]", "").cast("long").cast("string"))

  /** Float → PG literal text (transforms.lisp:299-311). */
  def floatToString(c: Column): Column =
    c.cast("double").cast("string")

  /** MySQL SET value `a,b` → PG enum-array literal `{a,b}`
    * (transforms.lisp:313-316). */
  def setToEnumArray(c: Column): Column =
    when(c.isNull, lit(null: String))
      .otherwise(concat(lit("{"), c, lit("}")))

  /** "" → NULL (transforms.lisp:318-321). */
  def emptyStringToNull(c: Column): Column =
    when(c === "", lit(null: String)).otherwise(c)

  /** rtrim (transforms.lisp:323-326). */
  def rightTrim(c: Column): Column = rtrim(c)

  /** Strip 0x00 bytes — PG text cannot hold them (transforms.lisp:328-332). */
  def removeNullCharacters(c: Column): Column =
    regexp_replace(c, "\\x00", "")

  /** bytes → PG bytea hex literal `\xdeadbeef` (transforms.lisp:334-363). */
  def byteVectorToBytea(c: Column): Column =
    when(c.isNull, lit(null: String))
      .otherwise(concat(lit("\\x"), lower(hex(c))))

  /** SQLite loose timestamps: 0 → NULL, bare year `YYYY` → `YYYY-01-01`,
    * else passthrough (transforms.lisp:375-396). */
  def sqliteTimestampToTimestamp(c: Column): Column =
    when(c.isNull, lit(null: String))
      .when(c === "0" || c.startsWith("0000-00-00"), lit(null: String))
      .when(c.rlike("^\\d{4}$"), concat(c, lit("-01-01")))
      .otherwise(c)

  /** MS SQL uniqueidentifier: 16 bytes, first three groups little-endian →
    * canonical UUID text (transforms.lisp:413-431). Input BinaryType. */
  def sqlServerUniqueIdentifierToUuid(c: Column): Column = {
    val h = lower(hex(c))
    def b(i: Int): Column = substring(h, (i - 1) * 2 + 1, 2) // i-th byte as hex
    val uuid = concat(
      b(4), b(3), b(2), b(1), lit("-"),
      b(6), b(5), lit("-"),
      b(8), b(7), lit("-"),
      b(9), b(10), lit("-"),
      b(11), b(12), b(13), b(14), b(15), b(16))
    when(c.isNull, lit(null: String)).otherwise(uuid)
  }

  /** epoch seconds → `YYYY-MM-DD hh:mm:ss` UTC (transforms.lisp:433-448). */
  def unixTimestampToTimestamptz(c: Column): Column =
    when(c.isNull, lit(null: String))
      .otherwise(from_unixtime(c.cast("long")))

  /** MS SQL bit default forms `0/1/((0))/((1))` → f/t
    * (transforms.lisp:450-459). */
  def sqlServerBitToBoolean(c: Column): Column = {
    val v = regexp_replace(c, "[()]", "")
    when(c.isNull, lit(null: String))
      .when(v === "0", lit("f"))
      .when(v === "1", lit("t"))
      .otherwise(lit(null: String))
  }

  /** bytes → bare hex string (transforms.lisp:461-485). */
  def byteVectorToHexstring(c: Column): Column = lower(hex(c))

  /** varbinary holding encoded text → text (transforms.lisp:487-494). */
  def varbinaryToString(c: Column, charset: String = "UTF-8"): Column =
    decode(c, charset)

  /** 4 or 16 raw bytes → IPv4 / IPv6 literal (transforms.lisp:496-514). */
  def varbinaryToInet(c: Column): Column = {
    val h = lower(hex(c))
    def b(i: Int): Column = conv(substring(h, (i - 1) * 2 + 1, 2), 16, 10)
    def g(i: Int): Column = // IPv6 16-bit group, leading zeros stripped
      regexp_replace(substring(h, (i - 1) * 4 + 1, 4), "^0{1,3}", "")
    val v4 = concat(b(1), lit("."), b(2), lit("."), b(3), lit("."), b(4))
    val v6 = concat_ws(":", (1 to 8).map(g): _*)
    when(c.isNull, lit(null: String))
      .when(length(c) === 4, v4)
      .when(length(c) === 16, v6)
      .otherwise(lit(null: String))
  }

  /** MySQL binary(16) UUID → hyphenated text, big-endian
    * (transforms.lisp:516-534). */
  def binaryToUuid(c: Column): Column = {
    val h = lower(hex(c))
    when(c.isNull, lit(null: String)).otherwise(concat(
      substring(h, 1, 8), lit("-"), substring(h, 9, 4), lit("-"),
      substring(h, 13, 4), lit("-"), substring(h, 17, 4), lit("-"),
      substring(h, 21, 12)))
  }

  /** base64 text → decoded text (transforms.lisp:559-562). */
  def base64Decode(c: Column): Column = decode(unbase64(c), "UTF-8")

  /** hex string (optionally 0x-prefixed) → decimal string
    * (transforms.lisp:564-573). */
  def hexToDec(c: Column): Column =
    when(c.isNull, lit(null: String))
      .otherwise(conv(regexp_replace(c, "^0[xX]", ""), 16, 10))

  /** hex string → bytea literal (transforms.lisp:575-581). */
  def hexToBytea(c: Column): Column =
    when(c.isNull, lit(null: String))
      .otherwise(concat(lit("\\x"), lower(regexp_replace(c, "^0[xX]", ""))))

  // --- DBF / dBase family (transforms.lisp:588-618) ---

  /** dBase logical: `?`/blank → NULL, T/t/Y/y → t, else f. */
  def logicalToBoolean(c: Column): Column =
    when(c.isNull || c === "?" || trim(c) === "", lit(null: String))
      .when(upper(c).isin("T", "Y"), lit("t"))
      .otherwise(lit("f"))

  /** dBase char: right-trim padding. */
  def db3TrimString(c: Column): Column = rtrim(c)

  /** dBase numeric: strip spaces; empty → NULL. */
  def db3NumericToPgsqlNumeric(c: Column): Column = {
    val v = regexp_replace(c, " ", "")
    when(c.isNull || v === "", lit(null: String)).otherwise(v)
  }

  /** dBase numeric → integer (truncates the decimal part). */
  def db3NumericToPgsqlInteger(c: Column): Column = {
    val v = regexp_replace(c, " ", "")
    when(c.isNull || v === "", lit(null: String))
      .otherwise(v.cast("decimal(38,9)").cast("long").cast("string"))
  }

  /** dBase date `YYYYMMDD` → `YYYY-MM-DD`; blank/zero → NULL. */
  def db3DateToPgsqlDate(c: Column): Column =
    when(c.isNull || trim(c) === "" || c.rlike("^0+$"), lit(null: String))
      .otherwise(concat(
        substring(c, 1, 4), lit("-"), substring(c, 5, 2), lit("-"),
        substring(c, 7, 2)))

  /** Named registry — the surface the cast-rule engine and the `.load` DSL
    * reference transforms by (clojure/src/pgloader/cast.clj:364-383). */
  val registry: Map[String, Column => Column] = Map(
    "identity" -> (c => c), // transforms.lisp identity passthrough
    "zero-dates-to-null" -> zeroDatesToNull,
    "date-with-no-separator" -> dateWithNoSeparator,
    "time-with-no-separator" -> timeWithNoSeparator,
    "tinyint-to-boolean" -> tinyintToBoolean,
    "bits-to-boolean" -> bitsToBoolean,
    "bits-to-hex-bitstring" -> bitsToHexBitstring,
    "int-to-ip" -> intToIp,
    "convert-mysql-point" -> convertMysqlPoint,
    "convert-mysql-linestring" -> convertMysqlLinestring,
    "integer-to-string" -> integerToString,
    "float-to-string" -> floatToString,
    "set-to-enum-array" -> setToEnumArray,
    "empty-string-to-null" -> emptyStringToNull,
    "right-trim" -> rightTrim,
    "remove-null-characters" -> removeNullCharacters,
    "byte-vector-to-bytea" -> byteVectorToBytea,
    "sqlite-timestamp-to-timestamp" -> sqliteTimestampToTimestamp,
    "sql-server-uniqueidentifier-to-uuid" -> sqlServerUniqueIdentifierToUuid,
    "unix-timestamp-to-timestamptz" -> unixTimestampToTimestamptz,
    "sql-server-bit-to-boolean" -> sqlServerBitToBoolean,
    "byte-vector-to-hexstring" -> byteVectorToHexstring,
    "varbinary-to-string" -> (varbinaryToString(_)),
    "varbinary-to-inet" -> varbinaryToInet,
    "binary-to-uuid" -> binaryToUuid,
    "base64-decode" -> base64Decode,
    "hex-to-dec" -> hexToDec,
    "hex-to-bytea" -> hexToBytea,
    "logical-to-boolean" -> logicalToBoolean,
    "db3-trim-string" -> db3TrimString,
    "db3-numeric-to-pgsql-numeric" -> db3NumericToPgsqlNumeric,
    "db3-numeric-to-pgsql-integer" -> db3NumericToPgsqlInteger,
    "db3-date-to-pgsql-date" -> db3DateToPgsqlDate
  )
}
