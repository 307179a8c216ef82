package graft

import org.apache.spark.sql.functions._
import graft.operators.DateFormat

/** PG to_char-token translation cases from the reference's format parser
  * (src/parsers/date-format.lisp:13-145). */
class DateFormatSpec extends SparkSpec {

  test("token translation") {
    assert(DateFormat.translate("YYYY-MM-DD") == "yyyy-MM-dd")
    assert(DateFormat.translate("DD/MM/YYYY HH24:MI:SS") ==
      "dd/MM/yyyy HH:mm:ss")
    // the fraction is an optional input section — PG accepts a
    // fraction-less value against a .US-bearing template
    assert(DateFormat.translate("DD/MM/YYYY HH24:MI:SS.US") ==
      "dd/MM/yyyy HH:mm:ss[.SSSSSS]")
    assert(DateFormat.translate("MM/DD/YY") == "MM/dd/yy")
    assert(DateFormat.translate("YYYYMMDD") == "yyyyMMdd")
    assert(DateFormat.translate("HH12:MI AM") == "hh:mm a")
  }

  test("translated patterns parse with Spark to_timestamp") {
    val row = evalRow(
      to_timestamp(lit("02/10/2004 15:29:52"),
        DateFormat.translate("DD/MM/YYYY HH24:MI:SS")).cast("string"),
      to_timestamp(lit("20041002"),
        DateFormat.translate("YYYYMMDD")).cast("string"),
      to_timestamp(lit("10/02/04"),
        DateFormat.translate("MM/DD/YY")).cast("string"))
    assert(row.getString(0) == "2004-10-02 15:29:52")
    assert(row.getString(1) == "2004-10-02 00:00:00")
    assert(row.getString(2) == "2004-10-02 00:00:00")
  }

  test("translate: case-insensitive tokens, quoted literals and letters") {
    // PG templates are case-insensitive: dd/mm/yyyy means day/month/year
    assert(DateFormat.translate("dd/mm/yyyy") == "dd/MM/yyyy")
    // a "..." run is literal text, quoted for the Java pattern
    assert(DateFormat.translate("YYYY-MM-DD\"T\"HH24:MI") ==
      "yyyy-MM-dd'T'HH:mm")
    // a stray letter outside the token set must be quoted too —
    // unquoted it is a Spark pattern char with a different meaning
    assert(DateFormat.translate("YYYYxMM") == "yyyy'x'MM")
    val row = evalRow(
      to_timestamp(lit("25/12/2004"),
        DateFormat.translate("dd/mm/yyyy")).cast("string"))
    assert(row.getString(0) == "2004-12-25 00:00:00")
  }

  test("translate: adjacent stray letters coalesce into ONE quoted run") {
    // per-char quoting would emit 'x''y' — which Java patterns read as
    // the literal x'y (doubled quote inside a run = apostrophe), not xy
    assert(DateFormat.translate("YYYYMMxzDD") == "yyyyMM'xz'dd")
    // stray letters merge with an adjacent "..." literal run too
    assert(DateFormat.translate("YYYY\"ab\"xMM") == "yyyy'abx'MM")
    // a stray apostrophe inside a coalesced run stays escaped
    assert(DateFormat.translate("YYYYx'zMM") == "yyyy'x''z'MM")
    val row = evalRow(
      to_timestamp(lit("2004-10xz-02"),
        DateFormat.translate("YYYY-MMxz-DD")).cast("string"))
    assert(row.getString(0) == "2004-10-02 00:00:00")
  }
}
