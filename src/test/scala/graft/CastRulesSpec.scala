package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.casting._

/** Cast-rule engine expectations, mirroring the reference's `test-casts`
  * smoke cases (src/sources/mysql/mysql-cast-rules.lisp:319-379) plus the
  * MySQL 8.0.19+ typemod-less auto_increment fallback. Pure — no Spark. */
class CastRulesSpec extends AnyFunSuite {

  private def my(ctype: String, default: Option[String] = None,
                 nullable: Boolean = true, autoInc: Boolean = false) =
    CastEngine.cast(
      SourceColumn("t", "c", ctype, default, nullable, autoInc),
      Nil, DefaultCastRules.mysql)

  test("int auto_increment: display width decides serial vs bigserial") {
    assert(my("int(7)", autoInc = true).pgType == "serial")
    assert(my("int(7)", autoInc = true).sparkType == IntegerType)
    assert(my("int(10)", autoInc = true).pgType == "bigserial")
    assert(my("int(10)", autoInc = true).sparkType == LongType)
    assert(my("bigint(20)", autoInc = true).pgType == "bigserial")
  }

  test("MySQL 8.0.19+ typemod-less int auto_increment still maps to serial") {
    assert(my("int", autoInc = true).pgType == "serial")
    assert(my("int unsigned", autoInc = true).pgType == "bigserial")
  }

  test("tinyint(1) is boolean, other tinyints are smallint") {
    val b = my("tinyint(1)")
    assert(b.pgType == "boolean" && b.sparkType == BooleanType)
    assert(b.transform.nonEmpty) // tinyint-to-boolean
    assert(my("tinyint(4)").pgType == "smallint")
    assert(my("tinyint(4)").sparkType == ShortType)
  }

  test("unsigned promotions") {
    assert(my("tinyint(3) unsigned").pgType == "smallint")
    assert(my("smallint(5) unsigned").pgType == "integer")
    assert(my("int(10) unsigned").pgType == "bigint")
    val big = my("bigint(20) unsigned")
    assert(big.pgType == "numeric" && big.sparkType == DecimalType(20, 0))
  }

  test("text family strips NUL characters") {
    val v = my("varchar(25)")
    assert(v.pgType == "text" && v.transform.nonEmpty)
    assert(my("longtext").pgType == "text")
  }

  test("zero-date defaults are dropped, transform attached") {
    val dt = my("datetime", default = Some("0000-00-00 00:00:00"))
    assert(dt.pgType == "timestamptz" && dt.sparkType == TimestampType)
    assert(dt.default.isEmpty && dt.transform.nonEmpty)
    val d = my("date", default = Some("0000-00-00"), nullable = false)
    assert(d.pgType == "date" && d.default.isEmpty && !d.nullable)
    // non-zero defaults survive
    val keep = my("datetime", default = Some("2004-10-02 00:00:00"))
    assert(keep.default.contains("2004-10-02 00:00:00"))
  }

  test("numeric/decimal keep their typemod") {
    val n = my("numeric(18,3)")
    assert(n.pgType == "numeric(18,3)" && n.sparkType == DecimalType(18, 3))
    val d = my("decimal(15,5)")
    assert(d.pgType == "numeric(15,5)" && d.sparkType == DecimalType(15, 5))
  }

  test("floats, year, enum/set, geometry, json") {
    assert(my("float(12,2)").pgType == "real")
    assert(my("double unsigned").pgType == "double precision")
    assert(my("year(4)").pgType == "integer")
    assert(my("enum('a','b')").pgType == "enum")
    val s = my("set('a','b')")
    assert(s.pgType == "enum[]" && s.transform.nonEmpty)
    assert(my("point").pgType == "point")
    assert(my("linestring").pgType == "path")
    assert(my("json").pgType == "jsonb")
  }

  test("binary family maps to bytea with hex transform") {
    val b = my("varbinary(255)")
    assert(b.pgType == "bytea" && b.sparkType == BinaryType &&
      b.transform.nonEmpty)
    assert(my("longblob").pgType == "bytea")
  }

  test("unknown types pass through with the source type name") {
    val u = my("geometrycollection")
    assert(u.pgType == "geometrycollection")
  }

  test("user rules take precedence over defaults") {
    val user = Seq(CastRule(
      RuleSource(typeName = Some("varchar")),
      Some(RuleTarget("varchar", StringType, keepTypemod = true))))
    val r = CastEngine.cast(SourceColumn("t", "c", "varchar(25)"),
      user, DefaultCastRules.mysql)
    assert(r.pgType == "varchar(25)")
  }

  test("column-scoped using-only rule contributes its transform") {
    // the reference's test case: a :using-only rule on ("table" . "g")
    // adds empty-string-to-null to whatever rule matches the type
    val user = Seq(CastRule(
      RuleSource(column = Some(("t", "c"))),
      None, Some("empty-string-to-null")))
    val r = CastEngine.cast(SourceColumn("t", "c", "enum('a','b')"),
      user, DefaultCastRules.mysql)
    assert(r.pgType == "enum" && r.transform.nonEmpty)
  }

  test("sqlite defaults: typed-value stringification and loose timestamps") {
    def sq(ctype: String) = CastEngine.cast(
      SourceColumn("t", "c", ctype), Nil, DefaultCastRules.sqlite)
    val i = sq("integer")
    assert(i.pgType == "bigint" && i.transform.nonEmpty)
    val ts = sq("datetime")
    assert(ts.pgType == "timestamptz" && ts.transform.nonEmpty)
    assert(sq("clob").pgType == "text")
    assert(sq("numeric(10,2)").pgType == "numeric(10,2)")
  }

  test("mssql defaults: identity, uuid endianness transform, money") {
    def ms(ctype: String, autoInc: Boolean = false) = CastEngine.cast(
      SourceColumn("t", "c", ctype, autoIncrement = autoInc),
      Nil, DefaultCastRules.mssql)
    assert(ms("int", autoInc = true).pgType == "serial")
    assert(ms("smallint", autoInc = true).pgType == "smallserial")
    val u = ms("uniqueidentifier")
    assert(u.pgType == "uuid" && u.transform.nonEmpty)
    assert(ms("money").sparkType == DecimalType(19, 4))
    assert(ms("nvarchar(50)").pgType == "text")
    assert(ms("rowversion").pgType == "bytea")
  }

  test("pgsql defaults: identity and varchar relaxation") {
    def pg(ctype: String, autoInc: Boolean = false) = CastEngine.cast(
      SourceColumn("t", "c", ctype, autoIncrement = autoInc),
      Nil, DefaultCastRules.pgsql)
    assert(pg("integer", autoInc = true).pgType == "serial")
    assert(pg("character varying").pgType == "text")
  }
}
