package graft

import graft.operators.Validate
import graft.operators.Validate.Rule
import org.apache.spark.sql.functions._

class ValidateSpec extends SparkSpec {

  import spark.implicits._

  private lazy val staged = Seq(
    ("1", "ok"),            // clean
    ("notanint", "ok"),     // type failure
    ("3", null),            // NOT NULL failure
    ("x", null),            // both
    (null, "ok"))           // NULL in a nullable int column: fine
    .toDF("id", "name")

  private val rules = Seq(Rule("id", "int"),
    Rule("name", "string", notNull = true))

  test("preflight classifies rows and collects reasons in rule order") {
    val got = Validate.preflight(staged, rules)
      .select(col("id"), col("valid"), array_join(col("reasons"), ";"))
      .collect().map(r => (Option(r.getString(0)).getOrElse("NULL"),
        r.getBoolean(1), r.getString(2))).toSet
    assert(got == Set(
      ("1", true, ""),
      ("notanint", false, "id: invalid input for type int"),
      ("3", false, "name: null value in NOT NULL column"),
      ("x", false, "id: invalid input for type int;" +
        "name: null value in NOT NULL column"),
      ("NULL", true, "")))
  }

  test("valid/rejects split preserves the original schema") {
    assert(Validate.valid(staged, rules).columns.toSeq == Seq("id", "name"))
    assert(Validate.valid(staged, rules).count() == 2)
    assert(Validate.rejects(staged, rules).count() == 3)
  }

  test("typed rules: date, decimal, boolean acceptance") {
    val df = Seq(("2024-02-29", "1.5", "true"),
      ("2023-02-29", "abc", "maybe")).toDF("d", "m", "b")
    val rs = Seq(Rule("d", "date"), Rule("m", "decimal(10,2)"),
      Rule("b", "boolean"))
    val got = Validate.preflight(df, rs)
      .select(col("d"), size(col("reasons"))).collect()
      .map(r => (r.getString(0), r.getInt(1))).toMap
    assert(got("2024-02-29") == 0)
    assert(got("2023-02-29") == 3) // invalid leap date, number, boolean
  }

  test("reserved output columns are guarded") {
    val df = Seq(("1", "a")).toDF("id", "valid")
    val err = intercept[IllegalArgumentException] {
      Validate.preflight(df, Seq(Rule("id", "int")))
    }
    assert(err.getMessage.contains("valid"))
  }

  test("maxLength tolerates char(n) trailing-space excess") {
    val df = Seq(("abcde", "abc  "), ("toolongvalue", "ok"))
      .toDF("c1", "c2")
    val rs = Seq(Rule("c1", "string", maxLength = Some(5)),
      Rule("c2", "string", maxLength = Some(3)))
    val got = Validate.preflight(df, rs)
      .select(col("c1"), col("valid")).collect()
      .map(r => (r.getString(0), r.getBoolean(1))).toMap
    assert(got("abcde"))        // exactly 5 + c2 "abc  " rtrims to 3
    assert(!got("toolongvalue"))
  }

  test("wellEncoded rejects replacement characters") {
    val df = Seq(("fine", 1), ("bad�byte", 2)).toDF("t", "i")
    val got = Validate.preflight(df,
        Seq(Rule("t", "string", wellEncoded = true)))
      .select(col("i"), col("valid")).collect()
      .map(r => (r.getInt(0), r.getBoolean(1))).toMap
    assert(got(1) && !got(2))
  }

  test("fkSplit: MATCH SIMPLE null semantics, anti-join rejects") {
    val parent = Seq(10, 20).toDF("pid")
    val child = Seq((1, Option(10)), (2, Option(99)), (3, Option.empty[Int]))
      .toDF("id", "ref")
    val (valid, rejected) = Validate.fkSplit(child, Seq("ref"),
      parent, Seq("pid"))
    assert(valid.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 3))
    assert(rejected.collect().map(_.getInt(0)).toSeq == Seq(2))
  }

  test("rulesFor derives rules from a catalog table's target columns") {
    import graft.catalog.{ColumnDef, Table}
    import org.apache.spark.sql.types._
    val t = Table("t", columns = Seq(
      ColumnDef("id", "integer", IntegerType, nullable = false),
      ColumnDef("name", "varchar(12)", StringType),
      ColumnDef("code", "char(2)", StringType),
      ColumnDef("amount", "numeric(10,2)", DecimalType(10, 2)),
      ColumnDef("note", "text", StringType),
      // the multi-word PG spellings the cast engine preserves
      ColumnDef("city", "character varying(30)", StringType),
      ColumnDef("tag", "CHARACTER(4)", StringType)))
    val rs = Validate.rulesFor(t)
    assert(rs(0) == Rule("id", "int", notNull = true))
    assert(rs(1) == Rule("name", "string", maxLength = Some(12)))
    assert(rs(2) == Rule("code", "string", maxLength = Some(2)))
    assert(rs(3).sqlType == "decimal(10,2)")
    assert(rs(4) == Rule("note", "string"))
    assert(rs(5) == Rule("city", "string", maxLength = Some(30)))
    assert(rs(6) == Rule("tag", "string", maxLength = Some(4)))
    // and the derived rules drive a real preflight
    import spark.implicits._
    val df = Seq(("1", "ok", "ab", "3.50", null: String),
        (null, "waytoolongvalue", "abc", "x", "n"))
      .toDF("id", "name", "code", "amount", "note")
    val got = Validate.preflight(df, rs.take(5))
      .select(col("valid"), size(col("reasons"))).collect()
      .map(r => (r.getBoolean(0), r.getInt(1))).sortBy(!_._1)
    assert(got(0) == (true, 0) && got(1) == (false, 4))
  }

  test("preflight plan is one shuffle-free projection") {
    val plan = Validate.preflight(staged, rules)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"))
  }
}
