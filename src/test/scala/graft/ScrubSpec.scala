package graft

import graft.pipeline.Scrub
import org.apache.spark.sql.functions._

class ScrubSpec extends SparkSpec {

  private val sample =
    "mail a@b.co or bob.smith+x@corp.example.org, host 10.0.255.1, " +
      "call 555-123-4567 or 555.987.6543, ssn 123-45-6789, v1.2 is fine"

  test("piiCount finds each category exactly") {
    import spark.implicits._
    val df = Seq((1L, sample)).toDF("id", "text")
    val got = df.select(
      Scrub.piiRules.map(r =>
        Scrub.piiCount(col("text"), r).as(r.name)): _*).head()
    assert(got.getInt(0) == 2, "emails")
    assert(got.getInt(1) == 1, "ssn")
    assert(got.getInt(2) == 2, "phones")
    assert(got.getInt(3) == 1, "ipv4")
  }

  test("redact masks every category and is idempotent") {
    import spark.implicits._
    val df = Seq((1L, sample)).toDF("id", "text")
    val once = df.select(Scrub.redact(col("text")).as("t")).head().getString(0)
    assert(once ==
      "mail <EMAIL> or <EMAIL>, host <IP>, call <PHONE> or <PHONE>, " +
        "ssn <SSN>, v1.2 is fine")
    val twice = df.select(Scrub.redact(Scrub.redact(col("text"))).as("t"))
      .head().getString(0)
    assert(twice == once)
  }

  test("ssn-shaped ids are not swallowed by the phone rule") {
    import spark.implicits._
    val df = Seq((1L, "123-45-6789 then 123-456-7890")).toDF("id", "text")
    val got = df.select(Scrub.redact(col("text")).as("t")).head().getString(0)
    assert(got == "<SSN> then <PHONE>")
  }

  test("version strings and decimals survive redaction") {
    import spark.implicits._
    val df = Seq((1L, "pi is 3.14, release 2.7.1, range 1.5-2.5"))
      .toDF("id", "text")
    val got = df.select(Scrub.redact(col("text")).as("t")).head().getString(0)
    assert(got == "pi is 3.14, release 2.7.1, range 1.5-2.5")
  }
}
