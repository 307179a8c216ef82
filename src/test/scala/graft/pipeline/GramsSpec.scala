package graft.pipeline

import org.apache.spark.sql.Row
import graft.SparkSpec

/** Pins the exact row semantics of Grams.positioned against a
  * straightforward driver-side sliding window over the same
  * tokenization (`split(text, "\\s+")` with Spark's keep-trailing-empty
  * limit = -1). Every n-gram consumer (minhash shingles, PPJoin,
  * duplicated spans, decontamination, source overlap) depends on these
  * rows being position-complete and nothing else. */
class GramsSpec extends SparkSpec {

  import spark.implicits._

  private def expected(id: Long, text: String, n: Int): Seq[Row] =
    if (text == null) Seq.empty
    else {
      val ws = text.split("\\s+", -1)
      (0 to ws.length - n).map { i =>
        Row.fromSeq(id +: i +: (0 until n).map(j => ws(i + j)))
      }
    }

  private def run(rows: Seq[(Long, String)], n: Int,
                  extra: Seq[String] = Nil): Seq[Row] = {
    val df = rows.toDF("doc_id", "text")
    Grams.positioned(df, "doc_id", "text", n, extra)
      .orderBy("id", "pos").collect().toSeq
  }

  test("trigrams over a plain sentence are position-complete") {
    assert(run(Seq((7L, "a b c d e")), 3) == Seq(
      Row(7L, 0, "a", "b", "c"), Row(7L, 1, "b", "c", "d"),
      Row(7L, 2, "c", "d", "e")))
  }

  test("docs shorter than n produce no rows; null text produces none") {
    assert(run(Seq((1L, "a b"), (2L, null)), 3).isEmpty)
  }

  test("n=1 keeps every token, including empties from edge whitespace") {
    // Spark's split keeps a leading "" (before the first separator) and
    // a trailing "" (limit -1) — unigrams must surface both
    assert(run(Seq((1L, " a b ")), 1) == Seq(
      Row(1L, 0, ""), Row(1L, 1, "a"), Row(1L, 2, "b"), Row(1L, 3, "")))
  }

  test("extra columns ride through unchanged next to the id") {
    val df = Seq((1L, "s0", "x y z")).toDF("doc_id", "src", "text")
    val r = Grams.positioned(df, "doc_id", "text", 2, Seq("src"))
      .orderBy("pos").collect().toSeq
    assert(r == Seq(Row(1L, "s0", 0, "x", "y"), Row(1L, "s0", 1, "y", "z")))
  }

  test("property: rows equal a driver-side sliding window, n in 1..4") {
    val rnd = new scala.util.Random(42)
    val words = Vector("aa", "b", "ccc", "dd", "e")
    val seps = Vector(" ", "  ", "\t", " \n")
    def doc(): String = {
      val k = rnd.nextInt(13)
      Vector.fill(k)(words(rnd.nextInt(words.size)))
        .mkString(seps(rnd.nextInt(seps.size)))
    }
    for (trial <- 1 to 20; n <- 1 to 4) {
      val rows = (0 until 5).map(i => (i.toLong, doc()))
      val exp = rows.flatMap { case (id, t) => expected(id, t, n) }
      assert(run(rows, n) == exp, s"trial=$trial n=$n rows=$rows")
    }
  }
}
