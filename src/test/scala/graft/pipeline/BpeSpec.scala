package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** BPE training + application semantics, pinned against the worked
  * example from Sennrich et al. 2016 §3.2 (the low/lower/newest/widest
  * vocabulary) and cross-checked scalar-vs-expression. */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  private val sennrich = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("train learns the textbook merges in order") {
    // counts: es=9, st=9 (tie -> lexicographic), then est, lo, low
    assert(Bpe.train(sennrich, 4) == Seq(
      ("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
  }

  test("encodeWord: 'lowest' becomes low + est (the canonical result)") {
    val rank = Bpe.train(sennrich, 4).zipWithIndex.toMap
    assert(Bpe.encodeWord("lowest", rank) == Seq("low", "est"))
    assert(Bpe.encodeWord("newest", rank) == Seq("n", "e", "w", "est"))
    assert(Bpe.encodeWord("low", rank) == Seq("low"))
    // unseen symbols stay single chars
    assert(Bpe.encodeWord("xyz", rank) == Seq("x", "y", "z"))
    assert(Bpe.encodeWord("", rank) == Seq.empty)
  }

  test("tokens always concatenate back to the word") {
    val rank = Bpe.train(sennrich, 4).zipWithIndex.toMap
    for (w <- Seq("lowest", "widest", "slowest", "owl", "a", "estestest"))
      assert(Bpe.encodeWord(w, rank).mkString == w)
  }

  test("train is bounded by numMerges and by exhaustion") {
    assert(Bpe.train(sennrich, 0) == Seq.empty)
    // a single 2-char word exhausts after one merge
    assert(Bpe.train(Seq(("ab", 1L)), 10) == Seq(("a", "b")))
  }

  test("native BpeEncode expression matches the scalar spec end-to-end") {
    val docs = Seq((1L, "the lowest and newest"), (2L, "Low, LOWER!"))
      .toDF("id", "text")
    val merges = Bpe.trainFromCorpus(docs, "text", numMerges = 3)
    val rank = merges.zipWithIndex.toMap
    val got = docs.select(col("id"), Bpe.encode(col("text"), merges)
        .as("toks")).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toList))
    def expected(t: String) = t.toLowerCase.split("[^a-z0-9']+")
      .filter(_.nonEmpty).flatMap(Bpe.encodeWord(_, rank)).toList
    assert(got.toSeq == Seq(
      (1L, expected("the lowest and newest")),
      (2L, expected("Low, LOWER!"))))
  }

  test("BpeEncode and UnicodeNormalize compile under codegen — no " +
    "silent interpreted fallback") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    // GenerateUnsafeProjection.generate compiles directly — a Janino
    // failure throws here instead of falling back to interpreted
    val rank = Bpe.train(sennrich, 4)
    val enc = graft.functions.BpeEncode(
      BoundReference(0, StringType, nullable = true), rank)
    val p1 = GenerateUnsafeProjection.generate(Seq(enc))
    val r1 = p1(InternalRow(UTF8String.fromString("the lowest")))
    assert(r1.getArray(0).toSeq[UTF8String](StringType).map(_.toString)
      == Seq("t", "h", "e", "low", "est"))
    val nrm = graft.functions.UnicodeNormalize(
      BoundReference(0, StringType, nullable = true), "NFC")
    val p2 = GenerateUnsafeProjection.generate(Seq(nrm))
    val r2 = p2(InternalRow(UTF8String.fromString("é")))
    assert(r2.getUTF8String(0).toString == "é")
  }

  test("trainFromCorpus honors the maxVocab bound deterministically") {
    val docs = Seq((1L, "aa aa aa bb bb zz")).toDF("id", "text")
    // maxVocab 2 keeps {aa(3), bb(2)}: first merge must be (a,a)
    val m = Bpe.trainFromCorpus(docs, "text", numMerges = 1,
      maxVocab = 2)
    assert(m == Seq(("a", "a")))
  }
}
