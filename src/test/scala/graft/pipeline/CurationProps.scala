package graft.pipeline

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.Parameters
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.SparkSpec
import graft.functions.StringExpressions

/** Invariant properties for the round-12 curation additions. Spark jobs
  * per case are expensive, so the DataFrame properties run few cases
  * over BATCHES of generated documents; the scalar UnicodeNormalize
  * properties run the full default 100. */
object CurationProps extends Properties("Curation12") {

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(5)

  // documents over a tiny vocabulary, so paragraphs genuinely repeat
  private val word: Gen[String] = Gen.oneOf("aa", "bb", "cc", "dd")
  private val para: Gen[String] =
    Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
  private val doc: Gen[String] =
    Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, para))
      .map(_.mkString("\n\n"))
  private val corpus: Gen[Seq[(Long, String)]] =
    Gen.choose(2, 8).flatMap(n => Gen.listOfN(n, doc))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })

  private def dedup(rows: Seq[(Long, String)]) =
    Curation.paragraphDedup(rows.toDF("id", "text"), "id", "text")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

  property("paragraphDedup is idempotent") = forAll(corpus) { rows =>
    val once = dedup(rows)
    val twice = dedup(once.map(r => (r._1, r._2)))
    Prop(once.map(r => (r._1, r._2)).sameElements(
      twice.map(r => (r._1, r._2))))
  }

  property("paragraphDedup keeps each distinct paragraph exactly once " +
    "and only drops repeats") = forAll(corpus) { rows =>
    val out = dedup(rows)
    val keptParas = out.flatMap(r =>
      r._2.split("\n\n", -1).filter(_.nonEmpty))
    val distinctIn = rows.flatMap(_._2.split("\n\n", -1)).distinct
    // every surviving paragraph is unique corpus-wide, and the
    // surviving set IS the distinct input set
    Prop(keptParas.length == keptParas.distinct.length &&
      keptParas.sorted.sameElements(distinctIn.sorted))
  }

  property("paragraphDedup counts: n_kept <= n_paras, totals conserve") =
    forAll(corpus) { rows =>
      val out = dedup(rows)
      Prop(out.forall(r => r._4 <= r._3) &&
        out.map(_._4).sum == rows.flatMap(_._2.split("\n\n", -1))
          .distinct.length)
    }

  property("bm25TopK is invariant under input partitioning") =
    forAll(corpus) { rows =>
      val docs = rows.map { case (i, t) => (i, t.replace("\n\n", " ")) }
      val qs = Seq((1, "aa bb")).toDF("qid", "q")
      def run(df: org.apache.spark.sql.DataFrame) =
        Retrieval.bm25TopK(df, "id", "text", qs, "qid", "q", k = 100)
          .orderBy("qid", "rank").collect()
          .map(r => (r.getLong(1), r.getLong(2), r.getInt(3))).toSeq
      val a = run(docs.toDF("id", "text"))
      val b = run(docs.toDF("id", "text").repartition(7))
      Prop(a == b)
    }

}

/** Scalar [[graft.functions.UnicodeNormalize]] properties — no Spark
  * job per case, so these run the full default case count. */
object UnicodeNormalizeProps extends Properties("UnicodeNormalize") {

  private val uChar: Gen[Char] = Gen.frequency(
    4 -> Gen.alphaNumChar,
    2 -> Gen.oneOf('́', '̈', 'é', 'Å', 'Å'),
    1 -> Gen.oneOf('１', '①', 'ﬁ'),
    1 -> Gen.asciiPrintableChar)
  private val uStr: Gen[String] = Gen.listOf(uChar).map(_.mkString)

  private def norm(s: String, f: String): String =
    StringExpressions.unicodeNormalize(
      UTF8String.fromString(s), java.text.Normalizer.Form.valueOf(f))
      .toString

  property("unicodeNormalize matches java.text.Normalizer on all forms") =
    forAll(uStr, Gen.oneOf("NFC", "NFD", "NFKC", "NFKD")) { (s, f) =>
      Prop(norm(s, f) == java.text.Normalizer.normalize(s,
        java.text.Normalizer.Form.valueOf(f)))
    }

  property("unicodeNormalize is idempotent per form") =
    forAll(uStr, Gen.oneOf("NFC", "NFD", "NFKC", "NFKD")) { (s, f) =>
      val once = norm(s, f)
      Prop(norm(once, f) == once)
    }
}
