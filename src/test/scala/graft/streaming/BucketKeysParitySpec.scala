package graft.streaming

import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.SparkSpec
import graft.pipeline.Dedup

/** The streaming path's typed per-document hashing (`NearDup.bucketKeys`)
  * must stay bit-identical to the expression pipeline
  * (`lshBands ∘ minhashSignature ∘ hashedShingles`) — a seeded sweep over
  * adversarial strings (unicode words, mixed separators, edge whitespace
  * that makes Spark's split produce leading/trailing "" tokens, empty and
  * sub-k docs) pins the equality the stream/batch contract rests on. */
class BucketKeysParitySpec extends SparkSpec {

  import spark.implicits._

  test("typed bucketKeys == expression pipeline on adversarial strings") {
    val numPerms = 64; val bands = 16; val k = 3
    val saltSeeds = Dedup.permSalts(numPerms, 42L)
      .map(s => XxHash64Function.hash(s, LongType, 42L)).toArray
    val rnd = new scala.util.Random(7)
    val words = Vector("alpha", "Ω≠ascii", "b", "苹果", "héllo", "x1")
    val seps = Vector(" ", "  ", "\t", "\n ", " \r\n")
    def doc(): String = {
      val n = rnd.nextInt(8)
      val core = Vector.fill(n)(words(rnd.nextInt(words.size)))
        .mkString(seps(rnd.nextInt(seps.size)))
      (if (rnd.nextBoolean()) " " else "") + core +
        (if (rnd.nextBoolean()) "\t" else "")
    }
    val docs = (0 until 40).map(i => (i.toLong, doc()))
    val df = docs.toDF("id", "text")
    val sig = Dedup.minhashSignature(
      Dedup.hashedShingles(col("text"), k), numPerms, 42L)
    val expected = df.select(col("id"), sig.as("__sig"))
      .select(col("id"),
        explode(Dedup.lshBands(col("__sig"), bands, numPerms / bands))
          .as("bb"))
      .select(col("id"), col("bb.band"), col("bb.bucket"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val got = docs.flatMap { case (id, text) =>
      val bk = NearDup.bucketKeys(text, numPerms, bands, k, saltSeeds)
      bk.indices.map(b => (id, b, bk(b)))
    }.toSet
    assert(got == expected)
  }
}
