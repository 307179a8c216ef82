package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Byte-pair-encoding tokenizer training and application — the loop a
  * training-data pipeline closes after [[Terms.bpePairs]] shows the
  * first merge: learn `numMerges` merges from the corpus, then tokenize
  * the corpus with them, distributed. Sennrich et al. 2016 §3.2
  * (within-word merges, no end-of-word marker — consistent with
  * [[Terms.bpePairs]], documented deviation).
  *
  * Scale split: TRAINING runs on the driver over the word-count
  * VOCABULARY — the corpus compresses to distinct words first (two
  * Spark aggregates), and the collect is BOUNDED by `maxVocab` words
  * taken by count (a TakeOrdered, same bounded-collect class as k-means
  * centroids); classic BPE training is inherently iterative over that
  * table and a web-scale corpus still has a collectable head (merges
  * learned from the top 100k words differ negligibly from the full
  * tail — the tail is exactly what BPE exists to decompose).
  * APPLICATION is one native expression per row
  * ([[graft.functions.BpeEncode]]), merge ranks broadcast as a plan
  * reference object — no shuffle at all.
  */
object Bpe {

  /** Greedy merge training over (word, count) pairs: `numMerges`
    * rounds, each merging the globally highest-count adjacent symbol
    * pair (ties broken lexicographically — deterministic). Returns
    * merges in learned order. Incremental pair-count maintenance: each
    * round only re-counts words containing the merged pair. */
  def train(words: Seq[(String, Long)], numMerges: Int)
      : Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    // symbol sequences per word
    val syms = mutable.ArrayBuffer.from(
      words.map { case (w, c) => (mutable.ArrayBuffer.from(
        w.map(_.toString)), c) })
    val pairCounts = mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    // word indices containing each pair, for incremental recount
    val pairWords = mutable.Map.empty[(String, String), mutable.Set[Int]]
    def addWord(i: Int, sign: Long): Unit = {
      val (s, c) = syms(i)
      var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        pairCounts(p) += sign * c
        if (sign > 0)
          pairWords.getOrElseUpdate(p, mutable.Set.empty) += i
        j += 1
      }
    }
    syms.indices.foreach(addWord(_, 1L))
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    while (round < numMerges && pairCounts.exists(_._2 > 0)) {
      val best = pairCounts.filter(_._2 > 0)
        .minBy { case ((l, r), c) => (-c, l, r) }._1
      merges += best
      val affected = pairWords.getOrElse(best, mutable.Set.empty).toSeq
      affected.foreach { i =>
        addWord(i, -1L)
        val (s, c) = syms(i)
        val merged = mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < s.length) {
          if (j < s.length - 1 && s(j) == best._1 && s(j + 1) == best._2) {
            merged += s(j) + s(j + 1); j += 2
          } else { merged += s(j); j += 1 }
        }
        syms(i) = (merged, c)
        addWord(i, 1L)
      }
      pairCounts.remove(best)
      pairWords.remove(best)
      round += 1
    }
    merges.toSeq
  }

  /** Train from a corpus: vocabulary via two aggregates (doc-local,
    * then global), bounded driver collect of the top `maxVocab` words
    * by count (count desc, word asc — deterministic). */
  def trainFromCorpus(df: DataFrame, textCol: String,
                      numMerges: Int, maxVocab: Int = 100000)
      : Seq[(String, String)] = {
    val head = df.select(
        explode(split(lower(col(textCol)), Terms.SeparatorClass)).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxVocab)
      .collect()
    train(head.map(r => (r.getString(0), r.getLong(1))).toSeq, numMerges)
  }

  /** Scalar spec for [[graft.functions.BpeEncode]]: repeatedly merge
    * the LOWEST-RANK adjacent pair present (the standard application
    * rule — equivalent to replaying merges in learned order). */
  def encodeWord(w: String, rank: Map[(String, String), Int])
      : Seq[String] = {
    if (w.isEmpty) return Seq.empty
    var s: Vector[String] = w.map(_.toString).toVector
    var done = false
    while (!done && s.length > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var j = 0
      while (j < s.length - 1) {
        val r = rank.getOrElse((s(j), s(j + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestAt = j }
        j += 1
      }
      if (bestAt < 0) done = true
      else {
        // merge EVERY occurrence of the chosen pair, left to right
        val (l, rr) = (s(bestAt), s(bestAt + 1))
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < s.length) {
          if (i < s.length - 1 && s(i) == l && s(i + 1) == rr) {
            out += l + rr; i += 2
          } else { out += s(i); i += 1 }
        }
        s = out.result()
      }
    }
    s
  }

  /** Column form: tokenize `textCol` into an array of BPE tokens (word
    * split as in [[Terms]], then per-word merge application via the
    * native expression — one pass, no shuffle). */
  def encode(text: Column, merges: Seq[(String, String)]): Column =
    graft.functions.StringExpressions.bpeEncode(text, merges)
}
