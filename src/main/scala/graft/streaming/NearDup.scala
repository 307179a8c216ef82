package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.pipeline.Dedup

/** Streaming near-duplicate candidate detection: MinHash+LSH over an
  * unbounded document stream with per-bucket state — the continuous
  * twin of `Dedup.minhashLsh` for a pipeline that ingests crawl
  * batches and must flag near-dups against everything already seen
  * WITHOUT re-scanning the corpus.
  *
  * Shape: each arriving document computes its signature ROW-LOCALLY
  * (the column-form `minhashSignature` — no streaming aggregation, so
  * the one stateful operator is the bucket store), explodes to
  * (band, bucket) keys, and `flatMapGroupsWithState` keeps the ids
  * seen per bucket. A new doc emits one candidate pair per stored
  * bucket-mate, then joins the store. Output is batching-invariant:
  * the union of emitted pairs (as min,max, deduped downstream) equals
  * the batch pipeline's bucket-join candidates no matter how the
  * stream is chopped into micro-batches — intra-batch ids pair in
  * sorted order, replays of an already-stored id emit nothing.
  *
  * State per key is a bounded id list: `maxBucket` caps degenerate
  * buckets (boilerplate shingle floods); past the cap a new id still
  * pairs against the stored ids but is not added, trading recall
  * among the flood's tail for hard-bounded state — the documented
  * policy, matching the batch pipeline's assumption that hot buckets
  * are salted upstream.
  *
  * Candidates are verified OUTSIDE the stream by exact jaccard
  * against the corpus store (`Dedup.verifyPairs`) — verification
  * needs shingle sets, which would make unbounded per-bucket state
  * corpus-sized; a pair-rate this low is exactly what a stream-batch
  * join is for.
  */
object NearDup {

  /** (id_a, id_b) candidate pairs (id_a < id_b), possibly repeated
    * across bands/batches — `.distinct()` after the sink. */
  def candidatePairs(docs: DataFrame, idCol: String, textCol: String,
                     numPerms: Int = 64, bands: Int = 16, k: Int = 3,
                     seed: Long = 42L,
                     maxBucket: Int = 4096): Dataset[(Long, Long)] = {
    require(numPerms % bands == 0,
      s"bands ($bands) must divide numPerms ($numPerms)")
    val spark = docs.sparkSession
    import spark.implicits._
    val sig = Dedup.minhashSignature(
      Dedup.hashedShingles(col(textCol), k), numPerms, seed)
    docs
      .select(col(idCol).cast("long").as("id"), sig.as("__sig"))
      // materialization barrier: `lshBands` reads the signature once per
      // band inside an interpreted HOF lambda, and CollapseProject would
      // otherwise inline the whole `numPerms`-aggregate into that lambda
      // — recomputing the signature `bands` times per row (measured 40×
      // wall on the sf0.1 stream). The repartition pins `__sig` to an
      // attribute; the exchange is narrow (id + numPerms longs) and the
      // stateful operator shuffles on (band, bucket) right after anyway.
      .repartition(col("id"))
      .select(col("id"),
        explode(Dedup.lshBands(col("__sig"), bands,
          numPerms / bands)).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bucket").as("bucket"),
        col("id"))
      .as[(Int, Long, Long)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (_: (Int, Long), it: Iterator[(Int, Long, Long)],
         state: GroupState[List[Long]]) =>
          val stored = state.getOption.getOrElse(Nil)
          val storedSet = stored.toSet
          // sorted so intra-batch pair emission is batching-invariant
          val fresh = it.map(_._3).toArray.distinct.sorted
            .filterNot(storedSet)
          val out = Seq.newBuilder[(Long, Long)]
          var acc = stored
          var accSize = stored.size
          for (id <- fresh) {
            stored.foreach(o =>
              out += ((math.min(id, o), math.max(id, o))))
            if (accSize < maxBucket) { acc = id :: acc; accSize += 1 }
          }
          // intra-batch pairs among the fresh ids themselves
          for (i <- fresh.indices; j <- i + 1 until fresh.length)
            out += ((fresh(i), fresh(j)))
          if (fresh.nonEmpty) state.update(acc)
          out.result().iterator
      }
  }
}
