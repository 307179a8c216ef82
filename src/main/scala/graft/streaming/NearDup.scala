package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.unsafe.types.UTF8String
import graft.pipeline.Dedup

/** Streaming near-duplicate candidate detection: MinHash+LSH over an
  * unbounded document stream with per-bucket state — the continuous
  * twin of `Dedup.minhashLsh` for a pipeline that ingests crawl
  * batches and must flag near-dups against everything already seen
  * WITHOUT re-scanning the corpus.
  *
  * Shape: each arriving document computes its (band, bucket) keys
  * ROW-LOCALLY in one typed map — no streaming aggregation, so the one
  * stateful operator is the bucket store — and `flatMapGroupsWithState`
  * keeps the ids seen per bucket. A new doc emits one candidate pair
  * per stored bucket-mate, then joins the store. Output is
  * batching-invariant: the union of emitted pairs (as min,max, deduped
  * downstream) equals the batch pipeline's bucket-join candidates no
  * matter how the stream is chopped into micro-batches — intra-batch
  * ids pair in sorted order, replays of an already-stored id emit
  * nothing.
  *
  * The per-doc hashing reproduces the expression pipeline EXACTLY
  * (xxhash64 word-tuple shingles, per-perm seeded-xxhash64 minima,
  * banding over the comma-joined per-perm minima — see
  * `Dedup.hashedShingles` / `minhashSignature` / `lshBands`, whose
  * composition is also what `NearDupStreamSpec` asserts this equals),
  * but in a tight primitive loop: the interpreted-HOF form re-entered
  * the 64-perm aggregate per band (slice inside a lambda) and even
  * with a materialization barrier paid ~3,300 boxed expression evals
  * per document, which dominated the stream's wall-clock.
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

  // Direct XXH64 statics — the exact methods xxhash64's codegen emits
  // (`XXH64.hashLong` / `hashUTF8String`), value-identical to the
  // `XxHash64Function.hash(Any, DataType, seed)` dispatch but without
  // the per-call boxing + DataType match on this ~35M-call/batch path.
  private def hashLong(v: Long, seed: Long): Long =
    XXH64.hashLong(v, seed)
  private def hashStr(s: UTF8String, seed: Long): Long =
    XXH64.hashUTF8String(s, seed)

  /** (band, bucket) keys for one document — hash-identical to
    * `lshBands(minhashSignature(hashedShingles(text,k)))`. */
  private[streaming] def bucketKeys(text: String, numPerms: Int,
                                    bands: Int, k: Int,
                                    saltSeeds: Array[Long]): Array[Long] = {
    val ws = text.split("\\s+", -1)
    // distinct hashed k-shingles (word-tuple chain, seed 42)
    val hs: Array[Long] =
      if (ws.length < k)
        Array(hashStr(UTF8String.fromString(ws.mkString(" ")), 42L))
      else {
        val out = new java.util.LinkedHashSet[java.lang.Long]()
        // convert each word to UTF8String ONCE — the shingle loop
        // otherwise re-wraps every word k times on the stream's
        // documented hot path
        val us = new Array[UTF8String](ws.length)
        var w = 0
        while (w < ws.length) { us(w) = UTF8String.fromString(ws(w)); w += 1 }
        var i = 0
        while (i <= ws.length - k) {
          var h = 42L
          var j = 0
          while (j < k) {
            h = hashStr(us(i + j), h); j += 1
          }
          out.add(h); i += 1
        }
        val arr = new Array[Long](out.size)
        val it = out.iterator(); var n = 0
        while (it.hasNext) { arr(n) = it.next(); n += 1 }
        arr
      }
    // per-perm minima of xxhash64(salt, h)
    val mins = Array.fill(numPerms)(Long.MaxValue)
    var si = 0
    while (si < numPerms) {
      var m = Long.MaxValue
      var hi = 0
      while (hi < hs.length) {
        val v = hashLong(hs(hi), saltSeeds(si))
        if (v < m) m = v
        hi += 1
      }
      mins(si) = m; si += 1
    }
    // band buckets: xxhash64 of the comma-joined minima slice
    val rowsPerBand = numPerms / bands
    val buckets = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      val sb = new java.lang.StringBuilder()
      var r = 0
      while (r < rowsPerBand) {
        if (r > 0) sb.append(',')
        sb.append(mins(b * rowsPerBand + r)); r += 1
      }
      buckets(b) = hashStr(UTF8String.fromString(sb.toString), 42L)
      b += 1
    }
    buckets
  }

  /** Horizon-bounded variant: candidate pairs whose event times lie
    * within `horizonMs` of each other — "dedup tonight's crawl against
    * the last N days" with state that EVICTS. `docs` must carry a
    * timestamp column; the watermark is declared here (typed transforms
    * strip event-time metadata, so pass the pipeline's delay as
    * `watermarkDelay`). A stored id becomes unpairable only once the
    * watermark passes
    * `ts + horizonMs`, at which point no future in-watermark document
    * can be within the horizon — eviction never drops a pair the
    * contract owes. The pair set is batching-invariant for the same
    * reasons as [[candidatePairs]], with the |Δts| ≤ horizon filter
    * applied symmetrically (late-but-in-watermark docs pair with newer
    * stored ones and vice versa).
    *
    * State per bucket: (id, tsMillis) entries, pruned on every trigger
    * against the watermark (an entry drops once watermark > ts +
    * horizon) and removed wholesale by event-time timeout when the
    * bucket goes quiet — bounded by bucket rate × horizon, the
    * streaming analog of the interval join's O(rate × horizon)
    * invariant. */
  def candidatePairsWithin(docs: DataFrame, idCol: String,
                           textCol: String, tsCol: String,
                           horizonMs: Long, watermarkDelay: String,
                           numPerms: Int = 64, bands: Int = 16,
                           k: Int = 3, seed: Long = 42L,
                           maxBucket: Int = 4096): Dataset[(Long, Long)] = {
    require(bands >= 1 && bands <= numPerms && numPerms % bands == 0,
      s"bands must divide numPerms: got numPerms=$numPerms bands=$bands")
    require(horizonMs > 0, s"horizonMs must be positive, got $horizonMs")
    val spark = docs.sparkSession
    import spark.implicits._
    val saltSeeds = Dedup.permSalts(numPerms, seed)
      .map(s => hashLong(s, 42L)).toArray
    docs
      .select(col(idCol).cast("long").as("id"),
        col(textCol).as("text"), col(tsCol).as("ts"))
      .as[(java.lang.Long, String, java.sql.Timestamp)]
      .flatMap { case (id, text, ts) =>
        if (id == null || text == null || ts == null) Iterator.empty
        else {
          val bk = bucketKeys(text, numPerms, bands, k, saltSeeds)
          Iterator.tabulate(bk.length)(b =>
            (b, bk(b), id.longValue(), ts))
        }
      }
      // the typed flatMap strips event-time metadata, so the watermark
      // (which EventTimeTimeout requires) is re-declared on the exploded
      // rows — pass the same delay the upstream pipeline uses
      .toDF("band", "bucket", "id", "ts")
      .withWatermark("ts", watermarkDelay)
      .as[(Int, Long, Long, java.sql.Timestamp)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (_: (Int, Long), it0: Iterator[(Int, Long, Long, java.sql.Timestamp)],
         state: GroupState[List[(Long, Long)]]) =>
          val it = it0.map(r => (r._1, r._2, r._3, r._4.getTime))
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val stored = state.getOption.getOrElse(Nil)
            val storedIds = stored.map(_._1).toSet
            // ONE entry per id: dedup on the id alone (first-seen ts) —
            // dedup on (id, ts) let a same-batch replay with a second
            // timestamp emit a self-pair (id, id) and store the id twice
            val fresh = it.map(r => (r._3, r._4)).toArray
              .sortBy(r => (r._1, r._2))
              .distinctBy(_._1)
              .filterNot(r => storedIds(r._1))
            val out = Seq.newBuilder[(Long, Long)]
            for ((id, ts) <- fresh) {
              stored.foreach { case (o, ots) =>
                if (math.abs(ts - ots) <= horizonMs)
                  out += ((math.min(id, o), math.max(id, o)))
              }
            }
            for (i <- fresh.indices; j <- i + 1 until fresh.length)
              if (math.abs(fresh(i)._2 - fresh(j)._2) <= horizonMs)
                out += ((fresh(i)._1, fresh(j)._1))
            // state maintenance runs UNCONDITIONALLY — not only when
            // fresh ids arrived: Spark cancels a group's timeout on any
            // invocation that does not re-register it, so a replay-only
            // batch (fresh empty after the storedIds filter) would
            // otherwise disable eviction for the bucket forever.
            // Prune against the WATERMARK, not the newest entry: an
            // entry is safe to drop only once watermark > ts + horizon
            // (no admissible future row can then be within horizon of
            // it — a newer bucket-mate proves nothing about what late
            // rows the watermark still admits)
            val wm = state.getCurrentWatermarkMs()
            // cap policy = the class contract: STORED in-horizon ids
            // are never evicted for fresh ones (a newest-first take
            // would drop entries the watermark still owes pairs for);
            // fresh ids are admitted newest-first into remaining room
            val prunedStored = stored.filter(_._2 + horizonMs >= wm)
            val admitted = fresh.toList
              .filter(_._2 + horizonMs >= wm)
              .sortBy(r => (-r._2, r._1))
              .take(math.max(0, maxBucket - prunedStored.size))
            val kept = (prunedStored ::: admitted)
              .sortBy(r => (-r._2, r._1))
            if (kept.isEmpty) {
              if (state.exists) state.remove()
            } else {
              state.update(kept)
              // timeouts are NOT sticky — they must be re-registered
              // every invocation, and registering at <= the current
              // watermark throws; expiry == wm (an entry exactly at
              // the eviction boundary) must still get a timeout or a
              // quiet bucket's state leaks forever
              val expiry = kept.map(_._2).max + horizonMs
              state.setTimeoutTimestamp(math.max(expiry, wm + 1))
            }
            out.result().iterator
          }
      }
  }

  /** (id_a, id_b) candidate pairs (id_a < id_b), possibly repeated
    * across bands/batches — `.distinct()` after the sink. */
  def candidatePairs(docs: DataFrame, idCol: String, textCol: String,
                     numPerms: Int = 64, bands: Int = 16, k: Int = 3,
                     seed: Long = 42L,
                     maxBucket: Int = 4096): Dataset[(Long, Long)] = {
    require(bands >= 1 && bands <= numPerms && numPerms % bands == 0,
      s"bands must divide numPerms: got numPerms=$numPerms bands=$bands")
    val spark = docs.sparkSession
    import spark.implicits._
    // pre-fold each salt with the leading-literal position of
    // xxhash64(salt, h): hash(salt, 42) is the seed h is hashed with
    val saltSeeds = Dedup.permSalts(numPerms, seed)
      .map(s => hashLong(s, 42L)).toArray
    docs
      .select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(java.lang.Long, String)]
      .flatMap { case (id, text) =>
        if (id == null || text == null) Iterator.empty
        else {
          val bk = bucketKeys(text, numPerms, bands, k, saltSeeds)
          Iterator.tabulate(bk.length)(b => (b, bk(b), id.longValue()))
        }
      }
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
