package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`/`Array[Double]`). Extension surface beyond the
  * reference, Spark-first: dot products via `zip_with`+`aggregate`
  * (codegen'd), top-k via window rank, and an LSH-bucketed scale path that
  * turns the cross product into a hash join.
  */
object Similarity {

  /** Dot product of two numeric array columns — a native Catalyst
    * expression ([[graft.functions.VecDot]]) with fused codegen: one loop
    * over the two ArrayData buffers, no intermediate zipped array.
    * Bit-identical to the previous `aggregate(zip_with(...))` spelling
    * (double widening, index-order accumulation from +0.0). */
  def dot(a: Column, b: Column): Column =
    graft.functions.VecExpressions.vecDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: every query scored against every corpus
    * vector. Baseline / oracle path. The queries side MUST be small — it is
    * broadcast, so the corpus is never shuffled, only scanned: at 100 TB
    * corpus scale this is one pass, embarrassingly parallel. Ties broken by
    * corpus id for determinism. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     qId: String = "q_id", qVec: String = "q_vec",
                     cId: String = "c_id", cVec: String = "c_vec")
      : DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .select(col(qId), col(cId), cosine(col(qVec), col(cVec)).as("cosine"))
    val w = Window.partitionBy(col(qId))
      .orderBy(col("cosine").desc, col(cId).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** LSH-bucketed ANN: corpus and queries hashed by random-hyperplane
    * signature; only same-bucket pairs are scored. `probes=0` uses the
    * exact bucket; `probes=n` additionally probes buckets at Hamming
    * distance 1 in the first n bits (recall knob).
    *
    * Scale shape: the corpus is bucketed once (can be persisted /
    * Z-ordered by bucket); each query joins to its bucket — a broadcast
    * hash join on the bucket key instead of a full scan per query.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, dim: Int,
              planes: Int = 12, probes: Int = 4, seed: Long = 42L,
              qId: String = "q_id", qVec: String = "q_vec",
              cId: String = "c_id", cVec: String = "c_vec"): DataFrame = {
    val cb = corpus.withColumn("bucket",
      Dedup.hyperplaneSignature(col(cVec), dim, planes, seed))
    val qSig = Dedup.hyperplaneSignature(col(qVec), dim, planes, seed)
    // multi-probe: the signature itself + flipping each of the first
    // `probes` bits
    val probeBuckets = array(
      (qSig +: (0 until probes).map(b => qSig.bitwiseXOR(lit(1L << b)))): _*)
    val qb = queries.withColumn("bucket", explode(probeBuckets))
    val scored = qb.join(cb, Seq("bucket"))
      .select(col(qId), col(cId), cosine(col(qVec), col(cVec)).as("cosine"))
      .distinct()
    val w = Window.partitionBy(col(qId))
      .orderBy(col("cosine").desc, col(cId).asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Per-vector symmetric int8 quantization scale: max |element| as a
    * double. Zero vectors get scale 0 (see [[quantizeInt8]]). */
  def int8Scale(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double"))))

  /** Symmetric int8 quantization of an embedding: q_i =
    * round-half-up(v_i * 127 / scale), spelled `floor(x + 0.5)` so both
    * the rounding rule and every intermediate are single IEEE-754
    * double operations — any engine reproduces the exact integers (no
    * banker's-rounding or decimal-context divergence). Zero vectors
    * (scale 0) quantize to all zeros instead of dividing by zero.
    *
    * 4× storage cut for ANN candidate generation; pure codegen'd
    * Column expression, no shuffle. Dequantize with q * scale / 127.
    */
  def quantizeInt8(vec: Column, scale: Column): Column =
    transform(vec, x =>
      when(scale === 0.0d, lit(0L))
        .otherwise(floor(x.cast("double") * 127.0d / scale + 0.5d)))

  /** IVF-style ANN: corpus assigned to the nearest of `centroids`; queries
    * probe the `nprobe` nearest centroids. Centroids are a small broadcast
    * table (id, vec). */
  def ivfTopK(queries: DataFrame, corpus: DataFrame,
              centroids: DataFrame, k: Int, nprobe: Int = 2,
              qId: String = "q_id", qVec: String = "q_vec",
              cId: String = "c_id", cVec: String = "c_vec",
              ctId: String = "ct_id", ctVec: String = "ct_vec")
      : DataFrame = {
    def assign(df: DataFrame, vec: String, n: Int, out: String) = {
      val w = Window.partitionBy(df.columns.head, vec)
      val scored = df.crossJoin(broadcast(centroids))
        .withColumn("__d", cosine(col(vec), col(ctVec)))
      val ww = Window.partitionBy(df.columns.map(col): _*)
        .orderBy(col("__d").desc, col(ctId).asc)
      scored.withColumn("__r", row_number().over(ww))
        .filter(col("__r") <= n)
        .withColumnRenamed(ctId, out)
        .drop(ctVec, "__d", "__r")
    }
    val cAssigned = assign(corpus, cVec, 1, "cell")
    val qAssigned = assign(queries, qVec, nprobe, "cell")
    val scored = qAssigned.join(cAssigned, Seq("cell"))
      .select(col(qId), col(cId), cosine(col(qVec), col(cVec)).as("cosine"))
    val w = Window.partitionBy(col(qId))
      .orderBy(col("cosine").desc, col(cId).asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
