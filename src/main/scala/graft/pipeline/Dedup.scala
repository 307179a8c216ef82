package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for large-scale corpus curation. These have no
  * reference equivalent (pgloader is pure ETL) — they are the
  * training-data-pipeline extension surface, designed Spark-first:
  * every step is `functions._` higher-order expressions (codegen'd, no
  * UDFs), and every candidate-generation step is a hash-partitioned
  * groupBy/join so it scales horizontally — no driver-side loops, no
  * cross joins.
  */
object Dedup {

  /** Exact dedup: keep the smallest id per identical key. One shuffle on
    * the (hashed) key. At 100 TB: group on a 64-bit hash of the text, not
    * the text itself, to keep shuffle rows narrow. */
  def exact(df: DataFrame, idCol: String, keyCol: String): DataFrame =
    df.select(col(idCol), col(keyCol), xxhash64(col(keyCol)).as("__h"))
      .groupBy(col("__h"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))
      .drop("__h")

  /** Word k-shingles of a text column: `["w1 w2 w3", "w2 w3 w4", …]`. */
  def shingles(text: Column, k: Int): Column = {
    val toks = split(text, "\\s+")
    when(size(toks) < k, array(array_join(toks, " ")))
      .otherwise(transform(
        sequence(lit(0), size(toks) - k),
        i => array_join(slice(toks, i + 1, lit(k)), " ")))
  }

  // MinHash parameters: h_i(x) = (a_i * x + b_i) mod p, deterministic
  // seeds. Magnitudes chosen so a*h+b < 2^63 stays overflow-free under
  // ANSI arithmetic: h masked to 32 bits, a < 2^30, b < 2^30.
  private val MersennePrime = (1L << 61) - 1
  private def perms(n: Int, seed: Long): Seq[(Long, Long)] = {
    val r = new java.util.Random(seed)
    Seq.fill(n)((r.nextInt((1 << 30) - 1).toLong + 1,
                 r.nextInt(1 << 30).toLong))
  }

  /** MinHash signature (array of `numPerms` longs) over word k-shingles.
    * Entirely within whole-stage codegen: shingle → xxhash64 → per-perm
    * affine min-reduce via `aggregate`. */
  def minhashSignature(text: Column, numPerms: Int = 128, k: Int = 3,
                       seed: Long = 42L): Column = {
    val hashes = transform(shingles(text, k),
      s => xxhash64(s).bitwiseAND(lit(0xFFFFFFFFL)))
    val ps = perms(numPerms, seed)
    array(ps.map { case (a, b) =>
      aggregate(hashes, lit(Long.MaxValue),
        (acc, h) => least(acc, pmod(h * a + b, lit(MersennePrime))))
    }: _*)
  }

  /** LSH banding: explode the signature into `bands` (bandId, bandHash)
    * rows. Docs sharing any band bucket are near-dup candidates. */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      struct(b.as("band"),
        xxhash64(array_join(
          transform(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)),
            _.cast("string")), ",")).as("bucket")))

  /** MinHash+LSH near-duplicate pairs with exact-Jaccard verification.
    *
    * Scale shape: signature is a narrow projection; the bucket join
    * shuffles only (band, bucket, id); candidate pairs are verified by
    * re-joining the shingle sets — at 1000 executors each step is an
    * ordinary hash shuffle, and hot buckets can be salted upstream.
    *
    * @return (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold
    */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
                 numPerms: Int = 128, bands: Int = 32, k: Int = 3,
                 threshold: Double = 0.5): DataFrame = {
    val rowsPerBand = numPerms / bands
    val withSig = df.select(
      col(idCol).as("id"),
      array_distinct(shingles(col(textCol), k)).as("sh"),
      minhashSignature(col(textCol), numPerms, k).as("sig"))
      .cache()
    val buckets = withSig.select(col("id"),
        explode(lshBands(col("sig"), bands, rowsPerBand)).as("bb"))
      .select(col("id"), col("bb.band").as("band"),
        col("bb.bucket").as("bucket"))
    val cand = buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") &&
        col("x.bucket") === col("y.bucket") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    val withSets = cand
      .join(withSig.select(col("id"), col("sh").as("sh_a")),
        cand("id_a") === col("id"))
      .drop("id")
      .join(withSig.select(col("id"), col("sh").as("sh_b")),
        col("id_b") === col("id"))
      .drop("id")
    withSets.select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
         size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash over whitespace tokens: bit b is the sign of the sum of
    * ±1 votes from each token hash's bit b. */
  def simhash(text: Column): Column = {
    val toks = split(text, "\\s+")
    val hs = transform(toks, t => xxhash64(t))
    // per-bit vote: sum over tokens of (bit set ? 1 : -1), then pack signs
    val bits = transform(sequence(lit(0), lit(63)), b =>
      when(aggregate(hs, lit(0L), (acc, h) =>
        acc + when(call_function("shiftright", h, b).bitwiseAND(1) === 1, 1L)
          .otherwise(-1L)) > 0, lit(1L)).otherwise(lit(0L)))
    aggregate(zip_with(bits, sequence(lit(0), lit(63)),
      (bit, i) => call_function("shiftleft", bit, i)), lit(0L),
      (acc, v) => acc.bitwiseOR(v))
  }

  /** SimHash near-dup candidates: band the 64 bits into 4×16-bit keys;
    * pairs sharing a band differ by <= hammingMax bits are near-dups. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   hammingMax: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol).as("id"),
      simhash(col(textCol)).as("sig")).cache()
    val banded = sigs.select(col("id"), col("sig"),
      explode(array((0 until 4).map(b => struct(lit(b).as("band"),
        shiftright(col("sig"), b * 16).bitwiseAND(0xFFFFL).as("key"))): _*))
        .as("bk"))
      .select(col("id"), col("sig"), col("bk.band"), col("bk.key"))
    val popcnt = (c: Column) => bit_count(c)
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        popcnt(col("x.sig").bitwiseXOR(col("y.sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= hammingMax)
  }

  /** Exact n-gram Jaccard similarity join via an inverted index: explode
    * shingles, self-join on the shingle hash, count shared shingles per
    * pair, jaccard = shared / (|A| + |B| - shared). Finds EVERY pair with
    * jaccard >= threshold (> 0) — no candidate-generation recall loss.
    *
    * Scale shape: the explode+groupBy is the textbook similarity join;
    * shuffle volume is Σ|shingle set| rows of (hash, id, size). At 100 TB
    * add prefix filtering (only index each set's rarest shingles) to bound
    * the join fan-out; exactness is preserved when keeping
    * ceil((1-t)·|set|)+1 prefix shingles. */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, threshold: Double = 0.3): DataFrame = {
    val sets = df.select(col(idCol).as("id"),
      array_distinct(shingles(col(textCol), n)).as("sh"))
      .withColumn("sz", size(col("sh")))
    val inv = sets.select(col("id"), col("sz"),
      explode(transform(col("sh"), s => xxhash64(s))).as("g"))
    inv.as("x").join(inv.as("y"),
        col("x.g") === col("y.g") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"),
        col("x.sz").as("sz_a"), col("y.sz").as("sz_b"))
      .agg(count(lit(1)).as("shared"))
      .select(col("id_a"), col("id_b"),
        (col("shared").cast("double") /
         (col("sz_a") + col("sz_b") - col("shared")).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Embedding cosine near-dup: LSH over random hyperplane sign bits →
    * bucket join → exact cosine verify. Deterministic planes from `seed`. */
  def embeddingNearDup(df: DataFrame, idCol: String, vecCol: String,
                       dim: Int, planes: Int = 16, threshold: Double = 0.9,
                       seed: Long = 42L): DataFrame = {
    val sigCol = hyperplaneSignature(col(vecCol), dim, planes, seed)
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      sigCol.as("bucket")).cache()
    vecs.as("x").join(vecs.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        Similarity.cosine(col("x.v"), col("y.v")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Pack the sign bits of `planes` random-hyperplane dot products. */
  def hyperplaneSignature(vec: Column, dim: Int, planes: Int,
                          seed: Long): Column = {
    val rnd = new java.util.Random(seed)
    val hp: Seq[Array[Double]] =
      Seq.fill(planes)(Array.fill(dim)(rnd.nextGaussian()))
    val bits = hp.zipWithIndex.map { case (p, i) =>
      val plane = array(p.map(lit(_)): _*)
      val dot = aggregate(zip_with(vec, plane, (x, y) => x * y),
        lit(0.0d), (acc, v) => acc + v)
      when(dot >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ bitwiseOR _)
  }
}
