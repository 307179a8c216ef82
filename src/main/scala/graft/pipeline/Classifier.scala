package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed-linear text classifier inference (fastText-style): a document's
  * score is the sum of per-token weights looked up in a fixed-size hashed
  * vocabulary, plus a bias. The standard cheap quality/domain classifier
  * for corpus curation — train offline, score 100 TB inline.
  *
  * Scale shape: scoring is a SINGLE projection — tokens never leave their
  * row (no explode, no shuffle, no join). The weight table rides into the
  * plan as a literal array (a few KB for the usual 2^10–2^18 buckets, the
  * same size contract as a broadcast). One corpus scan, embarrassingly
  * parallel, AQE-friendly.
  *
  * Determinism: weights are integer milli-units and the fold is integer
  * addition, so the margin is engine-exact (any summation order gives the
  * same value) and the only floating-point step is one correctly-rounded
  * IEEE division for the convenience `score` column. Token buckets hash
  * via md5 (not an engine-private hash) so external systems — including
  * the DuckDB oracle — reproduce bucket assignment bit-for-bit.
  *
  * Tokenization matches [[Terms]]: lower-cased runs of `[a-z0-9']`.
  */
object Classifier {

  /** Hash bucket of a token in `[0, dim)`: the first 8 md5 hex digits as
    * an integer, mod dim. Engine-portable by construction. */
  def tokenBucket(tok: Column, dim: Int): Column =
    conv(substring(md5(tok), 1, 8), 16, 10).cast("long") % dim

  /** Deterministic demo weights (Knuth multiplicative scramble of the
    * bucket index into [-1000, 999] milli-units) — stands in for a
    * trained model in tests/oracles; real use passes trained weights. */
  def scrambledWeightsMilli(dim: Int): Array[Long] =
    Array.tabulate(dim)(j => (j.toLong * 2654435761L) % 2000L - 1000L)

  /** Score every document: margin_milli = bias + Σ w[bucket(token)],
    * score = margin_milli / 1000.0, label = margin_milli > 0.
    *
    * `weightsMilli.length` is the hash dimension. Output columns:
    * (idCol, margin_milli, score, label).
    */
  def scoreHashed(df: DataFrame, idCol: String, textCol: String,
                  weightsMilli: Array[Long],
                  biasMilli: Long = 0L): DataFrame = {
    val dim = weightsMilli.length
    require(dim > 0, "weights must be non-empty")
    val w = typedlit(weightsMilli.toSeq)
    // NULL text scores like an empty document (margin = bias), matching
    // the left-join + coalesce shape a SQL consumer writes
    val toks = filter(
      split(lower(coalesce(col(textCol), lit(""))), "[^a-z0-9']+"),
      t => t =!= "")
    // per-token weight lookup + integer fold, all inside one projection.
    // HOFs run the lambda per element but keep the work row-local — the
    // alternative (explode + groupBy id) ships one shuffle row per token
    // occurrence, corpus-token-count × 16 bytes of exchange I/O for a
    // sum that is computable where the row already lives.
    val margin = aggregate(
      transform(toks, t =>
        element_at(w, (tokenBucket(t, dim) + 1).cast("int"))),
      lit(biasMilli), (acc, v) => acc + v)
    df.select(col(idCol), margin.as("margin_milli"))
      .withColumn("score", col("margin_milli") / lit(1000.0d))
      .withColumn("label", col("margin_milli") > 0)
  }

  /** Corpus-relative quality gate: keep rows whose `marginCol` clears
    * the corpus-wide `p`-th percentile — "train on the best X%", the
    * standard use of a quality classifier in curation.
    *
    * The threshold is ONE exact SQL-standard percentile_disc aggregate
    * (engine-exact over the integer margins) broadcast back as a scalar
    * — the corpus is scanned twice (threshold + filter), shuffled
    * never. `checkpointScored` materializes the scored frame once so
    * both passes read it instead of re-running the upstream scoring
    * projection (md5 per token) twice — measured 2.3× faster warm at
    * sf0.1 and 2.7× at a 10× corpus (ProfileScale, round 10). Opt-in
    * per the library's no-hidden-caching convention (localCheckpoint =
    * executor-local blocks; swap for `checkpoint()` + a reliable dir on
    * a shared cluster, and consider `percentile_approx` at 100 TB). */
  def filterByMarginPercentile(scored: DataFrame, marginCol: String,
                               p: Double,
                               checkpointScored: Boolean = false)
      : DataFrame = {
    require(p > 0.0 && p < 1.0, s"p must be in (0, 1), got $p")
    require(!scored.columns.contains("__thr"),
      "input column __thr collides with internals")
    val s = if (checkpointScored) scored.localCheckpoint() else scored
    val thr = s.agg(
      expr(s"percentile_disc($p) WITHIN GROUP (ORDER BY `$marginCol`)")
        .as("__thr"))
    s.crossJoin(broadcast(thr))
      .filter(col(marginCol) >= col("__thr"))
      .drop("__thr")
  }

  /** ROC-AUC of a score column against a boolean label — the evaluation
    * half of the quality-classifier loop (how well does the cheap score
    * rank the trusted label?). Mann–Whitney formulation with exact tie
    * handling: AUC = (wins + ties/2) / (n_pos · n_neg), where `wins`
    * counts (positive, negative) pairs the positive out-scores and
    * `tie_pairs` counts equal-score pairs.
    *
    * Scale shape: the corpus first compresses to DISTINCT score values
    * (one hash aggregate — for integer-milli margins that is bounded by
    * the margin range, orders of magnitude below document count), and
    * the cumulative negative count runs as a TWO-LEVEL prefix (the
    * [[Drift.valueKs]] shape): numeric scores hash into `buckets`
    * ordered range buckets, each bucket's running sum is a window
    * PARTITIONED by bucket (parallel, spill-safe), and each bucket's
    * exclusive offset comes from a broadcast triangular self-join over
    * the ≤`buckets` bucket totals — no global-ordered window anywhere,
    * so a CONTINUOUS double score (distinct-count ≈ corpus-count, the
    * normal classifier output) never funnels the corpus through one
    * task. Degenerate ranges (constant, ±Inf endpoints, NaN present)
    * collapse to one bucket; STRING scores bucket through their first
    * 8 UTF-8 bytes read as an unsigned big-endian integer (monotone
    * under Spark's byte-wise string comparison); booleans through a
    * two-valued indicator; only genuinely unorderable-by-monotone-map
    * types (arrays, structs) keep the
    * single global pass over the distinct values. No per-document
    * ranks, no corpus-sized sort, no collect. Counts are exact
    * integers; the single double division happens once, so
    * `auc_micro` is engine-exact.
    *
    * Output (one row): (n_pos, n_neg, wins, tie_pairs, auc_micro);
    * `auc_micro` is NULL when either class is empty (AUC undefined).
    * Rows with a NULL label or NULL score are EXCLUDED (unlabeled /
    * unscoreable rows carry no ranking information — silently counting
    * null labels as negatives would deflate AUC). Exactness domain:
    * the pair counts are longs, so n_pos·n_neg must stay below 2^63 —
    * ~3×10⁹ rows per class; beyond that, widen the two pair sums to
    * DECIMAL(38,0) (the counts themselves never overflow).
    */
  def aucByLabel(scored: DataFrame, scoreCol: String,
                 labelCol: String, buckets: Int = 1024): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    // localCheckpoint: the distinct-score count table feeds THREE
    // consumers (range probe, bucket totals, windowed final pass) and
    // its upstream — for hashed classifiers a hash per token over the
    // whole corpus — would otherwise run three times (round 21; RDD
    // blocks, not persist: the columnar-cache spelling measured slower)
    val g = scored
      .filter(col(labelCol).isNotNull && col(scoreCol).isNotNull)
      .groupBy(col(scoreCol).as("s"))
      .agg(sum(when(col(labelCol), 1L).otherwise(0L)).as("p"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("q"))
      .localCheckpoint()
    // the bucket function must be MONOTONE in the score's own ordering.
    // Each bucketable type gets its own monotone double map — a plain
    // double cast is only legal for numerics and TIMESTAMP (dates and
    // TIMESTAMP_NTZ cannot cast to double; Spark fails analysis).
    // Anything else (arrays, structs, ...) has no cheap monotone map —
    // keep the single global pass over distinct values for those,
    // documented above.
    val bucketValue: Option[org.apache.spark.sql.Column] =
      scored.schema(scoreCol).dataType match {
        case _: org.apache.spark.sql.types.NumericType =>
          Some(col("s").cast("double"))
        case org.apache.spark.sql.types.TimestampType =>
          Some(col("s").cast("double"))
        case org.apache.spark.sql.types.DateType =>
          Some(unix_date(col("s")).cast("double"))
        case org.apache.spark.sql.types.TimestampNTZType =>
          // reinterpreting through TIMESTAMP applies one fixed session
          // offset — monotone, which is all the bucket map needs
          Some(unix_micros(col("s").cast("timestamp")).cast("double"))
        case org.apache.spark.sql.types.BooleanType =>
          // false < true in Spark's boolean ordering — a two-valued
          // monotone map (cast-free: ANSI boolean→double rules vary)
          Some(when(col("s"), 1.0d).otherwise(0.0d))
        case org.apache.spark.sql.types.StringType =>
          // Spark string ordering IS unsigned byte-wise comparison
          // (UTF8String.compareTo), so the first 8 UTF-8 bytes read as
          // an unsigned big-endian integer are monotone: strings that
          // differ inside the prefix order exactly like the integers,
          // and strings sharing all 8 bytes tie into one bucket where
          // the within-bucket window (ordered by the ORIGINAL string)
          // resolves them exactly. Shorter strings zero-pad on the
          // right — 0x00 is the smallest byte, matching "prefix sorts
          // first". conv() reads the 16 hex digits as unsigned 64-bit;
          // the long→double rounding is itself monotone.
          Some(conv(rpad(hex(substring(col("s").cast("binary"), 1, 8)),
            16, "0"), 16, 10).cast("double"))
        case _ => None
      }
    val c = if (bucketValue.isEmpty) {
      val w = Window.orderBy(col("s"))
        .rowsBetween(Window.unboundedPreceding, -1)
      g.withColumn("neg_below",
        coalesce(sum(col("q")).over(w), lit(0L)))
    } else {
      val gv = g.withColumn("v", bucketValue.get)
      val range = gv.agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
      // monotone range bucket; any non-finite span (constant range,
      // ±Inf endpoints, NaN — NaN sorts greatest into hi) falls back
      // to the single bucket 0, i.e. the old global shape
      val span = col("hi") - col("lo")
      val bucketExpr = when(col("lo").isNull || span === 0.0d ||
          isnan(span) || span === lit(Double.PositiveInfinity), lit(0))
        .otherwise(least(lit(buckets - 1), greatest(lit(0),
          floor((col("v") - col("lo")) / span * buckets).cast("int"))))
      val gb = gv.crossJoin(broadcast(range)).withColumn("bk", bucketExpr)
      // exclusive per-bucket offsets WITHOUT a global window (even a
      // bounded one warns and single-tasks): a broadcast triangular
      // self-join over the ≤`buckets` bucket totals
      val bt = gb.groupBy(col("bk")).agg(sum(col("q")).as("bq"))
      val offsets = bt.select(col("bk"))
        .join(broadcast(bt.select(col("bk").as("bk2"), col("bq").as("bq2"))),
          col("bk2") < col("bk"), "left")
        .groupBy(col("bk"))
        .agg(coalesce(sum(col("bq2")), lit(0L)).as("oq"))
      // within-bucket exclusive prefix, ordered by the ORIGINAL score
      // (exact even where double() collapses distinct wide integers),
      // partitioned so every bucket sorts independently
      val wi = Window.partitionBy(col("bk")).orderBy(col("s"))
        .rowsBetween(Window.unboundedPreceding, -1)
      gb.join(broadcast(offsets), "bk")
        .withColumn("neg_below",
          coalesce(sum(col("q")).over(wi), lit(0L)) + col("oq"))
    }
    c.agg(sum(col("p")).as("n_pos"), sum(col("q")).as("n_neg"),
        sum(col("p") * col("neg_below")).as("wins"),
        sum(col("p") * col("q")).as("tie_pairs"))
      .withColumn("auc_micro",
        when(col("n_pos") > 0 && col("n_neg") > 0,
          floor((lit(2L) * col("wins") + col("tie_pairs")).cast("double")
            / (lit(2L) * col("n_pos") * col("n_neg")).cast("double")
            * lit(1e6) + lit(0.5)).cast("long")))
  }
}
