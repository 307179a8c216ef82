package graft

import graft.pipeline.Classifier
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkSpec {

  test("scoreHashed sums per-token weights plus bias, integer-exact") {
    import spark.implicits._
    val dim = 16
    // weight table where bucket j weighs j milli-units: margins are
    // directly checkable against hand-computed buckets
    val w = Array.tabulate(dim)(_.toLong)
    val df = Seq((1L, "alpha beta alpha"), (2L, ""), (3L, "??!!"))
      .toDF("doc_id", "text")
    val got = Classifier.scoreHashed(df, "doc_id", "text", w, biasMilli = 5L)
      .orderBy("doc_id").collect()

    def bucket(tok: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.substring(0, 8)
      (java.lang.Long.parseLong(hex, 16) % dim).toInt
    }
    val expected1 = 5L + 2 * w(bucket("alpha")) + w(bucket("beta"))
    assert(got(0).getLong(1) == expected1)
    // empty / punctuation-only docs score just the bias
    assert(got(1).getLong(1) == 5L && got(2).getLong(1) == 5L)
    // score is margin/1000.0; label thresholds at zero
    assert(got(0).getDouble(2) == expected1 / 1000.0)
    assert(got.forall(r => r.getBoolean(3) == (r.getLong(1) > 0)))
  }

  test("scoring plan is one shuffle-free projection") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val out = Classifier.scoreHashed(df, "doc_id", "text",
      Array.fill(64)(1L))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(!plan.contains("Join"), s"unexpected join:\n$plan")
  }

  test("scrambled demo weights stay in [-1000, 999]") {
    val w = Classifier.scrambledWeightsMilli(1024)
    assert(w.length == 1024)
    assert(w.forall(v => v >= -1000L && v <= 999L))
    assert(w.distinct.length > 500) // actually scrambled, not constant
  }

  test("NULL text scores the bias, like an empty document") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[String]), (2L, Option("")))
      .toDF("doc_id", "text")
    val got = Classifier.scoreHashed(df, "doc_id", "text",
        Array.fill(8)(7L), biasMilli = 42L)
      .orderBy("doc_id").collect()
    assert(got.forall(r => r.getLong(1) == 42L))
  }

  test("filterByMarginPercentile keeps exactly the rows at/above the cut") {
    import spark.implicits._
    // margins 1..10; p=0.5 -> percentile_disc = smallest with
    // cume_dist >= 0.5 = 5 -> keep 5..10
    val df = (1L to 10L).map(i => (i, i * 100L)).toDF("id", "m")
    val kept = Classifier.filterByMarginPercentile(df, "m", 0.5)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == (5L to 10L))
    // the one-materialization shape is value-identical (the headline
    // query runs with checkpointScored = true)
    val keptC = Classifier.filterByMarginPercentile(df, "m", 0.5,
        checkpointScored = true)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(keptC == kept)
  }

  test("negative weights flip the label") {
    import spark.implicits._
    val w = Array.fill(8)(-100L)
    val df = Seq((1L, "some words here")).toDF("doc_id", "text")
    val got = Classifier.scoreHashed(df, "doc_id", "text", w).collect()(0)
    assert(got.getLong(1) == -300L && !got.getBoolean(3))
  }

  test("aucByLabel: exact wins/ties vs hand-counted pairs") {
    import spark.implicits._
    // pos scores {3, 2, 2}, neg {1, 2}: wins 4 of 6 pairs, 2 ties
    // → AUC = (4 + 2/2) / 6 = 0.8333…
    val df = Seq((3L, true), (2L, true), (2L, true),
      (1L, false), (2L, false)).toDF("s", "y")
    val r = Classifier.aucByLabel(df, "s", "y").head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 4L && r.getLong(3) == 2L)
    assert(r.getLong(4) == 833333L)
  }

  test("aucByLabel: perfect ranking is 1.0; one-class data is NULL") {
    import spark.implicits._
    val perfect = Seq((10L, true), (9L, true), (1L, false), (0L, false))
      .toDF("s", "y")
    assert(Classifier.aucByLabel(perfect, "s", "y").head()
      .getLong(4) == 1000000L)
    val oneClass = Seq((5L, true), (6L, true)).toDF("s", "y")
    assert(Classifier.aucByLabel(oneClass, "s", "y").head().isNullAt(4))
  }
}
