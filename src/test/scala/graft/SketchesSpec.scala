package graft

import graft.pipeline.Sketches
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  private def exact(df: DataFrame): Map[String, Long] =
    df.groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  private def estimates(df: DataFrame, width: Int,
                        depth: Int): Map[String, Long] = {
    val sk = Sketches.cmsSketch(df, "w", width, depth)
    Sketches.cmsEstimate(sk, df.select("w").distinct(), "w", width, depth)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("wide sketch: estimates equal exact counts") {
    import spark.implicits._
    val df = (Seq.fill(7)("a") ++ Seq.fill(3)("b") ++ Seq("c"))
      .toDF("w")
    assert(estimates(df, 4096, 4) == exact(df))
  }

  test("tiny sketch never undercounts") {
    import spark.implicits._
    val df = (1 to 200).map(i => s"tok${i % 17}").toDF("w")
    val ex = exact(df)
    val est = estimates(df, 2, 1) // forced collisions
    assert(est.keySet == ex.keySet)
    est.foreach { case (w, e) => assert(e >= ex(w), s"undercount on $w") }
    // width 2, depth 1 with 17 items MUST overcount something
    assert(est.exists { case (w, e) => e > ex(w) })
  }

  test("merge of halves equals sketch of the union, cell-exact") {
    import spark.implicits._
    val all = (1 to 100).map(i => s"t${i % 9}").toDF("w")
    val h1 = (1 to 50).map(i => s"t${i % 9}").toDF("w")
    val h2 = (51 to 100).map(i => s"t${i % 9}").toDF("w")
    def cells(df: DataFrame): Set[(Int, Long, Long)] =
      df.collect().map(r =>
        (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val merged = Sketches.cmsMerge(
      Sketches.cmsSketch(h1, "w", 64, 3),
      Sketches.cmsSketch(h2, "w", 64, 3))
    assert(cells(merged) == cells(Sketches.cmsSketch(all, "w", 64, 3)))
  }

  test("weighted build equals row-expanded build; nulls are skipped") {
    import spark.implicits._
    val weighted = Seq(("a", 5L), ("b", 2L), ("a", 1L))
      .toDF("w", "n")
    val expanded = (Seq.fill(6)("a") ++ Seq.fill(2)("b")).toDF("w")
    def cells(df: DataFrame): Set[(Int, Long, Long)] =
      df.collect().map(r =>
        (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(
      cells(Sketches.cmsSketch(weighted, "w", 32, 2, Some("n"))) ==
      cells(Sketches.cmsSketch(expanded, "w", 32, 2)))
    val withNull = Seq(Some("a"), None, Some("a")).toDF("w")
    val est = estimates(withNull.filter(col("w").isNotNull), 32, 2)
    assert(est == Map("a" -> 2L))
  }

  test("cmsEstimate drops null probes instead of reading salt buckets") {
    import spark.implicits._
    val df = Seq.fill(50)("busy").toDF("w")
    val sk = Sketches.cmsSketch(df, "w", 4, 1) // tiny: collisions likely
    val probes = Seq(Some("busy"), None).toDF("w")
    val got = Sketches.cmsEstimate(sk, probes, "w", 4, 1).collect()
    assert(got.length == 1 && got(0).getString(0) == "busy"
      && got(0).getLong(1) == 50L)
  }

  test("heavyHitters keeps only items at or above the threshold") {
    import spark.implicits._
    val df = (Seq.fill(10)("hot") ++ Seq.fill(3)("warm") ++ Seq("cold"))
      .toDF("w")
    val got = Sketches.heavyHitters(df, "w", minCount = 3L,
        width = 1024, depth = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("hot" -> 10L, "warm" -> 3L))
  }
}
