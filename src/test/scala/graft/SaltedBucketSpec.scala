package graft

import org.apache.spark.sql.functions._
import graft.operators.SaltedJoin
import graft.sources.BucketedTable

class SaltedBucketSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join on a skewed fact table") {
    // key 1 is hot: 900 of 1000 fact rows
    val facts = (1L to 1000L)
      .map(i => (if (i <= 900) 1L else i % 7, i, s"p$i"))
      .toDF("k", "row_id", "payload")
    val dims = Seq((0L, "zero"), (1L, "one"), (2L, "two"), (5L, "five"))
      .toDF("k", "name")
    val salted = SaltedJoin.join(facts, dims, Seq("k"), factor = 8)
    val plain = facts.join(dims, Seq("k"))
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salt actually spreads the hot key across distinct salt values") {
    val facts = (1L to 500L).map(i => (1L, i)).toDF("k", "row_id")
    val nSalts = facts.withColumn("__salt",
        pmod(xxhash64(col("row_id")), lit(8L)))
      .select("__salt").distinct().count()
    assert(nSalts == 8, s"hot key used $nSalts of 8 salts")
  }

  test("factor=1 degenerates to the plain join") {
    val facts = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    val dims = Seq((1L, "a")).toDF("k", "name")
    val got = SaltedJoin.join(facts, dims, Seq("k"), factor = 1)
      .select("k", "v", "name").as[(Long, Long, String)].collect()
    assert(got.toSeq == Seq((1L, 10L, "a")))
  }

  test("bucketed tables join and aggregate with no exchange") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bucket").toString
    val a = (1L to 300L).map(i => (i % 50, i)).toDF("k", "va")
    val b = (1L to 200L).map(i => (i % 50, s"n$i")).toDF("k", "nb")
    try {
      BucketedTable.write(a, "bt_a", s"$dir/a", Seq("k"), 4,
        sortCols = Seq("k"))
      BucketedTable.write(b, "bt_b", s"$dir/b", Seq("k"), 4,
        sortCols = Seq("k"))
      val joined = BucketedTable.read(spark, "bt_a")
        .join(BucketedTable.read(spark, "bt_b"), Seq("k"))
      // disable broadcast so the bucket co-location is what's tested
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == 1200) // 300 × (200/50)
      val agg = BucketedTable.read(spark, "bt_a")
        .groupBy("k").agg(sum("va"))
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"),
        s"bucketed agg still shuffles:\n$aggPlan")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      BucketedTable.drop(spark, "bt_a")
      BucketedTable.drop(spark, "bt_b")
    }
  }
}
