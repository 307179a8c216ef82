package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.{Profile, Upsert}

class UpsertProfileSpec extends SparkSpec {

  test("latestByKey keeps the newest version per key") {
    import spark.implicits._
    val log = Seq(
      (1L, 10L, 100L, "a"), // user 1: three versions
      (1L, 30L, 101L, "b"),
      (1L, 20L, 102L, "c"),
      (2L, 5L, 103L, "d"))  // user 2: one version
      .toDF("user_id", "ver", "event_id", "payload")
    val got = Upsert.latestByKey(log, Seq("user_id"),
        Seq(col("ver"), col("event_id")))
      .collect().map(r => (r.getLong(0), r.getString(3))).sortBy(_._1)
    assert(got.toSeq == Seq((1L, "b"), (2L, "d")))
  }

  test("latestByKey breaks version ties by the extra column") {
    import spark.implicits._
    val log = Seq((1L, 10L, 7L, "x"), (1L, 10L, 9L, "y"))
      .toDF("user_id", "ver", "event_id", "payload")
    val got = Upsert.latestByKey(log, Seq("user_id"),
      Seq(col("ver"), col("event_id"))).head()
    assert(got.getString(3) == "y")
  }

  test("latestByKey rejects an input __rn column (reserved)") {
    import spark.implicits._
    val df = Seq((1L, 1L, 9L)).toDF("k", "v", "__rn")
    val err = intercept[IllegalArgumentException] {
      graft.operators.Upsert.latestByKey(df, Seq("k"),
        Seq(org.apache.spark.sql.functions.col("v")))
    }
    assert(err.getMessage.contains("__rn"))
  }

  test("quantile labels are injective for sub-percent probs") {
    import spark.implicits._
    val df = (1 to 1000).map(_.toLong).toDF("x")
    val r = graft.operators.Profile.quantiles(df, Seq("x"),
      Seq(0.25, 0.995, 0.999))
    assert(r.columns.toSeq == Seq("x_p25", "x_p99_5", "x_p99_9"))
    val row = r.collect()(0)
    assert(row.getDouble(1) == 995.0 && row.getDouble(2) == 999.0)
  }

  test("numeric profile: exact stats incl. nulls and distincts") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 1.5), (2L, 2.5), (3L, null), (3L, 4.0))
      .toDF("k", "x")
    val got = Profile.numeric(df, Seq("x"), distinctCols = Seq("k")).head()
    assert(got.getAs[Long]("n_rows") == 4L)
    assert(got.getAs[Double]("x_min") == 1.5)
    assert(got.getAs[Double]("x_max") == 4.0)
    assert(got.getAs[Double]("x_mean") == (1.5 + 2.5 + 4.0) / 3.0)
    assert(got.getAs[Long]("x_nulls") == 1L)
    assert(got.getAs[Long]("k_distinct") == 3L)
  }

  test("approx distinct stays within 10% on a wide key space") {
    import spark.implicits._
    val df = (1L to 5000L).toDF("k").withColumn("x", col("k") * 2)
    val got = Profile.numeric(df, Seq("x"), distinctCols = Seq("k"),
      approxDistinct = true).head()
    val est = got.getAs[Long]("k_distinct")
    assert(est > 4500 && est < 5500, s"approx distinct was $est")
  }

  test("quantiles: percentile_disc picks the smallest value at cume >= p") {
    import spark.implicits._
    // n=5: cume_dist = 0.2,0.4,0.6,0.8,1.0
    val df = Seq(10.0, 20.0, 30.0, 40.0, 50.0).toDF("x")
    val got = Profile.quantiles(df, Seq("x"),
      Seq(0.2, 0.5, 0.8, 0.95, 1.0)).head()
    assert(got.getAs[Double]("x_p20") == 10.0)  // 0.2 >= 0.2
    assert(got.getAs[Double]("x_p50") == 30.0)  // 0.6 first >= 0.5
    assert(got.getAs[Double]("x_p80") == 40.0)
    assert(got.getAs[Double]("x_p95") == 50.0)  // only 1.0 >= 0.95
    assert(got.getAs[Double]("x_p100") == 50.0)
  }

  test("approx quantiles stay close to exact on a smooth column") {
    import spark.implicits._
    val df = (1L to 10000L).map(_.toDouble).toDF("x")
    val got = Profile.quantiles(df, Seq("x"), Seq(0.5), approx = true)
      .head().getAs[Double]("x_p50")
    assert(math.abs(got - 5000.0) < 100.0, s"p50 approx was $got")
  }

  test("streaming dedup with watermark bounds state and emits each key once") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val deduped = mem.toDS().toDF("k", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("k")
    val qn = "dedup_test_" + System.nanoTime()
    val q = deduped.writeStream.format("memory").queryName(qn)
      .outputMode("append").start()
    def ts(min: Long) = new Timestamp(min * 60000L)
    mem.addData((1L, ts(0)), (1L, ts(1)), (2L, ts(1)))
    q.processAllAvailable()
    mem.addData((1L, ts(2)), (2L, ts(3))) // dups within watermark: dropped
    q.processAllAvailable()
    val got = spark.table(qn).collect().map(_.getLong(0)).sorted
    q.stop()
    assert(got.toSeq == Seq(1L, 2L))
  }

  test("outliers: only far-from-group-mean rows survive, z in micros") {
    import spark.implicits._
    // group a: nine 10s and one 100 -> the 100 is the outlier
    // group b: constant -> zero variance -> no outliers
    val rows = (1L to 9L).map(i => (i, "a", 10.0)) ++
      Seq((10L, "a", 100.0)) ++
      (11L to 14L).map(i => (i, "b", 5.0))
    val df = rows.toDF("id", "g", "v")
    val out = graft.operators.Profile.outliers(df, "g", "v",
      zThreshold = 2.0).collect()
    assert(out.length == 1 && out(0).getLong(0) == 10L)
    // hand-check: mean 19, var = E[x^2]-mean^2 = 1090-361 = 729, std 27
    // z = (100-19)/27 = 3.0
    assert(out(0).getLong(3) == 3000000L)
    // single-row groups emit nothing
    val single = Seq((1L, "x", 42.0)).toDF("id", "g", "v")
    assert(graft.operators.Profile.outliers(single, "g", "v").isEmpty)
  }
}
