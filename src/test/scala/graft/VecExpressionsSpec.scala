package graft

import graft.functions.{GraftExtensions, VecExpressions}
import org.apache.spark.sql.functions._

class VecExpressionsSpec extends SparkSpec {

  /** The HOF spelling the native expressions replaced — reference
    * semantics for the bit-identity checks. */
  private def hofDot(a: org.apache.spark.sql.Column,
                     b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, v) => acc + v)

  private def hofDist2(a: org.apache.spark.sql.Column,
                       b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) =>
      (x.cast("double") - y.cast("double")) *
        (x.cast("double") - y.cast("double"))),
      lit(0.0d), (acc, v) => acc + v)

  test("vec_dot/vec_dist2 bit-match the HOF chain on float vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      (i.toLong, Seq.fill(32)(rnd.nextFloat()), Seq.fill(32)(rnd.nextFloat()))
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select(
      VecExpressions.vecDot(col("a"), col("b")).as("nd"),
      hofDot(col("a"), col("b")).as("hd"),
      VecExpressions.vecDist2(col("a"), col("b")).as("n2"),
      hofDist2(col("a"), col("b")).as("h2")).collect()
    got.foreach { r =>
      // exact bit equality, not tolerance: same widening + fold order
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }
  }

  test("length mismatch and null elements yield NULL, like zip_with") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq[Option[Double]](Some(1.0), Some(2.0)),
        Seq[Option[Double]](Some(3.0))),                    // length mismatch
      (2L, Seq[Option[Double]](Some(1.0), None),
        Seq[Option[Double]](Some(3.0), Some(4.0))),         // null element
      (3L, Seq[Option[Double]](Some(1.0), Some(2.0)),
        Seq[Option[Double]](Some(3.0), Some(4.0))))         // clean
      .toDF("id", "a", "b")
    val got = df.select(col("id"),
      VecExpressions.vecDot(col("a"), col("b")).as("d"),
      hofDot(col("a"), col("b")).as("h")).orderBy("id").collect()
    assert(got(0).isNullAt(1) && got(0).isNullAt(2))
    assert(got(1).isNullAt(1) && got(1).isNullAt(2))
    assert(got(2).getDouble(1) == 11.0 && got(2).getDouble(2) == 11.0)
  }

  test("null input arrays propagate NULL") {
    import spark.implicits._
    val df = Seq((1L, Option(Seq(1.0, 2.0)), Option.empty[Seq[Double]]))
      .toDF("id", "a", "b")
    val got = df.select(VecExpressions.vecDot(col("a"), col("b"))).collect()
    assert(got(0).isNullAt(0))
  }

  test("integral element types are widened exactly") {
    import spark.implicits._
    val df = Seq((Seq(3L, 4L), Seq(5, 6))).toDF("a", "b")
    val got = df.select(
      VecExpressions.vecDot(col("a"), col("b")).as("d"),
      VecExpressions.vecDist2(col("a"), col("b")).as("e")).collect()(0)
    assert(got.getDouble(0) == 39.0)  // 15 + 24
    assert(got.getDouble(1) == 8.0)   // 4 + 4
  }

  test("non-array input fails analysis with a clear message") {
    import spark.implicits._
    val df = Seq((1, Seq(1.0))).toDF("x", "a")
    val err = intercept[Exception] {
      df.select(VecExpressions.vecDot(col("x"), col("a"))).collect()
    }
    assert(err.getMessage.contains("vec_dot"))
  }

  test("interpreted eval matches codegen (Literal fold path)") {
    // Expressions over foldable literals go through the interpreted
    // nullSafeEval in constant folding — must agree with codegen.
    import spark.implicits._
    val df = Seq(1).toDF("x")
    val a = typedLit(Seq(1.5f, 2.5f))
    val b = typedLit(Seq(2.0f, 4.0f))
    val got = df.select(
      VecExpressions.vecDot(a, b).as("d"),
      VecExpressions.vecDist2(a, b).as("e")).collect()(0)
    assert(got.getDouble(0) == 13.0)
    assert(got.getDouble(1) == 2.5)
  }

  test("nearestCells ranks by cosine, breaks ties to smaller id") {
    import spark.implicits._
    // 2-d centroids: id 10 → (1,0), id 20 → (0,1), id 30 → (-1,0);
    // matrix rows pre-normalized by the caller contract exercised here
    val matrix = Array(1.0, 0.0, 0.0, 1.0, -1.0, 0.0)
    val ids = Array(10L, 20L, 30L)
    val df = Seq(
      (1L, Seq(2.0f, 0.1f)),   // → 10, then 20, then 30
      (2L, Seq(0.0f, -3.0f)),  // → equidistant 10/30 at dot 0 → tie → 10
      (3L, Seq(-1.0f, 1.0f))   // → 20 and 30 tie at dot 1/√2... no: 20=1, 30=1
    ).toDF("id", "v")
    val r = df.select(col("id"),
        graft.functions.VecExpressions.nearestCells(col("v"), matrix, ids,
          dim = 2, topN = 2).as("cells"))
      .orderBy("id").collect()
    assert(r(0).getSeq[Long](1) == Seq(10L, 20L))
    // vec (0,-3): dots = (0, -3, 0) → ids 10 and 30 tie at 0 → 10 first
    assert(r(1).getSeq[Long](1) == Seq(10L, 30L))
    // vec (-1,1): dots = (-1, 1, 1) → 20 and 30 tie at 1 → smaller first
    assert(r(2).getSeq[Long](1) == Seq(20L, 30L))
    // topN > nCents clamps; wrong length / null element → NULL
    val one = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f)),
      (3L, null.asInstanceOf[Seq[Float]])).toDF("id", "v")
    val r2 = one.select(col("id"),
        graft.functions.VecExpressions.nearestCells(col("v"), matrix, ids,
          dim = 2, topN = 9).as("cells"))
      .orderBy("id").collect()
    assert(r2(0).getSeq[Long](1) == Seq(10L, 20L, 30L))
    assert(r2(1).isNullAt(1) && r2(2).isNullAt(1))
    // interpreted (literal-fold) path agrees with codegen
    val lit2 = Seq(1).toDF("x").select(
      graft.functions.VecExpressions.nearestCells(
        typedLit(Seq(2.0f, 0.1f)), matrix, ids, 2, 2).as("cells"))
      .collect()(0)
    assert(lit2.getSeq[Long](0) == Seq(10L, 20L))
  }

  test("GraftExtensions registers the native function set for SQL use") {
    val names = GraftExtensions.functions.map(_._1.funcName).toSet
    assert(names == Set("vec_dot", "vec_dist2", "copy_unescape",
      "unicode_normalize", "bpe_encode"))
    // post-hoc registration on a live session (the driver's contract:
    // SparkEntry.queries receives a session built without extensions)
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) d, " +
        "vec_dist2(array(1.0d, 2.0d), array(3.0d, 4.0d)) e").collect()(0)
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 8.0)
  }

  test("string natives work from SQL: normalize, unescape, bpe") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT unicode_normalize('é x', 'NFC') n, " +
        "copy_unescape('a\\\\tb') u, " +
        "bpe_encode('lowest', array(array('e','s'), array('es','t'), " +
        "array('l','o'), array('lo','w'))) t").collect()(0)
    assert(r.getString(0) == "é x")
    assert(r.getString(1) == "a\tb")
    assert(r.getSeq[String](2).toList == List("low", "est"))
    // foldable expressions count as literals (constant-equivalent)...
    assert(spark.sql("SELECT unicode_normalize('x', concat('NF', 'C'))")
      .collect()(0).getString(0) == "x")
    // ...but a column reference is rejected loudly
    val ex = intercept[Exception] {
      spark.sql("SELECT unicode_normalize('x', f) " +
        "FROM VALUES ('NFC') t(f)").collect()
    }
    assert(ex.getMessage.contains("literal"))
  }
}
