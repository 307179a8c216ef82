package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.{FunctionInstaller => ExpressionUtils}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the embedding hot path.
  *
  * The similarity / clustering / embedding-dedup family spends its time in
  * per-element vector arithmetic. The `zip_with` + `aggregate` HOF spelling
  * is codegen'd but materializes an intermediate array and runs the lambda
  * through `NamedLambdaVariable` plumbing per element; these expressions
  * fold straight over the two `ArrayData` buffers in one fused loop with
  * primitive accesses — no intermediate array, no per-element allocation.
  *
  * Semantics are BIT-IDENTICAL to the HOF chain they replace
  * (`aggregate(zip_with(a, b, f), 0.0d, _ + _)`): elements are widened to
  * double and accumulated in index order starting from +0.0, a length
  * mismatch yields NULL (zip_with pads with null, null poisons the sum),
  * and a NULL element yields NULL. Keeping the fold order identical keeps
  * every oracle hash stable.
  *
  * Extension surface per the build plan's preference order: a native
  * `Expression` with `doGenCode` beats a Scala UDF. Registered for SQL use
  * via [[GraftExtensions]] (`vec_dot`, `vec_dist2`).
  */
/** Shared element accessors for the array-of-numeric expressions —
  * ONE six-case type dispatch (eval + codegen spelling), not per-class
  * copies that drift apart when a supported element type is added. */
private[functions] object VecElem {
  def getDouble(arr: ArrayData, dt: DataType, i: Int): Double =
    dt match {
      case FloatType   => arr.getFloat(i).toDouble
      case DoubleType  => arr.getDouble(i)
      case ByteType    => arr.getByte(i).toDouble
      case ShortType   => arr.getShort(i).toDouble
      case IntegerType => arr.getInt(i).toDouble
      case LongType    => arr.getLong(i).toDouble
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
  def genGet(arr: String, dt: DataType, i: String): String =
    dt match {
      case FloatType   => s"(double) $arr.getFloat($i)"
      case DoubleType  => s"$arr.getDouble($i)"
      case ByteType    => s"(double) $arr.getByte($i)"
      case ShortType   => s"(double) $arr.getShort($i)"
      case IntegerType => s"(double) $arr.getInt($i)"
      case LongType    => s"(double) $arr.getLong($i)"
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
}

abstract class VecFoldExpression extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  private def numericElem(dt: DataType): Boolean = dt match {
    case ArrayType(et, _) => et match {
      case FloatType | DoubleType | ByteType | ShortType | IntegerType |
          LongType => true
      case _ => false
    }
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (numericElem(left.dataType) && numericElem(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two arrays of float/double/integral " +
          s"elements, got ${left.dataType.simpleString} and " +
          s"${right.dataType.simpleString}")

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  /** Combine one (a_i, b_i) pair into the running double sum. */
  protected def combine(a: Double, b: Double, acc: Double): Double
  /** Java source for `combine`: statement updating `acc` from `a`/`b`. */
  protected def combineCode(acc: String, a: String, b: String): String

  private def getDouble(arr: ArrayData, dt: DataType, i: Int): Double =
    VecElem.getDouble(arr, dt, i)

  override def nullSafeEval(av: Any, bv: Any): Any = {
    val a = av.asInstanceOf[ArrayData]
    val b = bv.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val (lt, rt) = (elemType(left), elemType(right))
    var acc = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc = combine(getDouble(a, lt, i), getDouble(b, rt, i), acc)
      i += 1
    }
    acc
  }

  private def genGet(arr: String, dt: DataType, i: String): String =
    VecElem.genGet(arr, dt, i)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("vfN")
      val i = ctx.freshName("vfI")
      val acc = ctx.freshName("vfAcc")
      val bad = ctx.freshName("vfBad")
      s"""
         |final int $n = $a.numElements();
         |boolean $bad = ($n != $b.numElements());
         |double $acc = 0.0d;
         |if (!$bad) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    ${combineCode(acc, genGet(a, elemType(left), i),
                            genGet(b, elemType(right), i))}
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
       """.stripMargin
    })
}

/** Dot product: `sum_i a_i * b_i` in index order, double accumulation. */
case class VecDot(left: Expression, right: Expression)
    extends VecFoldExpression {
  override def prettyName: String = "vec_dot"
  override protected def combine(a: Double, b: Double, acc: Double): Double =
    acc + a * b
  override protected def combineCode(acc: String, a: String,
                                     b: String): String =
    s"$acc += ($a) * ($b);"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance: `sum_i (a_i - b_i)^2` in index order. */
case class VecDist2(left: Expression, right: Expression)
    extends VecFoldExpression {
  override def prettyName: String = "vec_dist2"
  override protected def combine(a: Double, b: Double, acc: Double): Double = {
    val d = a - b
    acc + d * d
  }
  override protected def combineCode(acc: String, a: String,
                                     b: String): String =
    s"$acc += (($a) - ($b)) * (($a) - ($b));"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Packed sign bits of `matrix.length / dim` hyperplane dot products in
  * ONE fused loop: bit p of the result is set iff
  * `sum_j vec_j * matrix[p*dim + j] >= 0` (index-order double
  * accumulation from +0.0, identical to chaining [[VecDot]] per plane).
  * The plane matrix rides along as a single referenced object instead of
  * `planes` separate 64-literal array expressions — the per-plane
  * spelling paid array construction and expression dispatch per plane
  * per row, which dominated banded-LSH signature time once bands×bits
  * reached 128 planes. NULL vector or a length != `dim` yields NULL (the
  * HOF chain folded those to an all-zero signature; null keys drop out
  * of bucket joins, which is the safer contract and is documented at the
  * call site).
  *
  * Not SQL-registered: the matrix is a plan-time artifact derived from a
  * seed, not something a SQL caller can pass.
  */
case class HyperplaneSig(child: Expression, matrix: Array[Double], dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(dim > 0 && matrix.length % dim == 0,
    s"matrix length ${matrix.length} must be a multiple of dim $dim")
  private val numPlanes = matrix.length / dim
  require(numPlanes <= 64, s"at most 64 planes fit a long, got $numPlanes")

  // content equality for the embedded Array: the case-class default is
  // array REFERENCE identity, so two nodes built from the same
  // seed-derived matrix would never compare equal and Catalyst's
  // common-subexpression elimination could not deduplicate them
  override def equals(o: Any): Boolean = o match {
    case h: HyperplaneSig => child == h.child && dim == h.dim &&
      java.util.Arrays.equals(matrix, h.matrix)
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(
    child, Int.box(dim), Int.box(java.util.Arrays.hashCode(matrix)))

  override def prettyName: String = "hyperplane_sig"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType | ByteType | ShortType |
        IntegerType | LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array of float/double/integral elements, " +
        s"got ${other.simpleString}")
  }

  private def getDouble(arr: ArrayData, dt: DataType, i: Int): Double =
    VecElem.getDouble(arr, dt, i)

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    if (a.numElements() != dim) return null
    val dt = elemType
    var sig = 0L
    var p = 0
    while (p < numPlanes) {
      var acc = 0.0d
      var j = 0
      while (j < dim) {
        if (a.isNullAt(j)) return null
        acc += getDouble(a, dt, j) * matrix(p * dim + j)
        j += 1
      }
      if (acc >= 0) sig |= 1L << p
      p += 1
    }
    sig
  }

  private def genGet(arr: String, dt: DataType, i: String): String =
    VecElem.genGet(arr, dt, i)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val m = ctx.addReferenceObj("planes", matrix, "double[]")
      val sig = ctx.freshName("hsSig")
      val acc = ctx.freshName("hsAcc")
      val p = ctx.freshName("hsP")
      val j = ctx.freshName("hsJ")
      val bad = ctx.freshName("hsBad")
      s"""
         |boolean $bad = ($c.numElements() != $dim);
         |long $sig = 0L;
         |if (!$bad) {
         |  for (int $p = 0; $p < $numPlanes && !$bad; $p++) {
         |    double $acc = 0.0d;
         |    for (int $j = 0; $j < $dim; $j++) {
         |      if ($c.isNullAt($j)) { $bad = true; break; }
         |      $acc += ${genGet(c, elemType, j)} * $m[$p * $dim + $j];
         |    }
         |    if (!$bad && $acc >= 0) $sig |= 1L << $p;
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $sig; }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** Top-`topN` nearest centroids by cosine for one vector against a
  * DRIVER-SMALL centroid matrix embedded in the expression (rows
  * L2-normalized at construction, so ranking by plain dot equals
  * ranking by cosine — the row's own norm is a positive constant).
  * Returns `array<long>` of centroid ids, best first, ties to the
  * smaller id; NULL for a NULL vector, a length != dim, or a NULL
  * element.
  *
  * This is the IVF hot path done as a narrow map: the
  * crossJoin(broadcast(centroids)) + window-top-1 spelling it replaces
  * materialized n×nlist rows CARRYING FULL VECTORS through a
  * corpus-wide exchange and sort — the dominant cost of the whole
  * operator at any scale, for what is per-row arithmetic. Cost here is
  * nlist×dim multiply-adds per row inside whole-stage codegen, zero
  * shuffle. nlist is bounded by the driver-small centroid contract
  * (pqTrain's codebook note applies — a matrix of ~10⁴ × dim doubles
  * rides the closure like HyperplaneSig's planes).
  */
case class NearestCells(child: Expression, matrix: Array[Double],
                        ids: Array[Long], dim: Int, topN: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(dim > 0 && matrix.length % dim == 0,
    s"matrix length ${matrix.length} must be a multiple of dim $dim")
  private val nCents = matrix.length / dim
  require(ids.length == nCents,
    s"ids length ${ids.length} != centroid count $nCents")
  require(topN >= 1, s"topN must be >= 1, got $topN")

  // content equality for the embedded arrays (see HyperplaneSig)
  override def equals(o: Any): Boolean = o match {
    case n: NearestCells => child == n.child && dim == n.dim &&
      topN == n.topN && java.util.Arrays.equals(matrix, n.matrix) &&
      java.util.Arrays.equals(ids, n.ids)
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(
    child, Int.box(dim), Int.box(topN),
    Int.box(java.util.Arrays.hashCode(matrix)),
    Int.box(java.util.Arrays.hashCode(ids)))

  override def prettyName: String = "nearest_cells"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType | ByteType | ShortType |
        IntegerType | LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array of float/double/integral elements, " +
        s"got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    if (a.numElements() != dim) return null
    val dt = elemType
    val vec = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      if (a.isNullAt(j)) return null
      vec(j) = VecElem.getDouble(a, dt, j)
      j += 1
    }
    val n = math.min(topN, nCents)
    val bestScore = Array.fill(n)(Double.NegativeInfinity)
    val bestId = new Array[Long](n)
    var c = 0
    while (c < nCents) {
      var acc = 0.0d
      var k = 0
      while (k < dim) { acc += vec(k) * matrix(c * dim + k); k += 1 }
      // insertion into the small top-N buffer; ties to the smaller id
      var pos = n
      while (pos > 0 && (acc > bestScore(pos - 1) ||
          (acc == bestScore(pos - 1) && ids(c) < bestId(pos - 1)))) pos -= 1
      if (pos < n) {
        var m = n - 1
        while (m > pos) {
          bestScore(m) = bestScore(m - 1); bestId(m) = bestId(m - 1); m -= 1
        }
        bestScore(pos) = acc; bestId(pos) = ids(c)
      }
      c += 1
    }
    // fewer centroids than topN: all of them (n = min(topN, nCents))
    new org.apache.spark.sql.catalyst.util.GenericArrayData(bestId)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.addReferenceObj("cents", matrix, "double[]")
      val cid = ctx.addReferenceObj("centIds", ids, "long[]")
      val bad = ctx.freshName("ncBad")
      val vec = ctx.freshName("ncVec")
      val bs = ctx.freshName("ncBestS")
      val bi = ctx.freshName("ncBestI")
      val j = ctx.freshName("ncJ")
      val c = ctx.freshName("ncC")
      val k = ctx.freshName("ncK")
      val acc = ctx.freshName("ncAcc")
      val pos = ctx.freshName("ncPos")
      val mm = ctx.freshName("ncM")
      val out = ctx.freshName("ncOut")
      val n = math.min(topN, nCents)
      s"""
         |boolean $bad = ($a.numElements() != $dim);
         |long[] $out = null;
         |if (!$bad) {
         |  double[] $vec = new double[$dim];
         |  for (int $j = 0; $j < $dim; $j++) {
         |    if ($a.isNullAt($j)) { $bad = true; break; }
         |    $vec[$j] = ${VecElem.genGet(a, elemType, j)};
         |  }
         |  if (!$bad) {
         |    double[] $bs = new double[$n];
         |    long[] $bi = new long[$n];
         |    java.util.Arrays.fill($bs, Double.NEGATIVE_INFINITY);
         |    for (int $c = 0; $c < $nCents; $c++) {
         |      double $acc = 0.0d;
         |      for (int $k = 0; $k < $dim; $k++)
         |        $acc += $vec[$k] * $m[$c * $dim + $k];
         |      int $pos = $n;
         |      while ($pos > 0 && ($acc > $bs[$pos - 1] ||
         |          ($acc == $bs[$pos - 1] && $cid[$c] < $bi[$pos - 1])))
         |        $pos--;
         |      if ($pos < $n) {
         |        for (int $mm = $n - 1; $mm > $pos; $mm--) {
         |          $bs[$mm] = $bs[$mm - 1]; $bi[$mm] = $bi[$mm - 1];
         |        }
         |        $bs[$pos] = $acc; $bi[$pos] = $cid[$c];
         |      }
         |    }
         |    $out = $bi;
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out); }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** Column-level entry points for the native vector expressions. */
object VecExpressions {
  def vecDot(a: Column, b: Column): Column =
    ExpressionUtils.column(VecDot(ExpressionUtils.expression(a),
      ExpressionUtils.expression(b)))

  def vecDist2(a: Column, b: Column): Column =
    ExpressionUtils.column(VecDist2(ExpressionUtils.expression(a),
      ExpressionUtils.expression(b)))

  def hyperplaneSig(vec: Column, matrix: Array[Double], dim: Int): Column =
    ExpressionUtils.column(HyperplaneSig(ExpressionUtils.expression(vec),
      matrix, dim))

  def nearestCells(vec: Column, matrix: Array[Double], ids: Array[Long],
                   dim: Int, topN: Int): Column =
    ExpressionUtils.column(NearestCells(ExpressionUtils.expression(vec),
      matrix, ids, dim, topN))
}
