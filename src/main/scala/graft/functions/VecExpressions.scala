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
}
