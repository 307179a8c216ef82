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
    dt match {
      case FloatType   => arr.getFloat(i).toDouble
      case DoubleType  => arr.getDouble(i)
      case ByteType    => arr.getByte(i).toDouble
      case ShortType   => arr.getShort(i).toDouble
      case IntegerType => arr.getInt(i).toDouble
      case LongType    => arr.getLong(i).toDouble
      case other => throw new IllegalStateException(s"unreachable: $other")
    }

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
    dt match {
      case FloatType   => s"(double) $arr.getFloat($i)"
      case DoubleType  => s"$arr.getDouble($i)"
      case ByteType    => s"(double) $arr.getByte($i)"
      case ShortType   => s"(double) $arr.getShort($i)"
      case IntegerType => s"(double) $arr.getInt($i)"
      case LongType    => s"(double) $arr.getLong($i)"
      case other => throw new IllegalStateException(s"unreachable: $other")
    }

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

/** Column-level entry points for the native vector expressions. */
object VecExpressions {
  def vecDot(a: Column, b: Column): Column =
    ExpressionUtils.column(VecDot(ExpressionUtils.expression(a),
      ExpressionUtils.expression(b)))

  def vecDist2(a: Column, b: Column): Column =
    ExpressionUtils.column(VecDist2(ExpressionUtils.expression(a),
      ExpressionUtils.expression(b)))
}
