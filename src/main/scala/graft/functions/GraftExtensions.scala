package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension entry point: registers the native vector expressions
  * as SQL functions so `spark.sql("SELECT vec_dot(a, b) ...")` works.
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * or `SparkSession.builder.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  /** Register the same function set on an already-running session (the
    * `spark.sql.extensions` config only applies at session creation). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graft.FunctionInstaller.install(spark, functions)

  private def binary(name: String, clazz: Class[_],
                     build: (Expression, Expression) => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, name),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"$name expects 2 arguments, got ${children.length}")
        build(children(0), children(1))
      })

  /** The injectable function set (also usable with a bare
    * `FunctionRegistry` in tests). */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    binary("vec_dot", classOf[VecDot], VecDot(_, _)),
    binary("vec_dist2", classOf[VecDist2], VecDist2(_, _)))
}
