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

  private def unary(name: String, clazz: Class[_],
                    build: Expression => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, name),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"$name expects 1 argument, got ${children.length}")
        build(children.head)
      })

  /** Evaluate a foldable argument to its Scala string (SQL surface for
    * expressions whose second argument is config, not data). */
  private def foldableString(name: String, e: Expression): String = {
    require(e.foldable, s"$name: argument must be a literal")
    e.eval() match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => throw new IllegalArgumentException(
        s"$name: expected a string literal, got $other")
    }
  }

  /** The injectable function set (also usable with a bare
    * `FunctionRegistry` in tests). */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    binary("vec_dot", classOf[VecDot], VecDot(_, _)),
    binary("vec_dist2", classOf[VecDist2], VecDist2(_, _)),
    unary("copy_unescape", classOf[CopyUnescape], CopyUnescape(_)),
    (FunctionIdentifier("unicode_normalize"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName,
        "unicode_normalize"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"unicode_normalize expects (text, form), got ${children.length}")
        UnicodeNormalize(children.head,
          foldableString("unicode_normalize", children(1)))
      }),
    // SQL surface: bpe_encode(text, array(array('e','s'), array('es','t')))
    // — the merge table is a foldable array-of-pairs literal
    (FunctionIdentifier("bpe_encode"),
      new ExpressionInfo(classOf[BpeEncode].getName, "bpe_encode"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"bpe_encode expects (text, merges), got ${children.length}")
        val m = children(1)
        require(m.foldable, "bpe_encode: merges must be a literal array")
        val merges = m.eval() match {
          case a: org.apache.spark.sql.catalyst.util.ArrayData =>
            (0 until a.numElements()).map { i =>
              val p = a.getArray(i)
              require(p != null && p.numElements() == 2 &&
                !p.isNullAt(0) && !p.isNullAt(1),
                "bpe_encode: each merge must be a 2-element array of " +
                  "non-null strings")
              (p.getUTF8String(0).toString, p.getUTF8String(1).toString)
            }
          case other => throw new IllegalArgumentException(
            s"bpe_encode: expected array of pairs, got $other")
        }
        BpeEncode(children.head, merges)
      }))
}
