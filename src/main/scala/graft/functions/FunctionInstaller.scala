package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers function builders on an EXISTING session's registry.
  *
  * `spark.sql.extensions` only applies at session construction; a library
  * handed a live session (the driver's contract for `SparkEntry.queries`)
  * needs this post-hoc path. Lives under `org.apache.spark.sql` for
  * `private[sql]` access to `sessionState` — the same namespace pattern
  * Spark extension libraries use publicly.
  */
object FunctionInstaller {

  /** Wrap a catalyst Expression as a user-facing Column. */
  def column(e: Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** Unwrap a Column to its catalyst Expression. */
  def expression(c: org.apache.spark.sql.Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  def install(spark: SparkSession,
              fns: Seq[(FunctionIdentifier, ExpressionInfo,
                Seq[Expression] => Expression)]): Unit =
    fns.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(ident, info, builder)
    }
}
