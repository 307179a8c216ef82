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

  /** DataFrame over executor-built `InternalRow`s (values already in
    * catalyst form, e.g. `UTF8String`) — skips the per-field
    * `ExpressionEncoder` pass `createDataFrame(rdd, schema)` runs on
    * external `Row`s. The wire sources use this to hand their decoded
    * byte slices straight to the scan; `RDDScanExec` applies an
    * `UnsafeProjection` per partition, so rows may share transient
    * buffers (each row's values must stay valid only until the next
    * `next()`). */
  def internalDataFrame(spark: SparkSession,
                        rows: org.apache.spark.rdd.RDD[
                          org.apache.spark.sql.catalyst.InternalRow],
                        schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rows, schema)

  def install(spark: SparkSession,
              fns: Seq[(FunctionIdentifier, ExpressionInfo,
                Seq[Expression] => Expression)]): Unit =
    fns.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(ident, info, builder)
    }
}
