package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression conversions so the
  * graft library can project its custom Catalyst expressions
  * (`graft.functions.*`) through the public DataFrame API without requiring
  * `SparkSessionExtensions` registration on every session (the driver
  * constructs its own sessions for the smoke test). Standard pattern used
  * by Spark extension libraries.
  */
object GraftColumn {
  /** Wrap a Catalyst expression as a user-facing Column. */
  def apply(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** The Catalyst expression behind a Column. */
  def expr(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Build an AnalysisException (its constructors are private[sql]) — used
    * by the graft SQL-function builders to reject wrong arities at analysis
    * time instead of failing inside codegen. USER_RAISED_EXCEPTION renders
    * the message verbatim as a normal user-facing analysis error (SQLSTATE
    * P0001); INTERNAL_ERROR (XX000) would present a caller's arity mistake
    * as an engine bug. */
  def analysisError(msg: String): AnalysisException =
    new AnalysisException(
      errorClass = "USER_RAISED_EXCEPTION", messageParameters = Map("errorMessage" -> msg))

  /** Register a function on a live session's FunctionRegistry (the
    * post-build counterpart of SparkSessionExtensions.injectFunction). */
  def registerFunction(
      spark: SparkSession,
      ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
}
