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

  /** Build a DataFrame over an arbitrary LogicalPlan (the bridge the
    * graft custom-operator nodes — e.g. `graft.plans.GroupTopKNode` —
    * use to re-enter the public Dataset API; `Dataset.ofRows` is
    * private[sql]). */
  def ofRows(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan behind a DataFrame. */
  def logicalPlan(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** EAGER Column → catalyst conversion via the session's converter.
    * [[expr]] above wraps lazily as a `ColumnNodeExpression` placeholder
    * that only the analyzer's column-node pass unwraps — inside a
    * CUSTOM logical node that pass never fires, the placeholder reaches
    * the executor closure, and its `sql.internal.SortOrder` payload is
    * not serializable (the GroupTopK lesson). This converts before the
    * plan is built, so custom nodes carry plain catalyst expressions. */
  def expression(spark: SparkSession, c: Column): Expression =
    spark.asInstanceOf[classic.SparkSession].expression(c)

  /** Register a function on a live session's FunctionRegistry (the
    * post-build counterpart of SparkSessionExtensions.injectFunction). */
  def registerFunction(
      spark: SparkSession,
      ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
}
