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
}
