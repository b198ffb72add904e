package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⟷ Catalyst-Expression bridge for graft's native expressions.
  *
  * Spark 4 made `Column` backend-agnostic (it wraps a ColumnNode, not an
  * Expression); the classic-backend conversions live in
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * `private[sql]`. Custom-expression libraries conventionally expose them
  * through a small shim in the `org.apache.spark.sql` package — this is
  * that shim, and the only file in the repo outside the `graft` namespace.
  */
object GraftSql {

  /** Wrap a raw Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Unwrap a Column to its Catalyst expression (classic backend). */
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
