package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark's `private[sql]` Column ↔ Expression
  * conversions, so graft's native Catalyst expressions (e.g.
  * `graft.functions.CosineSimilarity`) can surface as Columns. This is the
  * conventional extension-point shim; no Spark internals are modified. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
