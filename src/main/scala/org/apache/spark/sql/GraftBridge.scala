package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark's `private[sql]` Column ↔ Expression
  * conversions, so graft's native Catalyst expressions (e.g.
  * `graft.functions.CosineSimilarity`) can surface as Columns. This is the
  * conventional extension-point shim; no Spark internals are modified. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Unpersist the block-manager blocks behind a `localCheckpoint`ed frame
    * (its plan leaves are LogicalRDDs over persisted RDDs). Lets iterative
    * algorithms release superseded rounds instead of accumulating every
    * round's blocks for the life of the session. No-op on plans without
    * checkpointed leaves. */
  def releasePinned(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
