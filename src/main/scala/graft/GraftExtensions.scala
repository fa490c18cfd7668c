package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.CosineSimilarity

/** SparkSessionExtensions entry point: registers graft's native expressions
  * so any session started with
  * `spark.sql.extensions=graft.GraftExtensions` (or tests calling
  * `new GraftExtensions()(ext)`) can use them from SQL —
  * e.g. `SELECT cosine_sim(a, b)`.
  *
  * This is the supported extension mechanism (no session internals), and the
  * same hook would carry custom optimizer rules or strategies if an operator
  * ever needs whole-plan treatment.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2, "cosine_sim(a, b) takes two array<double> arguments")
        CosineSimilarity(exprs.head, exprs(1))
      }))
  }
}
