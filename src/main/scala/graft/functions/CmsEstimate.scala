package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Native Catalyst point-query against a pre-built
  * [[org.apache.spark.util.sketch.CountMinSketch]] over LONG keys — the
  * read side of sketch-based frequency profiling: the sketch is built in
  * ONE aggregation pass (a few KB at eps=1e-3 regardless of corpus size,
  * mergeable across partitions), and every later frequency question is
  * answered from the sketch alone — a map-side projection, no rescan, no
  * join against a count relation. Codegen binds the deserialized sketch
  * as a reference object (the sketch is `Serializable`), one
  * `estimateCount` call per row inside whole-stage codegen.
  *
  * CMS guarantees estimate ≥ true count, overshoot ≤ eps·N with the
  * sketch's confidence — the safe direction for stop-gram/boilerplate
  * thresholds (a gram can look MORE common than it is, never less).
  * Tests pin both bounds against the exact aggregation twin.
  */
case class CmsEstimate(child: Expression, cms: CountMinSketch)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "cms_estimate"

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      cms.estimateCount(java.lang.Long.valueOf(input.asInstanceOf[Long])))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cms", cms,
      classOf[CountMinSketch].getName)
    nullSafeCodeGen(ctx, ev, h =>
      s"${ev.value} = $ref.estimateCount(java.lang.Long.valueOf($h));")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
