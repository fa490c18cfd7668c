package graft.functions

import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native bucket index matching
  * [[org.apache.spark.ml.feature.HashingTF]] EXACTLY — the serving-side
  * twin of the training-side featurizer. HashingTF's murmur3 variant
  * (`hashUnsafeBytes2`, seed 42) is NOT the one SQL `hash()` uses
  * (`hashUnsafeBytes`), so a served model scored against `pmod(hash(t),
  * n)` silently reads the wrong coefficients; this expression delegates
  * to `HashingTF.indexOf` itself (bound as a codegen reference object),
  * so train-time and serve-time buckets cannot drift — the
  * QualityClassifierSpec parity case is the proof.
  */
case class HashingTfBucket(child: Expression, numFeatures: Int)
    extends UnaryExpression {

  @transient private lazy val htf =
    new HashingTF().setNumFeatures(numFeatures)

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "hashingtf_bucket"

  override def nullSafeEval(input: Any): Any =
    java.lang.Integer.valueOf(
      htf.indexOf(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("htf", htf,
      classOf[HashingTF].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.indexOf($c.toString());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
