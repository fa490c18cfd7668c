package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst membership probe against a pre-built
  * [[org.apache.spark.util.sketch.BloomFilter]] over LONG keys — the
  * map-side primitive of Bloom decontamination: the benchmark-side filter
  * is built once (small side), shipped to every task inside this
  * expression (Spark's sketch `BloomFilter` is `Serializable`), and the
  * 100 TB corpus side stays a pure projection — no join, no shuffle, no
  * UDF. Codegen binds the deserialized filter as a reference object, so
  * the probe is one virtual call per row inside whole-stage codegen
  * (`mightContainLong` — a few XXH64 rounds over the bit array).
  *
  * False positives at the filter's configured FPP, never false negatives —
  * exactly the right direction for decontamination (flagging an extra
  * clean document costs a row; missing a contaminated one poisons the
  * eval). The exact [[graft.llm.Dedup.contaminationNgram]] join is the
  * verification twin.
  */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(input: Any): Any =
    java.lang.Boolean.valueOf(bloom.mightContainLong(input.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, h => s"${ev.value} = $ref.mightContainLong($h);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
