package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression computing a 64-bit SimHash fingerprint from an
  * `array<string>` token column in one fused loop.
  *
  * Semantics match the higher-order formulation in [[graft.llm.SimHash]]:
  * each token hashed with Spark's xxhash64 (seed 42); bit b of the
  * fingerprint is set when the signed bit-count Σ(±1) over tokens is
  * positive. The HOF version walks a 64-element array per token through
  * interpreted lambdas; this emits two primitive loops in generated code.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sums = new Array[Int](64)
    var j = 0
    val n = arr.numElements()
    while (j < n) {
      val h = XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
        b += 1
      }
      j += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (sums(b) > 0) fp |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(fp)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val sums = ctx.freshName("sums")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val fp = ctx.freshName("fp")
      val numToks = ctx.freshName("numToks")
      s"""
         |int[] $sums = new int[64];
         |int $numToks = $arr.numElements();
         |for (int $j = 0; $j < $numToks; $j++) {
         |  long $h = org.apache.spark.sql.catalyst.expressions.XXH64
         |    .hashUTF8String($arr.getUTF8String($j), 42L);
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $sums[$b]++; else $sums[$b]--;
         |  }
         |}
         |long $fp = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($sums[$b] > 0) $fp |= (1L << $b);
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
