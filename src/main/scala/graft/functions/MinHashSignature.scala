package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression computing a k-value MinHash signature from an
  * `array<string>` shingle column in ONE fused loop.
  *
  * Semantics are identical to the higher-order-function formulation
  * (`aggregate(transform(shingles, xxhash64), ...)`): each shingle is hashed
  * with Spark's xxhash64 (seed 42), masked to 31 bits, and the k permutation
  * minima of (aᵢ·h + bᵢ) mod (2⁶¹−1) are tracked. The HOF version is
  * CodegenFallback — interpreted lambda dispatch per shingle per permutation;
  * this expression emits a primitive double loop inside WholeStageCodegen.
  *
  * @param child array<string> shingles
  * @param a     permutation multipliers (31-bit)
  * @param b     permutation offsets (31-bit)
  */
case class MinHashSignature(child: Expression, a: Seq[Long], b: Seq[Long])
    extends UnaryExpression {

  private val k = a.length
  require(b.length == k && k > 0, "a and b must be same non-zero length")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "minhash_signature"

  private val Prime = (1L << 61) - 1

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(k)(Prime)
    var j = 0
    val n = arr.numElements()
    while (j < n) {
      val h = XXH64.hashUTF8String(arr.getUTF8String(j), 42L) & 0x7fffffffL
      var i = 0
      while (i < k) {
        val v = (a(i) * h + b(i)) % Prime
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val aRef = ctx.addReferenceObj("minhashA", a.toArray, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", b.toArray, "long[]")
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val numShingles = ctx.freshName("numShingles")
      s"""
         |long[] $sig = new long[$k];
         |java.util.Arrays.fill($sig, ${Prime}L);
         |int $numShingles = $arr.numElements();
         |for (int $j = 0; $j < $numShingles; $j++) {
         |  long $h = org.apache.spark.sql.catalyst.expressions.XXH64
         |    .hashUTF8String($arr.getUTF8String($j), 42L) & 0x7fffffffL;
         |  for (int $i = 0; $i < $k; $i++) {
         |    long $v = ($aRef[$i] * $h + $bRef[$i]) % ${Prime}L;
         |    if ($v < $sig[$i]) $sig[$i] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
