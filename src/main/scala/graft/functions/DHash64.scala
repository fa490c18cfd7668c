package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** 64-bit perceptual difference hash (dHash) over a binary payload — the
  * standard image near-dup fingerprint (Krawetz's dHash: downscale to a
  * 9×8 luminance grid, hash the horizontal gradient signs), expressed
  * over an OPAQUE byte payload: the container codecs are not in this
  * environment, so the "downscale" treats the payload as a row-major
  * byte image and block-MEANS it into the 9×8 grid (72 contiguous
  * equal-share blocks — the honest resize stub: deterministic, local
  * edits perturb only their own blocks, exactly the property the real
  * pixel pipeline has), while the gradient-sign hash itself is the real
  * dHash algebra. Bit r·8+c is set when cell (r,c) < cell (r,c+1).
  * Swapping in a real decoder means replacing the block-mean sampler
  * with decoded luminance — the hash, banding, and verify join are
  * unchanged.
  *
  * Why an Expression: 72 block means per row over raw bytes is a fused
  * primitive loop (like [[PqCodes]]) — the column-algebra formulation
  * would be 72 substring/conv chains per row. Stays inside whole-stage
  * codegen; empty payloads hash to null (nothing to fingerprint).
  */
case class DHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "dhash64"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"dhash64 needs BINARY input, got ${child.dataType}")
  }
  override protected def withNewChildInternal(newChild: Expression): DHash64 =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    if (bytes.isEmpty) null
    else java.lang.Long.valueOf(DHash64.hash(bytes))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"""
         |if ($b.length == 0) { ${ev.isNull} = true; }
         |else { ${ev.value} = graft.functions.DHash64$$.MODULE$$.hash($b); }
       """.stripMargin)
}

object DHash64 {
  /** Block-mean 9×8 grid + horizontal gradient signs; see class doc. */
  def hash(bytes: Array[Byte]): Long = {
    val n = bytes.length
    val cells = new Array[Double](72)
    var k = 0
    while (k < 72) {
      val lo = (k.toLong * n / 72).toInt
      var hi = ((k + 1).toLong * n / 72).toInt
      if (hi <= lo) hi = math.min(lo + 1, n)
      var s = 0.0
      var i = lo
      while (i < hi) { s += (bytes(i) & 0xFF); i += 1 }
      cells(k) = s / math.max(hi - lo, 1)
      k += 1
    }
    var h = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (cells(r * 9 + c) < cells(r * 9 + c + 1)) h |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    h
  }
}
