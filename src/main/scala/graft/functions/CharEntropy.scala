package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{DataType, DataTypes, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document character-distribution stats in ONE pass over the string:
  * code-point count, distinct code-point count, and Shannon entropy in
  * bits/char — the cheap gibberish/repetition signal web-scale quality
  * filters run before anything tokenizes (near-zero entropy = "aaaa…"
  * keyboard mash or padding; implausibly high entropy = base64/binary
  * spill). Mirrors the reference's per-frame data-hygiene probes
  * (`src/bfdl/transforms/integrity_checks.py:1` checks structural health
  * of bar frames; this is the text-corpus analogue).
  *
  * Why a native expression: the HOF formulation needs a per-distinct-char
  * `filter` scan (O(distinct·len) per row) or an explode + two shuffles at
  * corpus grain. One JVM pass with a counting map is O(len), map-only, and
  * keeps the quality gate a pure projection on the scan at 100 TB.
  *
  * Entropy is computed as `log2(N) − Σ n_c·log2(n_c) / N` — the
  * subtraction form never emits −0.0 (a single-repeated-char doc is
  * exactly 0.0), so downstream rounding agrees with engines that
  * normalize signed zeros. Summation iterates code points in ascending
  * order, making the float result a pure function of the character
  * multiset (not of any partitioning or map iteration order).
  *
  * Empty/whitespace-only strings still have code points ("" alone yields
  * N = 0 → null entropy, null distinct count). */
case class CharEntropy(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", DataTypes.LongType, nullable = false),
    StructField("n_distinct_chars", DataTypes.LongType, nullable = true),
    StructField("entropy_bits", DataTypes.DoubleType, nullable = true)))

  override def nullable: Boolean = child.nullable
  override def prettyName: String = "char_entropy"

  private val Log2 = math.log(2.0)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // TreeMap-free determinism: count into a HashMap, then fold the counts
    // in ascending code-point order so the float sum is order-stable.
    val counts = new java.util.HashMap[Int, Long]()
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts.merge(cp, 1L, (a, b) => a + b)
      i += Character.charCount(cp)
      n += 1L
    }
    if (n == 0L) {
      InternalRow(0L, null, null)
    } else {
      val keys = new Array[Int](counts.size)
      val it = counts.keySet().iterator()
      var j = 0
      while (it.hasNext) { keys(j) = it.next(); j += 1 }
      java.util.Arrays.sort(keys)
      var acc = 0.0
      j = 0
      while (j < keys.length) {
        val c = counts.get(keys(j)).toDouble
        acc += c * (math.log(c) / Log2)
        j += 1
      }
      val h = math.log(n.toDouble) / Log2 - acc / n.toDouble
      InternalRow(n, counts.size.toLong, h)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
