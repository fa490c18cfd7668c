package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All positional word `n`-gram hashes of a token array in ONE fused JVM
  * pass: for every start `i` in `[0, len-n]`, the xxhash64 (seed 42 — the
  * engine's `xxhash64(...)` SQL function) of the gram string
  * `concat_ws(" ", toks[i..i+n-1])`. Returns `array<long>` of length
  * `len-n+1` (empty when the document is shorter than one gram); pair it
  * with `posexplode` for the (position, hash) stream.
  *
  * Why native rather than the HOF formulation
  * (`transform(sequence(...), p => xxhash64(concat_ws(" ", slice(arr, p,
  * n))))`, kept behind the injectable-hash test seam of
  * [[graft.llm.Dedup.repeatedNgramTrimHashed]] for the equivalence pin):
  * higher-order functions are CodegenFallback and each position pays an
  * interpreted lambda call, an ArrayData slice allocation, a fresh
  * UTF8String concat and a struct row. One imperative loop reuses the
  * parts buffer and hashes each gram's bytes directly — the
  * [[WinnowFingerprints]] rationale at trim grain (guide §4: eliminate
  * non-codegen expressions from the hot path).
  *
  * Cross-engine contract: bytes equal ⇒ hash equal. The gram bytes are
  * exactly `concat_ws(" ", ...)`'s output (single-space join, null
  * elements skipped — `UTF8String.concatWs` IS concat_ws's
  * implementation), and the hash is
  * `XxHash64.hashUnsafeBytes(bytes, offset, len, 42)` — exactly what
  * Spark's `xxhash64` computes for a StringType input. The string-grain
  * confirm stages downstream therefore keep nominating/confirming against
  * `xxhash64(concat_ws(...))` unchanged. */
case class PositionalGramHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"positional_gram_hashes: n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "positional_gram_hashes"

  // reusable per-thread gram buffer (expression instances can be shared
  // across task threads); grows to the longest gram seen and is then
  // allocation-free — the eval loop performs zero allocations per gram
  @transient private lazy val buf =
    ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](1024))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) {
      // null elements stay null; the assembly below skips them (and their
      // separator) exactly like concat_ws does
      toks(i) = if (arr.isNullAt(i)) null
        else arr.getUTF8String(i)
      i += 1
    }
    val out = new Array[Any](len - n + 1)
    i = 0
    while (i <= len - n) {
      // gram bytes = non-null tokens i..i+n-1 joined by single 0x20
      var need = 0
      var j = i
      while (j < i + n) {
        val t = toks(j)
        if (t != null) need += t.numBytes + 1
        j += 1
      }
      need = math.max(need - 1, 0)
      var b = buf.get()
      if (b.length < need) {
        b = new Array[Byte](java.lang.Integer.highestOneBit(need) * 2)
        buf.set(b)
      }
      var off = 0
      j = i
      while (j < i + n) {
        val t = toks(j)
        if (t != null) {
          if (off > 0) { b(off) = ' '; off += 1 }
          t.writeToMemory(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off)
          off += t.numBytes
        }
        j += 1
      }
      out(i) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
          off, 42L)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
