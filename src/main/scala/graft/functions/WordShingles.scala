package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a case-folded text, in one JVM pass.
  *
  * Equivalent to the column composition in [[graft.llm.Dedup.shingles]]
  * (split on whitespace → sliding concat_ws → array_distinct) but evaluated
  * as a single expression: the HOF chain is interpreted per lambda per
  * element, and feeds both the MinHash signature and the Jaccard
  * verification, so it sits on the near-dup hot path twice.
  *
  * CodegenFallback: one virtual call per row into this tight loop — the
  * interpreted-lambda overhead, not codegen itself, was the cost.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "word_shingles"

  private val space = UTF8String.fromString(" ")
  private val ws = UTF8String.fromString("\\s+")

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toLowerCase
    // identical tokenization to split(lower(text), "\\s+") — UTF8String.split
    // is the regex split StringSplit uses; empty tokens intentionally kept
    val toks = text.split(ws, -1)
    val out = mutable.LinkedHashSet.empty[UTF8String]
    if (toks.length < n) {
      out += UTF8String.concatWs(space, toks.toIndexedSeq: _*)
    } else {
      var i = 0
      while (i + n <= toks.length) {
        val parts = new Array[UTF8String](n)
        System.arraycopy(toks, i, parts, 0, n)
        out += UTF8String.concatWs(space, parts.toIndexedSeq: _*)
        i += 1
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
