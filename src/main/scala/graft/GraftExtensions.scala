package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{CosineSimilarity, SimHash64, WordNgrams, WordShingles}

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
    ext.injectFunction((
      new FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2 && exprs(1).foldable,
          "word_shingles(text, n) takes a text column and a literal n")
        WordShingles(exprs.head,
          exprs(1).eval().asInstanceOf[Number].intValue())
      }))
    ext.injectFunction((
      new FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, "word_ngrams"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2 && exprs(1).foldable,
          "word_ngrams(text, n) takes a text column and a literal n")
        WordNgrams(exprs.head,
          exprs(1).eval().asInstanceOf[Number].intValue())
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 1, "simhash64(tokens) takes one array<string> argument")
        SimHash64(exprs.head)
      }))
  }
}
