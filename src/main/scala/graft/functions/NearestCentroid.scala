package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StructField, StructType}

/** Native Catalyst expression: nearest centroid of an `array<double>`
  * vector over a literal codebook — `struct(cell int, sim double)` with
  * `sim` the max cosine rounded half-away-from-zero to 6dp and ties broken
  * to the LOWEST cell (rounding before the argmax keeps tie-breaks
  * engine-stable against the DuckDB oracle).
  *
  * Why an Expression and not k [[CosineSimilarity]] columns in an `array`:
  * one projected column per centroid means one codegen'd expression per
  * cell, which stops scaling past a few hundred cells (JIT method limits,
  * then interpreted fallback) — while SemDeDup-style clustering wants
  * thousands of cells at corpus scale. This emits ONE fused loop over a
  * `double[][]` reference object: the vector is read once, centroid norms
  * are precomputed at plan construction, and the whole k×dim scan stays
  * inside WholeStageCodegen regardless of k.
  *
  * Null semantics: null if the input vector is null or has zero norm (no
  * cosine is defined); zero-norm centroids are skipped the same way.
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("sim", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroid"

  private lazy val cellNorms: Array[Double] = centroids.map { c =>
    var s = 0.0
    var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    math.sqrt(s)
  }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData].toDoubleArray()
    var nv = 0.0
    var i = 0
    while (i < v.length) { nv += v(i) * v(i); i += 1 }
    val nvs = math.sqrt(nv)
    var best = -2.0
    var bestCell = -1
    var c = 0
    while (c < centroids.length) {
      val cc = centroids(c)
      val den = nvs * cellNorms(c)
      if (den != 0.0) {
        val m = math.min(v.length, cc.length)
        var dot = 0.0
        i = 0
        while (i < m) { dot += v(i) * cc(i); i += 1 }
        val s = dot / den
        val r = (if (s < 0) -1.0 else 1.0) *
          math.floor(math.abs(s) * 1e6 + 0.5) / 1e6
        if (r > best) { best = r; bestCell = c }
      }
      c += 1
    }
    if (bestCell < 0) null
    else new GenericInternalRow(Array[Any](bestCell, best))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val nRef = ctx.addReferenceObj("cellNorms", cellNorms, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val vv = ctx.freshName("vv")
      val nv = ctx.freshName("nv")
      val nvs = ctx.freshName("nvs")
      val best = ctx.freshName("best")
      val bestCell = ctx.freshName("bestCell")
      val c = ctx.freshName("c")
      val cc = ctx.freshName("cc")
      val den = ctx.freshName("den")
      val m = ctx.freshName("m")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val r = ctx.freshName("r")
      s"""
         |double[] $vv = $v.toDoubleArray();
         |double $nv = 0.0;
         |for (int $i = 0; $i < $vv.length; $i++) { $nv += $vv[$i] * $vv[$i]; }
         |double $nvs = java.lang.Math.sqrt($nv);
         |double $best = -2.0;
         |int $bestCell = -1;
         |for (int $c = 0; $c < $cRef.length; $c++) {
         |  double[] $cc = $cRef[$c];
         |  double $den = $nvs * $nRef[$c];
         |  if ($den != 0.0) {
         |    int $m = java.lang.Math.min($vv.length, $cc.length);
         |    double $dot = 0.0;
         |    for (int $j = 0; $j < $m; $j++) { $dot += $vv[$j] * $cc[$j]; }
         |    double $s = $dot / $den;
         |    double $r = ($s < 0 ? -1.0 : 1.0) *
         |      java.lang.Math.floor(java.lang.Math.abs($s) * 1e6 + 0.5) / 1e6;
         |    if ($r > $best) { $best = $r; $bestCell = $c; }
         |  }
         |}
         |if ($bestCell < 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{ java.lang.Integer.valueOf($bestCell),
         |                  java.lang.Double.valueOf($best) });
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
