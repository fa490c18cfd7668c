package graft.ml

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.classification.{GBTClassifier, LogisticRegression}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ML trade filter: train a classifier on bar features to predict the next
  * bar's direction and score every bar.
  *
  * Reference: /root/reference/scripts/backtest/run_ml_filter_v1.py and the
  * run_ml_* family (sklearn models over engineered features filtering router
  * entries). Re-expressed with Spark MLlib — the model trains distributed
  * (LBFGS over partitioned data) and scoring is a narrow map, so the same
  * pipeline runs unchanged on a cluster at full history scale.
  */
object MlFilter {

  /** Label each bar with the sign of the NEXT bar's close move (anti-lookahead:
    * features at t predict t+1). */
  def withLabel(bars: DataFrame, symbolCol: String = "symbol",
                tsCol: String = "bar_ts_ms"): DataFrame = {
    val w = Window.partitionBy(symbolCol).orderBy(tsCol)
    bars.withColumn("label",
      when(lead(col("close"), 1).over(w) > col("close"), 1.0).otherwise(0.0))
      .withColumn("_has_next", lead(col("close"), 1).over(w).isNotNull)
      .where(col("_has_next")).drop("_has_next")
  }

  /** Train on the feature columns and score every row; returns the input
    * plus `probability_up` and `prediction`. Deterministic for a fixed
    * dataset (LBFGS / seeded GBT, no sampling). 15 iterations converge this
    * 3-feature logistic filter; each extra pass is one more treeAggregate
    * over the corpus, so the cap is a direct throughput lever at scale.
    *
    * `classifier` picks the model family behind the same interface:
    * "lr" (logistic regression, the run_ml_filter_v1.py analogue) or "gbt"
    * (gradient-boosted trees, the run_ml_m5/m15 tree-model family). Both
    * emit probability/prediction, so [[confusion]] works unchanged.
    *
    * The assembled iterate is cached only for the duration of training (the
    * optimizer re-reads it once per iteration) and unpersisted before
    * returning — the returned scored frame recomputes the feature lineage
    * once when consumed, and the session's block manager is left clean (no
    * cache accumulation across a long-lived session's many queries). */
  def trainScore(labeled: DataFrame, featureCols: Seq[String],
                 maxIter: Int = 10, classifier: String = "lr"): DataFrame = {
    val clean = labeled.na.drop(featureCols :+ "label")
    // repartition — NOT coalesce — right-sizes the task count for the
    // iterative phase: every optimizer pass is one job over these
    // partitions, so tiny partitions are pure scheduler overhead, but
    // coalesce would fold the upstream window lineage down to the same low
    // parallelism; the shuffle boundary keeps feature computation wide and
    // only the cached iterate narrow.
    val assembled = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
      .transform(clean)
      .repartition(8)
      .cache()
    val model: Transformer = classifier match {
      case "lr" =>
        new LogisticRegression().setMaxIter(maxIter).setRegParam(0.01)
          .fit(assembled)
      case "gbt" =>
        new GBTClassifier().setMaxIter(maxIter).setMaxDepth(3).setSeed(42L)
          .fit(assembled)
      case other =>
        throw new IllegalArgumentException(
          s"classifier must be 'lr' or 'gbt', got '$other'")
    }
    val scored = model.transform(assembled)
      // vector_to_array keeps the probability extraction inside Catalyst
      // (codegen'd array access) instead of a black-box Scala UDF
      .withColumn("probability_up",
        element_at(vector_to_array(col("probability")), 2))
      .drop("features", "rawPrediction", "probability")
    assembled.unpersist(false)
    scored
  }

  /** Per-symbol confusion-matrix rollup of a scored frame. */
  def confusion(scored: DataFrame, symbolCol: String = "symbol"): DataFrame =
    scored.groupBy(col(symbolCol))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("label") === 1.0 && col("prediction") === 1.0, 1L).otherwise(0L)).as("tp"),
        sum(when(col("label") === 0.0 && col("prediction") === 0.0, 1L).otherwise(0L)).as("tn"),
        sum(when(col("label") === 0.0 && col("prediction") === 1.0, 1L).otherwise(0L)).as("fp"),
        sum(when(col("label") === 1.0 && col("prediction") === 0.0, 1L).otherwise(0L)).as("fn"))
      .withColumn("accuracy",
        round((col("tp") + col("tn")).cast("double") / col("n"), 6))
}
