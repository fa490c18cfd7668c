package graft.ml

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.{Sampling, TextAnalysis}

/** Model-based document quality filtering — the GPT-3/LLaMA recipe that
  * sits above the row-local Gopher rules: train a linear classifier to
  * distinguish a small CURATED seed corpus (WebText/Wikipedia stand-in:
  * one trusted source) from the raw corpus, then score every document
  * with P(seed-like) and let the pipeline keep the high scorers. The
  * fastText-style shape: hashed bag-of-words features (no vocabulary to
  * build or ship) into logistic regression.
  *
  * Spark-first at 100 TB: feature hashing is stateless per-row (HashingTF
  * — murmur3 mod numFeatures, no fitted vocabulary), the LR fit is
  * LBFGS treeAggregate passes over the (small) labeled frame only, and
  * scoring the full corpus is a narrow map with the model's coefficient
  * vector broadcast — the same structure as [[MlFilter]], so cluster
  * execution is unchanged from local.
  */
object QualityClassifier {

  /** Weak-supervision training frame: label 1.0 for every seed-source doc,
    * 0.0 for a deterministic md5-bucket sample of the rest sized to
    * `negPerPos` negatives per positive (capped at all of them). The
    * negative sample reuses [[Sampling.hashBucket]], so the frame is
    * reproducible across runs/engines/partitionings and fully
    * SQL-expressible — the hash-checked deterministic half of the
    * operator, mirroring [[MlFilter.withLabel]]'s split. Class counts are
    * derived in-plan (one 2-row aggregation, broadcast back), never
    * driver-side. */
  def labeled(docs: DataFrame, seedSource: String, negPerPos: Double = 2.0,
              sourceCol: String = "source", idCol: String = "doc_id",
              buckets: Int = 10000): DataFrame = {
    val isSeed = (col(sourceCol) === seedSource).cast("int")
    val counts = docs.agg(
      sum(isSeed).as("_n_pos"),
      sum(lit(1) - isSeed).as("_n_neg"))
    val withCounts = docs.crossJoin(broadcast(counts))
    withCounts
      .withColumn("_neg_frac",
        least(lit(1.0), lit(negPerPos) * col("_n_pos") /
          greatest(col("_n_neg"), lit(1L))))
      .where(col(sourceCol) === seedSource ||
        Sampling.hashBucket(col(idCol), buckets) < col("_neg_frac") * buckets)
      .withColumn("label", (col(sourceCol) === seedSource).cast("double"))
      .drop("_n_pos", "_n_neg", "_neg_frac")
  }

  /** Train-batch / score-anywhere split: fit the hashed-BoW LR once and
    * export `(intercept, coefficients)` — numFeatures doubles, the ENTIRE
    * model state (feature hashing is stateless). [[scoreStateless]] then
    * scores any frame, including a structured stream, without MLlib on
    * the path. Same split as the DSIR scorer's exportModel/scoreStateless
    * pair. */
  def exportModel(labeledDf: DataFrame, numFeatures: Int = 4096,
                  maxIter: Int = 15,
                  textCol: String = "text"): (Double, Array[Double]) = {
    val (model, _) = fit(labeledDf, numFeatures, maxIter, textCol)
    (model.intercept, model.coefficients.toArray)
  }

  /** The single fit pipeline both [[exportModel]] and [[trainScore]] use —
    * one definition so the exported serving path can never desynchronize
    * from the batch-scoring path (tokenizer, hashing width, regularizer,
    * iterate hygiene all shared; QualityClassifierSpec pins 1e-9 parity
    * on top). */
  private def fit(labeledDf: DataFrame, numFeatures: Int, maxIter: Int,
                  textCol: String)
      : (org.apache.spark.ml.classification.LogisticRegressionModel,
         HashingTF) = {
    val tf = new HashingTF().setInputCol("_toks").setOutputCol("features")
      .setNumFeatures(numFeatures)
    val train = tf.transform(tokenize(labeledDf, textCol))
      .repartition(8).cache()
    val model = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(0.01)
      .fit(train)
    train.unpersist(false)
    (model, tf)
  }

  private def tokenize(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("_toks",
      filter(TextAnalysis.tokens(lower(trim(col(textCol)))), t => t =!= ""))

  /** Score from the exported model with pure column algebra:
    * `sigmoid(intercept + Σ_tokens coef[bucket(token)])` — the exact
    * HashingTF+LR margin (term counts distribute over the sum), with the
    * coefficient array a broadcast literal and the bucket from the native
    * [[graft.functions.HashingTfBucket]] expression (HashingTF's own
    * murmur3 variant — NOT SQL `hash()`, which is a different seed-42
    * murmur flavor and reads the wrong coefficients). Stateless and
    * codegen'd: runs unchanged under Structured Streaming per
    * micro-batch — the model-serving half of a streaming quality gate.
    * Parity with the MLlib transform is pinned in tests. */
  def scoreStateless(docs: DataFrame, intercept: Double,
                     coefs: Array[Double],
                     textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    val numFeatures = coefs.length
    val coefLit = typedLit(coefs.toSeq)
    def bucket(t: org.apache.spark.sql.Column) = GraftBridge.column(
      graft.functions.HashingTfBucket(GraftBridge.expression(t), numFeatures))
    val toks = filter(TextAnalysis.tokens(lower(trim(col(textCol)))),
      t => t =!= "")
    val margin = aggregate(toks, lit(intercept), (acc, t) =>
      acc + element_at(coefLit, bucket(t) + 1))
    docs.withColumn("quality_prob", lit(1.0) / (lit(1.0) + exp(-margin)))
  }

  /** Fit hashed-BoW logistic regression on `labeledDf` and score every row
    * of `docs` with `quality_prob` = P(seed-like). Stateless feature
    * hashing (numFeatures buckets) means the only fitted state is the LR
    * coefficient vector — scoring is a broadcast-free narrow map. The
    * cached training iterate is unpersisted before returning (same
    * hygiene as [[MlFilter.trainScore]]). */
  def trainScore(docs: DataFrame, labeledDf: DataFrame,
                 numFeatures: Int = 4096, maxIter: Int = 15,
                 textCol: String = "text"): DataFrame = {
    val (model, tf) = fit(labeledDf, numFeatures, maxIter, textCol)
    model.transform(tf.transform(tokenize(docs, textCol)))
      .withColumn("quality_prob",
        element_at(vector_to_array(col("probability")), 2))
      .drop("_toks", "features", "rawPrediction", "probability", "prediction")
  }
}
