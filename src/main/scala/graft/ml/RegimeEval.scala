package graft.ml

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Period-grain regime classification: build a coarse-period frame (OHLC +
  * last-known context features per period), label each period RANGE /
  * TREND_UP / TREND_DOWN from the forward return's train-quantile threshold,
  * train a 3-class logistic model on the TRAIN slice, and report per-slice
  * accuracy / macro-F1 / class distribution.
  *
  * Reference: /root/reference/scripts/backtest/run_ml_regime_month_v1.py
  * :99-113 (`build_monthly_frame`: month grid OHLC via first/max/min/last +
  * last feature per month), :155-168 (forward-return label from the train
  * quantile of |ret_fwd|), :78-96 (`macro_f1` / `class_dist`), :194-199
  * (one-vs-rest logistic); run_ml_regime_week_v1.py is the same at week
  * grain.
  *
  * Spark-first divergences:
  *  - the period frame is one hash aggregation (min_by/max_by), the same
  *    plan shape as [[graft.operators.Resample]] — not a sorted groupby;
  *  - the classifier is MLlib's multinomial LogisticRegression — ONE
  *    distributed LBFGS fit for all 3 classes instead of the reference's
  *    3 hand-rolled one-vs-rest gradient loops;
  *  - imputation/standardization statistics come from small train-slice
  *    aggregations (the frame is bounded by symbols × periods, never by
  *    tick volume — a century of months is 1200 rows/symbol, so the
  *    scalar collects here are boundary metadata, not a data-path
  *    collect; the distributed work is building the frame from bars).
  */
object RegimeEval {

  /** Coarse-period frame: per (symbol, truncated period) OHLC plus the last
    * NON-NULL value of each context feature in the period
    * (run_ml_regime_month_v1.py:99-113 — pandas `.last()` skips NaN, so a
    * warm-up-null feature at the period's final bar falls back to the last
    * bar where it was defined; a bare max_by would propagate the null).
    * One hash aggregation. */
  def periodFrame(bars: DataFrame, truncUnit: String,
                  featureCols: Seq[String], symbolCol: String = "symbol",
                  tsCol: String = "bar_ts"): DataFrame = {
    val ord = col(tsCol)
    val aggs =
      Seq(min_by(col("open"), ord).as("open"), max("high").as("high"),
        min("low").as("low"), max_by(col("close"), ord).as("close")) ++
        featureCols.map(f =>
          max_by(col(f), when(col(f).isNotNull, ord)).as(f))
    bars
      .groupBy(col(symbolCol), date_trunc(truncUnit, col(tsCol)).as("period_ts"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("period_ms", unix_millis(col("period_ts")))
  }

  /** Label + split + train + evaluate. Returns one row per slice
    * (TRAIN/VAL/TEST): n_samples, class distribution, accuracy, macro-F1.
    *
    * @param horizon       forward periods for the regime label
    * @param trendQuantile train quantile of |ret_fwd| that separates RANGE
    *                      from TREND_* (reference --trend-quantile, 0.60)
    */
  def evaluate(frame: DataFrame, featureCols: Seq[String], horizon: Int,
               trendQuantile: Double, trainEndMs: Long, valEndMs: Long,
               maxIter: Int = 50, symbolCol: String = "symbol"): DataFrame = {
    val w = Window.partitionBy(symbolCol).orderBy("period_ms")
    // The frame is bounded by symbols × periods (tiny) but its lineage is
    // the full bar aggregation + feature windows: materialize it ONCE so
    // the threshold/impute/moment collects, the LBFGS fit and the final
    // scoring don't each replay the heavy lineage. Released before return.
    val labeledRet = frame
      .withColumn("ret_fwd",
        lead(col("close"), horizon).over(w) /
          when(col("close") =!= 0.0, col("close")) - 1.0)
      .where(col("ret_fwd").isNotNull)
      .withColumn("set_name",
        when(col("period_ms") < trainEndMs, "TRAIN")
          .when(col("period_ms") < valEndMs, "VAL")
          .otherwise("TEST"))
      .repartition(4)
      .cache()
    // unpersist in finally: a require/fit failure must not leak the cached
    // frame for the session lifetime
    try {
    val train = labeledRet.where(col("set_name") === "TRAIN")
    // Label threshold + per-feature impute medians: small train-slice aggs
    // (exact percentile — the frame is periods × symbols, always tiny).
    val statRow = train.agg(
      expr(s"percentile(abs(ret_fwd), $trendQuantile)").as("thr"),
      featureCols.map(f => expr(s"percentile(`$f`, 0.5)").as(s"_med_$f")): _*
    ).head()
    // the reference raises on insufficient slice sizes
    // (run_ml_regime_month_v1.py:160-164); an empty TRAIN slice here would
    // silently produce a null threshold and all-RANGE labels instead
    require(!statRow.isNullAt(statRow.fieldIndex("thr")),
      s"RegimeEval: TRAIN slice empty or without usable forward returns " +
        s"(trainEndMs=$trainEndMs, horizon=$horizon)")
    // an all-null feature would make getAs[Double] unbox the null median to
    // 0.0 — a silent zero-impute; fail loudly like the threshold check
    val nullMed = featureCols
      .filter(f => statRow.isNullAt(statRow.fieldIndex(s"_med_$f")))
    require(nullMed.isEmpty,
      s"RegimeEval: feature(s) ${nullMed.mkString(", ")} are all-null in " +
        "the TRAIN slice — no impute median exists")
    val thr = statRow.getAs[Double]("thr")
    val med = featureCols.map(f => f -> statRow.getAs[Double](s"_med_$f")).toMap

    def labeled3(df: DataFrame): DataFrame = df.withColumn("label",
      when(col("ret_fwd") >= thr, 1.0)
        .when(col("ret_fwd") <= -thr, 2.0)
        .otherwise(0.0))

    val imputed = featureCols.foldLeft(labeled3(labeledRet)) { (df, f) =>
      df.withColumn(f, coalesce(col(f), lit(med(f))))
    }
    // Standardize with TRAIN moments (reference :183-188).
    val momAggs = featureCols.map(f => avg(col(f)).as(s"_mu_$f")) ++
      featureCols.map(f => stddev_pop(col(f)).as(s"_sd_$f"))
    val momRow = imputed.where(col("set_name") === "TRAIN")
      .agg(momAggs.head, momAggs.tail: _*).head()
    val scaled = featureCols.foldLeft(imputed) { (df, f) =>
      val mu = momRow.getAs[Double](s"_mu_$f")
      val sd = math.max(momRow.getAs[Double](s"_sd_$f"), 1e-9)
      df.withColumn(f, (col(f) - mu) / sd)
    }

    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
    val assembled = assembler.transform(scaled)
    val model = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(1e-3).setFamily("multinomial")
      .fit(assembled.where(col("set_name") === "TRAIN"))
    val pred = model.transform(assembled)
      .select(col("set_name"), col("label"), col("prediction"))

    def cnt(c: Column): Column = sum(c.cast("long"))
    def f1(c: Int): Column = {
      val tp = col(s"tp_$c").cast("double")
      val p = tp / (tp + col(s"fp_$c"))
      val r = tp / (tp + col(s"fn_$c"))
      when(col(s"tp_$c") > 0, lit(2.0) * p * r / (p + r)).otherwise(0.0)
    }
    val perClass = Seq(0, 1, 2).flatMap { c =>
      Seq(
        cnt(col("label") === c && col("prediction") === c).as(s"tp_$c"),
        cnt(col("label") =!= c && col("prediction") === c).as(s"fp_$c"),
        cnt(col("label") === c && col("prediction") =!= c).as(s"fn_$c"),
        cnt(col("label") === c).as(s"n_$c"))
    }
    val summary = pred.groupBy("set_name")
      .agg(count(lit(1)).as("n_samples"),
        (cnt(col("label") === col("prediction")) /
          count(lit(1)).cast("double")).as("accuracy") +: perClass: _*)
      .withColumn("macro_f1", round((f1(0) + f1(1) + f1(2)) / 3.0, 6))
      .select(col("set_name"), col("n_samples"),
        col("n_0").as("n_range"), col("n_1").as("n_trend_up"),
        col("n_2").as("n_trend_down"),
        round(col("accuracy"), 6).as("accuracy"), col("macro_f1"))
    // block-manager hygiene: the returned summary re-derives from lineage
    // once when consumed; no persisted blocks outlive the call
    summary
    } finally labeledRet.unpersist(false)
  }
}
