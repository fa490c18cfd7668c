package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Order-flow / cumulative-volume-delta (CVD) feature block.
  *
  * Reference: /root/reference/scripts/backtest/run_ml_m15_v2_flow.py:171-215
  * (`add_flow_features_m15`): per-bar buy/sell aggression, normalized delta,
  * a CVD proxy (cumulative delta), CVD slopes at two horizons, a rolling
  * z-score of the CVD increment, price slopes at the same horizons, and
  * sign-product divergence flags (flow direction vs price direction).
  *
  * Spark-first: every feature is a window over (symbol, ts) — the cumulative
  * CVD is one running-sum frame, the slopes are lags, the z-score one
  * bounded frame; all share a single per-symbol sort, so the whole block is
  * one Window exchange regardless of how many features ride on it. No state,
  * no self-joins — at 100 TB this parallelizes across symbols exactly like
  * every other feature family in [[graft.functions.Features]].
  */
object Flow {

  /** Adds the flow feature columns to a bar frame that carries per-bar
    * `aggr_buy` / `aggr_sell` aggression volumes.
    *
    * Emitted columns (fillna-0 semantics of the reference, which feeds these
    * into an ML matrix): delta_aggr, delta_aggr_norm, cvd_proxy, cvd_ret1,
    * cvd_slope_3, cvd_slope_8, cvd_ret1_z, price_slope_3, price_slope_8,
    * div_cvd_price_3, div_cvd_price_8 (sign in {-1,0,1}).
    */
  def withFlowFeatures(bars: DataFrame, zWin: Int = 48, zMinPeriods: Int = 20,
                       symbolCol: String = "symbol",
                       tsCol: String = "bar_ts_ms"): DataFrame = {
    val w = Window.partitionBy(symbolCol).orderBy(tsCol)
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val zw = w.rowsBetween(-(zWin - 1), Window.currentRow)

    val total = col("aggr_buy") + col("aggr_sell")
    val delta = col("aggr_buy") - col("aggr_sell")

    def z(c: Column): Column = {
      val mean = when(count(c).over(zw) >= zMinPeriods, avg(c).over(zw))
      val std = when(count(c).over(zw) >= zMinPeriods, stddev_pop(c).over(zw))
      (c - mean) / when(std =!= 0.0, std)
    }

    val staged = bars
      .withColumn("delta_aggr", delta)
      .withColumn("delta_aggr_norm",
        coalesce(col("delta_aggr") / when(total =!= 0.0, total), lit(0.0)))
      .withColumn("cvd_proxy", sum(col("delta_aggr")).over(cum))
      .withColumn("cvd_ret1", col("cvd_proxy") - lag(col("cvd_proxy"), 1).over(w))
      .withColumn("cvd_slope_3", col("cvd_proxy") - lag(col("cvd_proxy"), 3).over(w))
      .withColumn("cvd_slope_8", col("cvd_proxy") - lag(col("cvd_proxy"), 8).over(w))
      .withColumn("price_slope_3", col("close") - lag(col("close"), 3).over(w))
      .withColumn("price_slope_8", col("close") - lag(col("close"), 8).over(w))

    staged
      .withColumn("cvd_ret1_z", coalesce(z(col("cvd_ret1")), lit(0.0)))
      .withColumn("div_cvd_price_3",
        coalesce(signum(col("cvd_slope_3") * col("price_slope_3")), lit(0.0))
          .cast("int"))
      .withColumn("div_cvd_price_8",
        coalesce(signum(col("cvd_slope_8") * col("price_slope_8")), lit(0.0))
          .cast("int"))
      .withColumn("cvd_ret1", coalesce(col("cvd_ret1"), lit(0.0)))
      .withColumn("cvd_slope_3", coalesce(col("cvd_slope_3"), lit(0.0)))
      .withColumn("cvd_slope_8", coalesce(col("cvd_slope_8"), lit(0.0)))
      .withColumn("price_slope_3", coalesce(col("price_slope_3"), lit(0.0)))
      .withColumn("price_slope_8", coalesce(col("price_slope_8"), lit(0.0)))
  }
}
