package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Features

/** EMA families, Keltner channel, squeeze ratio and composite trend score.
  *
  * Reference: /root/reference/scripts/research/build_mtf_context_h4_v1.py:
  * 90-120 (ema20/50/200 spreads and slopes, KC width from EMA ATR, squeeze =
  * BB width / KC width, trend_score = tanh(8·(n1+n2) + 4·n3)).
  *
  * The recursive smoothers run in ONE [[SeqScan]] pass ([[Ewm]]); everything
  * downstream is plain column algebra and window lags, so the plan is one
  * repartition+sort followed by narrow projections.
  */
object EmaTrend {

  def apply(bars: DataFrame, bbLen: Int = 20, kcLen: Int = 20,
            symbolCol: String = "symbol", tsCol: String = "bar_ts_ms"): DataFrame = {
    val withTr = Features.withTrueRange(bars, symbolCol, tsCol)
    val smoothed = Ewm(withTr, Seq(
      EwmSpec.span("ema20", "close", 20),
      EwmSpec.span("ema50", "close", 50),
      EwmSpec.span("ema200", "close", 200),
      EwmSpec.span("kc_mid", "close", kcLen),
      EwmSpec.wilder("kc_atr", "tr", kcLen)), symbolCol, tsCol)
    val w = Features.byKey(symbolCol, tsCol)
    val withBb = Features.withRollingStats(smoothed, "close", bbLen, symbolCol, tsCol)
    val n1 = coalesce(col("ema20_50_spread") / when(col("close") =!= 0.0, col("close")), lit(0.0))
    val n2 = coalesce(col("ema50_200_spread") / when(col("close") =!= 0.0, col("close")), lit(0.0))
    val n3 = coalesce(col("ema20_slope"), lit(0.0))
    withBb
      .withColumn("ema20_50_spread", col("ema20") - col("ema50"))
      .withColumn("ema50_200_spread", col("ema50") - col("ema200"))
      .withColumn("ema20_slope", col("ema20") / lag(col("ema20"), 1).over(w) - 1.0)
      .withColumn("ema50_slope", col("ema50") / lag(col("ema50"), 1).over(w) - 1.0)
      .withColumn("kc_width",
        (lit(3.0) * col("kc_atr")) / when(col("kc_mid") =!= 0.0, col("kc_mid")))
      .withColumn("squeeze_ratio",
        col("bb_width") / when(col("kc_width") =!= 0.0, col("kc_width")))
      .withColumn("trend_score", tanh(lit(8.0) * (n1 + n2) + lit(4.0) * n3))
  }
}
