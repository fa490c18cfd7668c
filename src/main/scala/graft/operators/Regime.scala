package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Features

/** Vol + direction regime router.
  *
  * Reference: /root/reference/scripts/research/build_h1_regime_router_v2.py:
  * 96-135 — ATR percentile (vol), efficiency ratio + moving-average alignment
  * + normalized MA slope (direction), composite trend score, and the
  * CHAOS / TREND / RANGE router with OFF/TREND/RANGE modes.
  *
  * This window-expressible router uses SMA alignment (the reference's EMA
  * variant is available by feeding [[EmaTrend]] columns in instead — same
  * downstream scoring); every feature shares one (symbol, ts) window family.
  */
final case class RegimeParams(
    atrLen: Int = 14,
    erLb: Int = 24,
    atrPctlLb: Int = 48,
    slopeLb: Int = 8,
    pHi: Double = 80.0,
    erLow: Double = 0.25,
    erHigh: Double = 0.45,
    slopeHi: Double = 1.0)

object Regime {

  def router(bars: DataFrame, p: RegimeParams = RegimeParams(),
             symbolCol: String = "symbol", tsCol: String = "bar_ts_ms"): DataFrame = {
    val w = Window.partitionBy(symbolCol).orderBy(tsCol)
    def sma(len: Int) = {
      val frame = w.rowsBetween(-(len - 1), Window.currentRow)
      when(count(col("close")).over(frame) === len, avg(col("close")).over(frame))
    }

    val withAtr = Features.withAtrSma(bars, p.atrLen, symbolCol, tsCol)
      .withColumn("atr_pct", col("atr") / when(col("close") =!= 0.0, col("close")))
    val withPctl = Features.withRollingPercentile(
      withAtr, "atr_pct", "atr_pct_pctl", p.atrPctlLb, symbolCol, tsCol)
    val withEr = Features.withEfficiencyRatio(withPctl, p.erLb, symbolCol, tsCol)

    val staged = withEr
      .withColumn("sma20", sma(20))
      .withColumn("sma50", sma(50))
      .withColumn("sma200", sma(200))
      .withColumn("aligned_bull",
        when(col("sma20") > col("sma50") && col("sma50") > col("sma200"), 1).otherwise(0))
      .withColumn("aligned_bear",
        when(col("sma20") < col("sma50") && col("sma50") < col("sma200"), 1).otherwise(0))
      .withColumn("slope50_norm",
        ((col("sma50") - lag(col("sma50"), p.slopeLb).over(w)) / p.slopeLb.toDouble) /
          when(col("atr") =!= 0.0, col("atr")))

    val clip01 = least(greatest(col("er"), lit(0.0)), lit(1.0))
    val slopeTerm = least(abs(col("slope50_norm")), lit(5.0)) / 5.0
    val isChaos = col("atr_pct_pctl") >= p.pHi && col("er") <= p.erLow
    val isTrend = col("er") >= p.erHigh &&
      (col("aligned_bull") === 1 || col("aligned_bear") === 1 ||
        abs(col("slope50_norm")) >= p.slopeHi)

    staged
      .withColumn("trend_score",
        lit(0.5) * clip01 + lit(0.3) * slopeTerm +
          lit(0.2) * (col("aligned_bull") + col("aligned_bear")))
      .withColumn("regime",
        when(isChaos, "CHAOS").when(isTrend, "TREND").otherwise("RANGE"))
      .withColumn("router_mode",
        when(col("regime") === "CHAOS", "OFF")
          .when(col("regime") === "TREND", "TREND").otherwise("RANGE"))
  }
}
