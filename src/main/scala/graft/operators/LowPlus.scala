package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Features

/** LOW+ tradability enrichment: the reference's router override that allows
  * trading in LOW-volatility regimes when the range percentile is compressed
  * enough AND direction is ready.
  *
  * Reference: /root/reference/scripts/research/enrich_joined_low_plus.py:22-60
  * (`enrich`): low_plus flag, baseline market readiness (MID/HIGH vol),
  * direction readiness (non-neutral state + |score| >= min), baseline /
  * override / final tradability, the ADD delta, and the reason-code columns.
  * The direction score is the impulse-style signed score of
  * build_m15_direction_regime.py:383-410 (log-return impulse normalized by
  * rolling vol, quality-scaled by the efficiency ratio, tanh-squashed) in its
  * window-expressible form (no EWM smoothing — the gating consumes the sign
  * and magnitude, which the un-smoothed score already carries).
  *
  * Spark-first: the score and percentile ride the same per-symbol window
  * family as [[VolRegime]]; the gating itself is pure row-wise boolean
  * algebra — zero extra shuffles on top of the feature windows.
  */
object LowPlus {

  /** Adds dir_score / dir_state and the LOW+ gating columns to hour bars.
    *
    * @param th        LOW+ threshold on range_pctl (percent scale, 0-100)
    * @param dirAbsMin minimum |dir_score| for direction readiness
    */
  def enrich(bars: DataFrame, lookback: Int = 24, th: Double = 14.0,
             dirAbsMin: Double = 0.30, neutralBand: Double = 0.15,
             symbolCol: String = "symbol", tsCol: String = "bar_ts_ms"): DataFrame = {
    val w = Window.partitionBy(symbolCol).orderBy(tsCol)
    val lb = w.rowsBetween(-(lookback - 1), Window.currentRow)

    val withVol = VolRegime(bars, lookback = 48, pLow = 25.0, pHigh = 70.0)
    val withEr = Features.withEfficiencyRatio(withVol, lookback, symbolCol, tsCol)

    val ret1 = log(col("close") / lag(col("close"), 1).over(w))
    val retL = log(col("close") / lag(col("close"), lookback).over(w))
    val staged = withEr
      .withColumn("_ret1", ret1)
      .withColumn("_vol1",
        when(count(col("_ret1")).over(lb) === lookback,
          stddev_pop(col("_ret1")).over(lb)))
      .withColumn("_impulse",
        retL / (col("_vol1") * math.sqrt(lookback.toDouble) + lit(1e-9)))
      .withColumn("_raw", col("_impulse") * (lit(0.5) + lit(0.5) * col("er")))

    // tanh via Spark's builtin; the oracle uses the saturated exp identity
    val scored = staged.withColumn("dir_score", tanh(col("_raw")))
      .withColumn("dir_state",
        when(col("dir_score").isNull, "NEUTRAL")
          .when(col("dir_score") >= neutralBand, "BULL")
          .when(col("dir_score") <= -neutralBand, "BEAR")
          .otherwise("NEUTRAL"))

    scored
      .withColumn("low_plus",
        coalesce(col("range_pctl") <= th, lit(false)))
      .withColumn("market_ready_base",
        coalesce(col("vol_state").isin("MID", "HIGH"), lit(false)))
      .withColumn("dir_ready",
        col("dir_state") =!= "NEUTRAL" &&
          abs(coalesce(col("dir_score"), lit(0.0))) >= dirAbsMin)
      .withColumn("tradable_base", col("market_ready_base") && col("dir_ready"))
      .withColumn("tradable_override", col("low_plus") && col("dir_ready"))
      .withColumn("tradable_final", col("tradable_base") || col("tradable_override"))
      .withColumn("is_add", col("tradable_override") && !col("tradable_base"))
      .withColumn("override_reason",
        when(col("low_plus") && col("dir_ready"), "LOW_PLUS_AND_DIR_READY")
          .when(col("low_plus") && !col("dir_ready"), "LOW_PLUS_BUT_DIR_NOT_READY")
          .otherwise(""))
      .withColumn("block_reason_base",
        when(!col("dir_ready"), "DIR_NOT_READY")
          .when(col("dir_ready") && !col("market_ready_base"), "VOL_BLOCKED_BASE")
          .otherwise(""))
      .drop("_ret1", "_vol1", "_impulse", "_raw")
  }
}
