package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-timeframe regime-case taxonomy with confluence-scored sizing.
  *
  * Reference: /root/reference/scripts/research/audit_regime_cases_v1.py
  * :52-126 — per-bar ichimoku direction votes across timeframes are
  * combined into a weighted confluence score and classified through a
  * priority cascade (WARMUP / DATA_GAP / CHAOS_CONFLICT / macro-micro
  * opposition / trend-continuation / breakout-from-range / pullback /
  * range / fake-breakout / low-confidence), with a size multiplier tier
  * from |score|. The reference votes over mn1/w1/d1/h4/h1/m30; this
  * composition uses the timeframes the corpus can make ready (h1 base,
  * 4h, 1d) with the same cascade and weights 3·d1 + 2·h4 + 2·h1.
  *
  * The cascade LOOKS sequential (breakout requires the PREVIOUS case to be
  * RANGE_NEUTRAL; fake-breakout requires the previous case to be a
  * breakout), but the recursion bottoms out: RANGE_NEUTRAL is purely
  * per-row, a breakout is per-row + one lag, a fake-breakout per-row + two
  * lags — so the whole classifier is two window lags over the per-row
  * cascade, no stateful scan. (The reference's EXHAUSTION_* branches are
  * unreachable — its pullback rule is strictly weaker and fires first;
  * kept for fidelity.)
  */
object RegimeCases {

  private val Dead = Seq(
    "EXHAUSTION_TOP", "EXHAUSTION_BOTTOM", "LOW_CONFIDENCE_NEUTRAL")

  def apply(bars: DataFrame, stepMs: Long, neutralThresh: Int = 3,
            p: IchimokuParams = IchimokuParams(),
            symbolCol: String = "symbol", tsCol: String = "bar_ts_ms"): DataFrame = {
    val base = Ichimoku(bars, p, symbolCol, tsCol)
      .select(col(symbolCol), col(tsCol),
        col("label").as("label_h1"), col("score_display").as("score_h1"))

    def laggedDir(mult: Int, outCol: String): DataFrame = {
      val coarse = Ichimoku(
        Resample.ohlcFixed(bars, stepMs * mult, symbolCol, tsCol),
        p, symbolCol, tsCol)
      val wb = Window.partitionBy(symbolCol).orderBy(tsCol)
      coarse.select(col(symbolCol), col(tsCol),
        lag(when(col("label") === "LONG", 1)
          .when(col("label") === "SHORT", -1).otherwise(0), 1)
          .over(wb).as(outCol))
    }
    val j1 = AsOf.joinBackward(base, laggedDir(4, "d_h4"),
      symbolCol, tsCol, tsCol, matchedTsCol = "h4_ts_ms")
    val j2 = AsOf.joinBackward(j1, laggedDir(24, "d_d1"),
      symbolCol, tsCol, tsCol, matchedTsCol = "d1_ts_ms")
    classify(j2, neutralThresh, symbolCol, tsCol)
  }

  /** The classification cascade over a frame carrying (label_h1, score_h1,
    * d_h4, d_d1) — separated so every branch (including the breakout →
    * fake-breakout chains, which need specific verdict sequences) is
    * unit-testable with injected direction votes. */
  def classify(dirsIn: DataFrame, neutralThresh: Int = 3,
               symbolCol: String = "symbol", tsCol: String = "bar_ts_ms"): DataFrame = {
    val withDirs = dirsIn.withColumn("d_h1",
      when(col("label_h1") === "LONG", 1)
        .when(col("label_h1") === "SHORT", -1).otherwise(0))
    val score = lit(3) * col("d_d1") + lit(2) * col("d_h4") + lit(2) * col("d_h1")
    val macroBull = col("d_d1") === 1
    val macroBear = col("d_d1") === -1
    val microBull = col("d_h1") === 1
    val microBear = col("d_h1") === -1
    val conflict = (col("d_d1") * col("d_h4")) === -1

    val baseCase =
      when(col("score_h1") === 0 && col("label_h1") === "NEUTRE",
        "WARMUP_UNDEFINED")
        .when(col("d_h4").isNull || col("d_d1").isNull, "DATA_GAP_OR_INVALID")
        .when(conflict, "CHAOS_CONFLICT_TF")
        .when(macroBull && microBear, "MACRO_BULL_MICRO_BEAR")
        .when(macroBear && microBull, "MACRO_BEAR_MICRO_BULL")
        .when(macroBull && microBull && col("d_h4") >= 0,
          "TREND_CONTINUATION_LONG")
        .when(macroBear && microBear && col("d_h4") <= 0,
          "TREND_CONTINUATION_SHORT")
        .when(macroBull && col("d_h1") < 0, "PULLBACK_LONG_IN_BULL_TREND")
        .when(macroBear && col("d_h1") > 0, "PULLBACK_SHORT_IN_BEAR_TREND")
        .when(abs(score) < neutralThresh && col("d_d1") > 0,
          "RANGE_BIASED_LONG")
        .when(abs(score) < neutralThresh && col("d_d1") < 0,
          "RANGE_BIASED_SHORT")
        .when(abs(score) < neutralThresh, "RANGE_NEUTRAL")
        .when(macroBull && col("d_h1") < 0 && score > 0, "EXHAUSTION_TOP")
        .when(macroBear && col("d_h1") > 0 && score < 0, "EXHAUSTION_BOTTOM")
        .otherwise("LOW_CONFIDENCE_NEUTRAL")

    val wk = Window.partitionBy(symbolCol).orderBy(tsCol)
    val staged = withDirs
      .withColumn("_base", baseCase)
      .withColumn("_score", score)
      .withColumn("_lag1", lag(col("_base"), 1).over(wk))
      .withColumn("_lag2", lag(col("_base"), 2).over(wk))
    val finalCase =
      when(col("_base") === "TREND_CONTINUATION_LONG" &&
        col("_lag1") === "RANGE_NEUTRAL", "BREAKOUT_UP_FROM_RANGE")
        .when(col("_base") === "TREND_CONTINUATION_SHORT" &&
          col("_lag1") === "RANGE_NEUTRAL", "BREAKOUT_DOWN_FROM_RANGE")
        .when(col("_base").isin(Dead: _*) &&
          col("_lag1") === "TREND_CONTINUATION_LONG" &&
          col("_lag2") === "RANGE_NEUTRAL" && col("d_h1") <= 0,
          "FAKE_BREAKOUT_UP")
        .when(col("_base").isin(Dead: _*) &&
          col("_lag1") === "TREND_CONTINUATION_SHORT" &&
          col("_lag2") === "RANGE_NEUTRAL" && col("d_h1") >= 0,
          "FAKE_BREAKOUT_DOWN")
        .otherwise(col("_base"))

    val withCase = staged.withColumn("regime_case", finalCase)
    val a = abs(col("_score"))
    withCase
      .withColumn("size_mult",
        when(col("regime_case").isin("WARMUP_UNDEFINED",
          "DATA_GAP_OR_INVALID", "CHAOS_CONFLICT_TF"), 0.0)
          .when(a >= 10, 1.0).when(a >= 7, 0.75).when(a >= 4, 0.5)
          .otherwise(0.25))
      .select(col(symbolCol), col(tsCol), col("regime_case"),
        col("_score").cast("int").as("confluence_score"), col("size_mult"))
  }
}
