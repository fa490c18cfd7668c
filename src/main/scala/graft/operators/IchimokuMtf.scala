package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-timeframe Ichimoku trend composition.
  *
  * Reference: /root/reference/scripts/research/compute_ichimoku_mtf_trend_v1
  * .py — score each timeframe independently with [[Ichimoku]], project the
  * coarse timeframe's last COMPLETED verdict onto the base timeframe
  * anti-lookahead, and combine into a weighted MTF consensus.
  *
  * Composition of already-proven operators: base-TF ichimoku (windows),
  * coarse bars via [[Resample.ohlcFixed]], coarse ichimoku, a 1-bucket lag
  * (anti-lookahead) and an [[AsOf]] backward join. Plan: two window families
  * + one as-of union window — no new shuffle patterns.
  */
object IchimokuMtf {

  /** @param stepMs     base bar step in milliseconds
    * @param coarseMult coarse bucket = `coarseMult` base bars
    * @param wBase      weight of the base timeframe's (bull-bear) vote
    * @param wCoarse    weight of the coarse timeframe's vote */
  def apply(bars: DataFrame, stepMs: Long, coarseMult: Int,
            p: IchimokuParams = IchimokuParams(),
            wBase: Int = 1, wCoarse: Int = 2,
            symbolCol: String = "symbol", tsCol: String = "bar_ts_ms"): DataFrame = {
    val base = Ichimoku(bars, p, symbolCol, tsCol)
      .withColumnRenamed("label", "label_base")
      .withColumnRenamed("bull_score", "bull_base")
      .withColumnRenamed("bear_score", "bear_base")

    val coarseBars = Resample.ohlcFixed(bars, stepMs * coarseMult, symbolCol, tsCol)
    val wb = Window.partitionBy(symbolCol).orderBy(tsCol)
    val coarse = Ichimoku(coarseBars, p, symbolCol, tsCol)
      .select(col(symbolCol), col(tsCol),
        lag(col("bull_score"), 1).over(wb).as("bull_coarse"),
        lag(col("bear_score"), 1).over(wb).as("bear_coarse"),
        lag(col("label"), 1).over(wb).as("label_coarse"))

    val joined = AsOf.joinBackward(
      base.select(col(symbolCol), col(tsCol), col("close"),
        col("label_base"), col("bull_base"), col("bear_base")),
      coarse, symbolCol, tsCol, tsCol, matchedTsCol = "coarse_ts_ms")

    val mtf = coalesce(col("bull_base") - col("bear_base"), lit(0)) * wBase +
      coalesce(col("bull_coarse") - col("bear_coarse"), lit(0)) * wCoarse
    joined
      .withColumn("mtf_score", mtf)
      .withColumn("mtf_label",
        when(col("mtf_score") >= wBase + wCoarse, "LONG")
          .when(col("mtf_score") <= -(wBase + wCoarse), "SHORT")
          .otherwise("NEUTRE"))
  }

}
