package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Features

/** Volatility-regime states from the rolling percentile of the bar range.
  *
  * Reference: /root/reference/scripts/research/build_m5_vol_regime.py:148-185
  * — range percentile over a lookback window → LOW (< p_low) / MID / HIGH
  * (> p_high) states plus a `market_ready` gate (anything not LOW).
  *
  * Window-expressible end to end: range %, rolling percentile (higher-order
  * filter over a window-collected array), threshold labels.
  */
object VolRegime {

  def apply(bars: DataFrame, lookback: Int = 48,
            pLow: Double = 25.0, pHigh: Double = 70.0,
            symbolCol: String = "symbol", tsCol: String = "bar_ts_ms"): DataFrame = {
    val ranged = bars.withColumn("range_pct",
      (col("high") - col("low")) / when(col("close") =!= 0.0, col("close")))
    val withPctl = Features.withRollingPercentile(
      ranged, "range_pct", "range_pctl", lookback, symbolCol, tsCol)
    withPctl
      .withColumn("vol_state",
        when(col("range_pctl").isNull, lit(null).cast("string"))
          .when(col("range_pctl") < pLow, "LOW")
          .when(col("range_pctl") > pHigh, "HIGH")
          .otherwise("MID"))
      .withColumn("market_ready",
        when(col("vol_state").isNull, lit(null).cast("int"))
          .when(col("vol_state") =!= "LOW", 1).otherwise(0))
  }
}

/** Consolidation range boxes: maximal runs of bars whose closes stay inside
  * a band around the rolling mean (|close - sma| <= k·ATR for >= minBars).
  *
  * Reference: /root/reference/scripts/research/build_range_boxes_from_flats
  * _v2.py (expand a window around flat levels while bars stay "inside").
  * Re-expressed as run-length encoding over the inside-band predicate — the
  * same windows-only pattern as [[FlatLevels]], no imperative expansion loop.
  */
object RangeBoxes {

  def apply(bars: DataFrame, smaLen: Int = 20, atrLen: Int = 14,
            bandK: Double = 1.0, minBars: Int = 6,
            symbolCol: String = "symbol", tsCol: String = "bar_ts_ms"): DataFrame = {
    import graft.functions.Features
    val w = Window.partitionBy(symbolCol).orderBy(tsCol)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val frame = w.rowsBetween(-(smaLen - 1), Window.currentRow)
    val sma = when(count(col("close")).over(frame) === smaLen,
      avg(col("close")).over(frame))
    val withF = Features.withAtrSma(bars, atrLen, symbolCol, tsCol)
      .withColumn("_sma", sma)
      .withColumn("_inside",
        when(col("_sma").isNotNull && col("atr").isNotNull,
          (abs(col("close") - col("_sma")) <= lit(bandK) * col("atr")).cast("int"))
          .otherwise(0))
    val newRun = when(col("_inside") === 0 ||
      coalesce(lag(col("_inside"), 1).over(w), lit(0)) === 0, 1).otherwise(0)
    withF
      .withColumn("_new", newRun)
      .withColumn("_run", sum(col("_new")).over(run))
      .where(col("_inside") === 1)
      .groupBy(col(symbolCol), col("_run"))
      .agg(
        min(col(tsCol)).as("start_ms"),
        max(col(tsCol)).as("end_ms"),
        count(lit(1)).as("n_bars"),
        min(col("low")).as("box_low"),
        max(col("high")).as("box_high"))
      .where(col("n_bars") >= minBars)
      .drop("_run")
  }
}

/** Flat-level (plateau) detection on a line such as the Ichimoku kijun/SSB.
  *
  * Reference: /root/reference/scripts/research/find_ichimoku_flat_levels_v1
  * .py:93-131 — consecutive equal values form a segment; segments of at
  * least `minFlatBars` bars are support/resistance levels.
  *
  * Spark-first: run-length encoding via windows — a new-run flag
  * (value != previous), a running sum of flags as the run id, then one
  * aggregation per (symbol, run). No python-style index loop; one shuffle.
  */
object FlatLevels {

  def apply(bars: DataFrame, lineCol: String, minFlatBars: Int = 3,
            symbolCol: String = "symbol", tsCol: String = "bar_ts_ms"): DataFrame = {
    val w = Window.partitionBy(symbolCol).orderBy(tsCol)
    val run = Window.partitionBy(symbolCol).orderBy(tsCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col(lineCol), 1).over(w)
    val newRun = when(col(lineCol).isNull || prev.isNull ||
      col(lineCol) =!= prev, 1).otherwise(0)
    bars
      .withColumn("_new", newRun)
      .withColumn("_run", sum(col("_new")).over(run))
      .where(col(lineCol).isNotNull)
      .groupBy(col(symbolCol), col("_run"))
      .agg(
        // all values in a run are equal; min is deterministic in any engine
        min(col(lineCol)).as("level"),
        min(col(tsCol)).as("start_ms"),
        max(col(tsCol)).as("end_ms"),
        count(lit(1)).as("length_bars"))
      .where(col("length_bars") >= minFlatBars)
      .drop("_run")
  }
}
