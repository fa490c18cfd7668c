package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Canonical OHLCV bar construction from a raw tick/event stream.
  *
  * Mirrors the reference collector's m1 kline semantics
  * (/root/reference/src/bfdl/collectors/klines_m1.py:31-210): one bar per
  * (symbol, truncated timestamp) with open = first trade, close = last trade
  * (ordered by the unique ingestion id), high/low extrema, summed volume and
  * trade count.
  *
  * Spark-first design: a single hash aggregation keyed on (symbol, bar_ts) —
  * one shuffle, map-side partial aggregation, no windows, no sort. `min_by` /
  * `max_by` replace the reference's sort-then-first/last so the plan stays a
  * pure aggregate at any scale.
  */
object Bars {

  /** Build bars at `truncUnit` granularity ("minute", "hour", "day", ...).
    *
    * @param ticks    raw stream with one row per trade/event
    * @param ordCol   unique, ingestion-ordered id used for first/last
    *                 tie-breaking (deterministic at any parallelism)
    */
  def fromTicks(
      ticks: DataFrame,
      truncUnit: String,
      symbolCol: String = "event_type",
      tsCol: String = "ts",
      priceCol: String = "value",
      ordCol: String = "event_id"): DataFrame = {
    val barTs = date_trunc(truncUnit, col(tsCol))
    ticks
      .groupBy(col(symbolCol).as("symbol"), barTs.as("bar_ts"))
      .agg(
        min_by(col(priceCol), col(ordCol)).as("open"),
        max(col(priceCol)).as("high"),
        min(col(priceCol)).as("low"),
        max_by(col(priceCol), col(ordCol)).as("close"),
        sum(col(priceCol)).as("volume"),
        count(lit(1)).as("n_trades"))
      .withColumn("bar_ts_ms", unix_millis(col("bar_ts")))
  }
}
