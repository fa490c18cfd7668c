package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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

  /** [[fromTicks]] plus per-bar buy/sell aggression volumes — the
    * taker_buy_base / (volume - taker_buy_base) split a Binance kline carries
    * natively (klines_m1.py schema; consumed by run_ml_m15_v2_flow.py's flow
    * features). `buySide` classifies each tick as taker-buy; sells are the
    * complement. Still one hash aggregation — the split rides as two more
    * conditional sums on the same shuffle. */
  def fromTicksWithAggression(
      ticks: DataFrame,
      truncUnit: String,
      buySide: Column,
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
        count(lit(1)).as("n_trades"),
        sum(when(buySide, col(priceCol)).otherwise(0.0)).as("aggr_buy"),
        sum(when(!buySide, col(priceCol)).otherwise(0.0)).as("aggr_sell"))
      .withColumn("bar_ts_ms", unix_millis(col("bar_ts")))
  }

  /** Binance-style kline CSV schema (open_time_ms, OHLCV, close_time_ms,
    * quote/taker volumes, n_trades) — the layout the reference's CSV reader
    * consumes (/root/reference/scripts/research/build_m15_direction_regime
    * .py:152-229, _read_m1_csv_binance). */
  val KlineCsvSchema: StructType = StructType(Seq(
    StructField("open_time_ms", LongType),
    StructField("open", DoubleType),
    StructField("high", DoubleType),
    StructField("low", DoubleType),
    StructField("close", DoubleType),
    StructField("volume_base", DoubleType),
    StructField("close_time_ms", LongType),
    StructField("volume_quote", DoubleType),
    StructField("n_trades", LongType),
    StructField("taker_buy_base", DoubleType),
    StructField("taker_buy_quote", DoubleType)))

  /** Read Binance-style kline CSVs into the canonical bar frame: explicit
    * schema (no inference pass over the data — an inference scan at 100 TB
    * is a full extra read), `symbol` from the caller (the reference derives
    * it from the path), malformed rows dropped. */
  def fromKlineCsv(spark: SparkSession, path: String, symbol: String): DataFrame =
    spark.read
      .schema(KlineCsvSchema)
      .option("header", "false")
      .option("mode", "DROPMALFORMED")
      .csv(path)
      // DROPMALFORMED only rejects structurally broken lines; rows whose
      // required fields failed the type conversion surface as nulls
      .where(col("open_time_ms").isNotNull && col("open").isNotNull &&
        col("close").isNotNull)
      .withColumn("symbol", lit(symbol))
      .withColumn("bar_ts_ms", col("open_time_ms"))
      .withColumn("volume", col("volume_base"))
}
