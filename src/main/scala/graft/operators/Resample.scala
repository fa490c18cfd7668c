package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Resample OHLCV bars to an arbitrary coarser rule (m5/m15/h1/h4/D/W/M...).
  *
  * Reference: /root/reference/scripts/research/compute_ichimoku_mtf_trend_v1
  * .py:88 (`resample(rule, label="left", closed="left")` with
  * first/max/min/last) and build_m5_from_m1.py / build_m15_prices_from_m1.py.
  *
  * Spark-first: one hash aggregation keyed on (symbol, truncated ts) —
  * identical plan shape to [[graft.sources.Bars]] but over bars instead of
  * ticks; no completeness gate (resample keeps partial buckets, matching the
  * reference's `.dropna()`-only behavior). Calendar rules (day/week/month)
  * use `date_trunc`; fixed n-step rules use epoch-ms floor division.
  */
object Resample {

  /** Calendar-rule resample: truncUnit in Spark date_trunc vocabulary
    * ("day", "week", "month", "hour", "minute", ...). */
  def ohlc(bars: DataFrame, truncUnit: String, symbolCol: String = "symbol",
           tsCol: String = "bar_ts"): DataFrame = {
    val ord = col(tsCol)
    bars
      .groupBy(col(symbolCol), date_trunc(truncUnit, col(tsCol)).as("bar_ts"))
      .agg(
        min_by(col("open"), ord).as("open"),
        max("high").as("high"),
        min("low").as("low"),
        max_by(col("close"), ord).as("close"),
        sum("volume").as("volume"),
        sum("n_trades").as("n_trades"))
      .withColumn("bar_ts_ms", unix_millis(col("bar_ts")))
  }

  /** Fixed-step resample (n minutes/hours): epoch floor-division bucketing.
    * Equivalent to [[TfAggregate]] without the completeness gate. */
  def ohlcFixed(bars: DataFrame, bucketMs: Long, symbolCol: String = "symbol",
                tsMsCol: String = "bar_ts_ms"): DataFrame = {
    val ts = col(tsMsCol)
    bars
      .groupBy(col(symbolCol), ((ts / bucketMs).cast("long") * bucketMs).as("bar_ts_ms"))
      .agg(
        min_by(col("open"), ts).as("open"),
        max("high").as("high"),
        min("low").as("low"),
        max_by(col("close"), ts).as("close"),
        sum("volume").as("volume"),
        sum("n_trades").as("n_trades"))
  }
}
