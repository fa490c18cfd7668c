package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Funding-rate pipeline: derive a periodic funding rate from the premium of
  * each settlement window, accrue it cumulatively, and project the accrued
  * funding onto every bar anti-lookahead.
  *
  * Reference domain: /root/reference/src/bfdl/collectors/premium_index_m1.py
  * + funding_events.py (premium index → 8h funding events → per-position
  * accrual). Re-expressed: one aggregation to the settlement grid, one
  * running-sum window, one as-of join — all shuffle-minimal.
  */
object Funding {

  /** Per-(symbol, settlement bucket) rate = mean bar return of the window;
    * payment timestamp is the bucket END (known only after settlement —
    * anti-lookahead by construction). */
  def ratesFromBars(bars: DataFrame, settleMs: Long = 8 * 3600000L,
                    symbolCol: String = "symbol",
                    tsMsCol: String = "bar_ts_ms"): DataFrame = {
    val bucket = (col(tsMsCol) / settleMs).cast("long") * settleMs
    bars
      .groupBy(col(symbolCol), bucket.as("bucket_ms"))
      .agg(avg((col("close") - col("open")) /
        when(col("open") =!= 0.0, col("open"))).as("rate"))
      .withColumn("pay_ms", col("bucket_ms") + settleMs)
  }

  /** Adapt a staged funding-event lake (the
    * [[graft.sources.Collector.fundingShape]] schema:
    * `symbol, funding_time_ms, rate, …`) to the `(symbol, pay_ms, rate)`
    * frame [[accrueOntoBars]] consumes — settled events already carry
    * their pay timestamp, so no settlement-window aggregation is needed. */
  def ratesFromEvents(events: DataFrame,
                      symbolCol: String = "symbol"): DataFrame =
    events.select(col(symbolCol), col("funding_time_ms").as("pay_ms"),
      col("rate"))

  /** Derive settlement rates from a staged premium-index lake (the
    * [[graft.sources.Collector.premiumIndexShape]] schema): the window's
    * rate is the MEAN premium index over the settlement window — the
    * published perp-funding formula's premium component (its clamped
    * interest-rate term is a constant offset the caller can add) — paid at
    * the window END, anti-lookahead like [[ratesFromBars]]. One
    * aggregation; a funding-event lake and a premium-index lake sampling
    * the same market then accrue identically
    * ([[graft.operators.Funding.accrueOntoBars]]; CollectorSpec pins the
    * equality). */
  def ratesFromPremiumIndex(premium: DataFrame,
                            settleMs: Long = 8 * 3600000L,
                            symbolCol: String = "symbol",
                            tsMsCol: String = "open_time_ms",
                            valueCol: String = "close"): DataFrame = {
    val bucket = (col(tsMsCol) / settleMs).cast("long") * settleMs
    premium
      .groupBy(col(symbolCol), bucket.as("bucket_ms"))
      .agg(avg(col(valueCol)).as("rate"))
      .select(col(symbolCol), (col("bucket_ms") + settleMs).as("pay_ms"),
        col("rate"))
  }

  /** Accrue rates cumulatively and project the accrued funding onto each
    * bar: the funding paid up to (and including) the last settlement at or
    * before the bar. */
  def accrueOntoBars(bars: DataFrame, rates: DataFrame,
                     symbolCol: String = "symbol",
                     tsMsCol: String = "bar_ts_ms"): DataFrame = {
    val w = Window.partitionBy(symbolCol).orderBy("pay_ms")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = rates.withColumn("cum_funding", sum(col("rate")).over(w))
      .select(col(symbolCol), col("pay_ms"), col("cum_funding"))
    AsOf.joinBackward(bars, cum, symbolCol, tsMsCol, "pay_ms",
        matchedTsCol = "last_pay_ms")
      .withColumn("cum_funding", coalesce(col("cum_funding"), lit(0.0)))
  }
}
