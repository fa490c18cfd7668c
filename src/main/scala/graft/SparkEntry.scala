package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Audit, Canonical, Gaps, Resample, TfAggregate}
import graft.sources.{Bars, Tables}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY.md §2 lands here as a `queries` entry; the
  * SQL-expressible ones also get a DuckDB oracle in `oracleSql` with column
  * names aliased identically on both sides. Timestamps are emitted as
  * epoch-ms BIGINT and double aggregates rounded to 6 dp on both sides to
  * keep the hash compare engine-agnostic.
  */
object SparkEntry {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Hour-bar OHLCV build over the full stream — the reference lake's single
    * most common read shape. */
  def entry(spark: SparkSession): DataFrame =
    Bars.fromTicks(events(spark, "/root/testdata/sf0.001"), "hour")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2 #3 — OHLCV bar construction from the tick stream (klines_m1.py).
    "m1_bars" -> ((s, dir) => {
      Bars.fromTicks(events(s, dir), "minute")
        .select(col("symbol"), col("bar_ts_ms").as("minute_ms"),
          col("open"), col("high"), col("low"), col("close"),
          round(col("volume"), 6).as("volume"), col("n_trades"))
        .orderBy("symbol", "minute_ms")
    }),

    // §2 #4 — completeness-gated timeframe aggregation (aggregate_tf.py:53-110).
    // Base unit = hour bars, bucket = 4 hours (n=4): gating passes and fails
    // meaningfully on the sparse synthetic grid.
    "tf_aggregate" -> ((s, dir) => {
      val h1 = Bars.fromTicks(events(s, dir), "hour")
      TfAggregate(h1, stepMs = 3600000L, n = 4)
        .select(col("symbol"), col("bucket_ms"),
          col("open"), col("high"), col("low"), col("close"),
          round(col("volume"), 6).as("volume"), col("n_trades"),
          col("close_time_ms"))
        .orderBy("symbol", "bucket_ms")
    }),

    // §2 #5 — incremental checkpointed aggregation: resume strictly after a
    // checkpoint bucket (aggregate_tf.py:122-144). Checkpoint = 2024-01-15T00Z.
    "tf_incremental" -> ((s, dir) => {
      val h1 = Bars.fromTicks(events(s, dir), "hour")
      TfAggregate.incremental(h1, stepMs = 3600000L, n = 4,
          nextBucketOpenMs = 1705276800000L)
        .select(col("symbol"), col("bucket_ms"),
          col("open"), col("high"), col("low"), col("close"),
          round(col("volume"), 6).as("volume"), col("n_trades"))
        .orderBy("symbol", "bucket_ms")
    }),

    // §2 #2 — canonical dedup keep-last on (symbol, minute) by ingestion id
    // (aggregate_tf.py:205).
    "dedup_canonical" -> ((s, dir) => {
      val e = events(s, dir)
        .withColumn("minute_ms", unix_millis(date_trunc("minute", col("ts"))))
      Canonical.dedupKeepLast(e, Seq("event_type", "minute_ms"), col("event_id"))
        .select(col("event_type").as("symbol"), col("minute_ms"),
          col("event_id"), col("value"))
        .orderBy("symbol", "minute_ms")
    }),

    // §2 #8 — gap ranges on the minute grid (gaps_report.py:13-32).
    "gaps_report" -> ((s, dir) => {
      val m1 = Bars.fromTicks(events(s, dir), "minute")
      Gaps.gapsReport(m1, stepMs = 60000L)
        .orderBy("symbol", "gap_start_ms")
    }),

    // §2 #10 — per-symbol integrity summary (integrity_checks.py:26).
    "integrity_check" -> ((s, dir) => {
      val e = events(s, dir)
        .select(col("event_type").as("symbol"),
          unix_millis(date_trunc("minute", col("ts"))).as("ts_ms"),
          col("event_id"))
      Gaps.integrityCheck(e, stepMs = 60000L)
        .select(col("symbol"), col("n_rows"), col("n_distinct"), col("n_dups"),
          col("min_ms"), col("max_ms"), col("n_non_monotonic"),
          col("expected_rows"), col("n_missing"))
        .orderBy("symbol")
    }),

    // §2 #9 — backfill fetch plan: every missing minute, one row each
    // (backfill_gaps.py:104-195).
    "backfill_plan" -> ((s, dir) => {
      val m1 = Bars.fromTicks(events(s, dir), "minute")
      Gaps.backfillPlan(Gaps.gapsReport(m1, 60000L), 60000L)
        .orderBy("symbol", "missing_ms")
    }),

    // §2 #13 — last-row probe per symbol (last_minute.py:17).
    "last_row" -> ((s, dir) => {
      val e = events(s, dir)
        .select(col("event_type").as("symbol"),
          unix_millis(date_trunc("minute", col("ts"))).as("ts_ms"),
          col("event_id"), col("value"))
      Gaps.lastRow(e).orderBy("symbol")
    }),

    // §2 #18 — resample minute bars to calendar days
    // (compute_ichimoku_mtf_trend_v1.py:88).
    "resample_ohlc" -> ((s, dir) => {
      val m1 = Bars.fromTicks(events(s, dir), "minute")
      Resample.ohlc(m1, "day")
        .select(col("symbol"), col("bar_ts_ms").as("day_ms"),
          col("open"), col("high"), col("low"), col("close"),
          round(col("volume"), 6).as("volume"), col("n_trades"))
        .orderBy("symbol", "day_ms")
    }),

    // §2 #11 — derived-table completeness audit (audit_derived.py:98-180).
    "audit_derived" -> ((s, dir) => {
      val h1 = Bars.fromTicks(events(s, dir), "hour")
      Audit.auditDerived(h1, stepMs = 3600000L, n = 4)
        .orderBy("symbol")
    }),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "m1_bars" ->
      """SELECT event_type AS symbol,
        |       epoch_ms(date_trunc('minute', ts)) AS minute_ms,
        |       arg_min(value, event_id) AS open,
        |       max(value) AS high,
        |       min(value) AS low,
        |       arg_max(value, event_id) AS close,
        |       round(sum(value), 6) AS volume,
        |       count(*) AS n_trades
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "tf_aggregate" ->
      """WITH h1 AS (
        |  SELECT event_type AS symbol,
        |         epoch_ms(date_trunc('hour', ts)) AS bar_ts_ms,
        |         arg_min(value, event_id) AS open,
        |         max(value) AS high,
        |         min(value) AS low,
        |         arg_max(value, event_id) AS close,
        |         sum(value) AS volume,
        |         count(*) AS n_trades
        |  FROM events GROUP BY 1, 2)
        |SELECT symbol,
        |       (bar_ts_ms // 14400000) * 14400000 AS bucket_ms,
        |       arg_min(open, bar_ts_ms) AS open,
        |       max(high) AS high,
        |       min(low) AS low,
        |       arg_max(close, bar_ts_ms) AS close,
        |       round(sum(volume), 6) AS volume,
        |       CAST(sum(n_trades) AS BIGINT) AS n_trades,
        |       (bar_ts_ms // 14400000) * 14400000 + 14399999 AS close_time_ms
        |FROM h1
        |GROUP BY 1, 2, 9
        |HAVING count(*) = 4 AND count(DISTINCT bar_ts_ms) = 4
        |   AND max(bar_ts_ms) - min(bar_ts_ms) = 10800000
        |ORDER BY 1, 2""".stripMargin,

    "tf_incremental" ->
      """WITH h1 AS (
        |  SELECT event_type AS symbol,
        |         epoch_ms(date_trunc('hour', ts)) AS bar_ts_ms,
        |         arg_min(value, event_id) AS open,
        |         max(value) AS high,
        |         min(value) AS low,
        |         arg_max(value, event_id) AS close,
        |         sum(value) AS volume,
        |         count(*) AS n_trades
        |  FROM events GROUP BY 1, 2)
        |SELECT symbol,
        |       (bar_ts_ms // 14400000) * 14400000 AS bucket_ms,
        |       arg_min(open, bar_ts_ms) AS open,
        |       max(high) AS high,
        |       min(low) AS low,
        |       arg_max(close, bar_ts_ms) AS close,
        |       round(sum(volume), 6) AS volume,
        |       CAST(sum(n_trades) AS BIGINT) AS n_trades
        |FROM h1
        |WHERE bar_ts_ms >= 1705276800000
        |GROUP BY 1, 2
        |HAVING count(*) = 4 AND count(DISTINCT bar_ts_ms) = 4
        |   AND max(bar_ts_ms) - min(bar_ts_ms) = 10800000
        |ORDER BY 1, 2""".stripMargin,

    "dedup_canonical" ->
      """SELECT event_type AS symbol,
        |       epoch_ms(date_trunc('minute', ts)) AS minute_ms,
        |       max(event_id) AS event_id,
        |       arg_max(value, event_id) AS value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "gaps_report" ->
      """WITH m AS (
        |  SELECT DISTINCT event_type AS symbol,
        |         epoch_ms(date_trunc('minute', ts)) AS ms
        |  FROM events),
        |g AS (
        |  SELECT symbol, ms,
        |         lag(ms) OVER (PARTITION BY symbol ORDER BY ms) AS prev_ms
        |  FROM m)
        |SELECT symbol,
        |       prev_ms + 60000 AS gap_start_ms,
        |       ms - 60000 AS gap_end_ms,
        |       (ms - prev_ms) // 60000 - 1 AS n_missing
        |FROM g
        |WHERE prev_ms IS NOT NULL AND ms - prev_ms > 60000
        |ORDER BY 1, 2""".stripMargin,

    "integrity_check" ->
      """WITH e AS (
        |  SELECT event_type AS symbol,
        |         epoch_ms(date_trunc('minute', ts)) AS ms,
        |         lag(epoch_ms(date_trunc('minute', ts)))
        |           OVER (PARTITION BY event_type ORDER BY event_id) AS prev_ms
        |  FROM events)
        |SELECT symbol,
        |       CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(count(DISTINCT ms) AS BIGINT) AS n_distinct,
        |       CAST(count(*) - count(DISTINCT ms) AS BIGINT) AS n_dups,
        |       min(ms) AS min_ms,
        |       max(ms) AS max_ms,
        |       CAST(count(*) FILTER (WHERE prev_ms IS NOT NULL AND ms < prev_ms)
        |            AS BIGINT) AS n_non_monotonic,
        |       (max(ms) - min(ms)) // 60000 + 1 AS expected_rows,
        |       (max(ms) - min(ms)) // 60000 + 1 - count(DISTINCT ms) AS n_missing
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,

    "backfill_plan" ->
      """WITH m AS (
        |  SELECT DISTINCT event_type AS symbol,
        |         epoch_ms(date_trunc('minute', ts)) AS ms
        |  FROM events),
        |g AS (
        |  SELECT symbol, ms,
        |         lag(ms) OVER (PARTITION BY symbol ORDER BY ms) AS prev_ms
        |  FROM m)
        |SELECT symbol,
        |       unnest(generate_series(prev_ms + 60000, ms - 60000, 60000))
        |         AS missing_ms
        |FROM g
        |WHERE prev_ms IS NOT NULL AND ms - prev_ms > 60000
        |ORDER BY 1, 2""".stripMargin,

    "last_row" ->
      """SELECT event_type AS symbol,
        |       max(event_id) AS last_event_id,
        |       arg_max(value, event_id) AS last_value,
        |       max(epoch_ms(date_trunc('minute', ts))) AS last_ms
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "resample_ohlc" ->
      """WITH m1 AS (
        |  SELECT event_type AS symbol,
        |         date_trunc('minute', ts) AS bar_ts,
        |         arg_min(value, event_id) AS open,
        |         max(value) AS high,
        |         min(value) AS low,
        |         arg_max(value, event_id) AS close,
        |         sum(value) AS volume,
        |         count(*) AS n_trades
        |  FROM events GROUP BY 1, 2)
        |SELECT symbol,
        |       epoch_ms(date_trunc('day', bar_ts)) AS day_ms,
        |       arg_min(open, bar_ts) AS open,
        |       max(high) AS high,
        |       min(low) AS low,
        |       arg_max(close, bar_ts) AS close,
        |       round(sum(volume), 6) AS volume,
        |       CAST(sum(n_trades) AS BIGINT) AS n_trades
        |FROM m1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "audit_derived" ->
      """WITH h1 AS (
        |  SELECT event_type AS symbol,
        |         epoch_ms(date_trunc('hour', ts)) AS bar_ts_ms
        |  FROM events GROUP BY 1, 2),
        |b AS (
        |  SELECT symbol,
        |         (bar_ts_ms // 14400000) * 14400000 AS bucket_ms,
        |         count(*) AS cnt,
        |         count(DISTINCT bar_ts_ms) AS nun,
        |         max(bar_ts_ms) - min(bar_ts_ms) AS span
        |  FROM h1 GROUP BY 1, 2)
        |SELECT symbol,
        |       CAST(count(*) AS BIGINT) AS n_buckets,
        |       CAST(count(*) FILTER (WHERE cnt = 4 AND nun = 4
        |            AND span = 10800000) AS BIGINT) AS n_complete,
        |       round((count(*) FILTER (WHERE cnt = 4 AND nun = 4
        |            AND span = 10800000)) * 1.0 / count(*), 6) AS coverage
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
