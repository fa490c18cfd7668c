package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: group a keyed event stream into sessions that
  * break whenever consecutive events are `gap` or more apart.
  *
  * No direct pandas analogue in the reference (its streams are minute-grid
  * bars); this is the training-data-pipeline operator for grouping raw
  * interaction/event logs into conversations/sessions before downstream
  * aggregation.
  *
  * Spark-first: the core is the built-in `session_window` aggregation —
  * Spark merges per-key event windows `[ts, ts+gap)` into sessions inside a
  * single hash-shuffle on the key, with AQE-coalesced partitions; the same
  * expression runs unchanged under Structured Streaming (watermark +
  * `session_window` is the canonical streaming-sessionization pattern, so
  * this operator is batch/stream portable by construction). Timestamps are
  * truncated to epoch-ms before windowing so the session-break decision is
  * engine-exact (sub-ms parquet precision cannot flip a boundary).
  *
  * Session ids are assigned per key in start order AFTER aggregation — a
  * window over one row per session, negligible at any scale.
  */
object Sessions {

  /** Per-session summary: (key, session_id, session_start_ms,
    * session_end_ms, n_events, sum_value). Break rule: a new session starts
    * when an event is STRICTLY more than `gapMs` after the previous one —
    * `session_window` merges touching windows, so an event at exactly
    * prev+gap still extends the session. */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
                 valueCol: String, gapMs: Long): DataFrame = {
    val tsMs = timestamp_millis(unix_millis(col(tsCol)))
    val perSession = events
      .groupBy(col(keyCol),
        session_window(tsMs, s"$gapMs milliseconds").as("_sw"))
      .agg(
        unix_millis(min(tsMs)).as("session_start_ms"),
        unix_millis(max(tsMs)).as("session_end_ms"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("sum_value"))
    val w = Window.partitionBy(keyCol).orderBy(col("session_start_ms"))
    perSession
      .withColumn("session_id", row_number().over(w).cast("long"))
      .select(col(keyCol), col("session_id"), col("session_start_ms"),
        col("session_end_ms"), col("n_events"), col("sum_value"))
  }
}
