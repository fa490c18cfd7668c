package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-grid trust machinery: gap detection, integrity checks and backfill
  * planning.
  *
  * References: /root/reference/src/bfdl/transforms/gaps_report.py:13-32
  * (missing-range detection), integrity_checks.py:26-110 (dupes,
  * monotonicity, expected-row counts), backfill_gaps.py:104-195 (gap → fetch
  * plan).
  *
  * Spark-first design: the reference materializes the FULL minute grid
  * (`pd.date_range`) and set-differences it against the data — O(grid) memory
  * on one node. Here gaps come from a `lag` window over only the PRESENT
  * rows: one shuffle on symbol, O(data) not O(grid), and each gap range is
  * one row regardless of how many minutes it spans. The explicit grid is only
  * ever materialized per-gap (backfill plan), distributed via
  * `sequence`+`explode`.
  */
object Gaps {

  /** One row per contiguous missing range on the step grid, per symbol. */
  def gapsReport(
      bars: DataFrame,
      stepMs: Long,
      symbolCol: String = "symbol",
      tsMsCol: String = "bar_ts_ms"): DataFrame = {
    val w = Window.partitionBy(symbolCol).orderBy(tsMsCol)
    bars
      .select(col(symbolCol), col(tsMsCol))
      .withColumn("_prev", lag(col(tsMsCol), 1).over(w))
      .where(col("_prev").isNotNull && col(tsMsCol) - col("_prev") > stepMs)
      .select(
        col(symbolCol),
        (col("_prev") + stepMs).as("gap_start_ms"),
        (col(tsMsCol) - stepMs).as("gap_end_ms"),
        (((col(tsMsCol) - col("_prev")) / stepMs).cast("long") - 1).as("n_missing"))
  }

  /** Per-symbol integrity summary over raw (possibly duplicated, possibly
    * out-of-order) grid rows: row counts, duplicate keys, expected grid rows
    * between min and max, missing count, and ingestion-order monotonicity
    * violations (rows whose grid timestamp went backwards vs the previous
    * ingested row). */
  def integrityCheck(
      rows: DataFrame,
      stepMs: Long,
      symbolCol: String = "symbol",
      tsMsCol: String = "ts_ms",
      ordCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(symbolCol).orderBy(ordCol)
    val withPrev = rows.select(col(symbolCol), col(tsMsCol), col(ordCol))
      .withColumn("_prev", lag(col(tsMsCol), 1).over(w))
    withPrev
      .groupBy(col(symbolCol))
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col(tsMsCol)).as("n_distinct"),
        (count(lit(1)) - countDistinct(col(tsMsCol))).as("n_dups"),
        min(col(tsMsCol)).as("min_ms"),
        max(col(tsMsCol)).as("max_ms"),
        sum(when(col("_prev").isNotNull && col(tsMsCol) < col("_prev"), 1L)
          .otherwise(0L)).as("n_non_monotonic"))
      .withColumn("expected_rows",
        ((col("max_ms") - col("min_ms")) / stepMs).cast("long") + 1)
      .withColumn("n_missing", col("expected_rows") - col("n_distinct"))
  }

  /** Explode gap ranges into the concrete per-step fetch plan
    * (backfill_gaps.py fetches each missing minute). Distributed: each gap
    * row expands independently; no driver-side loop, no full-grid range. */
  def backfillPlan(gaps: DataFrame, stepMs: Long, symbolCol: String = "symbol"): DataFrame =
    gaps.select(
      col(symbolCol),
      explode(sequence(col("gap_start_ms"), col("gap_end_ms"), lit(stepMs)))
        .as("missing_ms"))

  /** Forward-fill bars onto the full time grid (last observation carried
    * forward): generate every grid step between each symbol's min and max
    * timestamp, then as-of join the present bars backward — missing steps
    * inherit the most recent bar, flagged `is_filled`. The distributed LOCF:
    * grid generation is per-symbol `sequence`+`explode` (no driver loop) and
    * the fill is one [[AsOf]] window pass. */
  def gridFfill(
      bars: DataFrame,
      stepMs: Long,
      symbolCol: String = "symbol",
      tsMsCol: String = "bar_ts_ms"): DataFrame = {
    val grid = bars.groupBy(col(symbolCol))
      .agg(min(col(tsMsCol)).as("_mn"), max(col(tsMsCol)).as("_mx"))
      .select(col(symbolCol),
        explode(sequence(col("_mn"), col("_mx"), lit(stepMs))).as("grid_ms"))
    AsOf.joinBackward(grid, bars, symbolCol, "grid_ms", tsMsCol,
        matchedTsCol = "src_ms")
      .withColumn("is_filled", (col("src_ms") =!= col("grid_ms")).cast("int"))
  }

  /** Per-symbol last-row probe (last_minute.py:17): max grid timestamp and
    * the latest value by ingestion order. A pure aggregation — on the lake
    * layout this prunes to the newest month partition. */
  def lastRow(
      rows: DataFrame,
      symbolCol: String = "symbol",
      tsMsCol: String = "ts_ms",
      ordCol: String = "event_id",
      valueCol: String = "value"): DataFrame =
    rows.groupBy(col(symbolCol))
      .agg(
        max(col(ordCol)).as("last_event_id"),
        max_by(col(valueCol), col(ordCol)).as("last_value"),
        max(col(tsMsCol)).as("last_ms"))
}
