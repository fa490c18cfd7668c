package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Derived-table audit: per-symbol completeness of an n-step derived table
  * versus the raw base-step table.
  *
  * Reference: /root/reference/src/bfdl/transforms/audit_derived.py:98-180
  * (for each derived TF, recompute which buckets SHOULD exist from raw m1
  * and compare).
  *
  * Spark-first: a single aggregation over per-bucket gate stats — the same
  * one-shuffle shape as [[TfAggregate]], then a per-symbol rollup. No joins
  * against the derived table are needed for the completeness audit because
  * the derived table is a pure function of raw; the audit recomputes the
  * gates and reports bucket coverage.
  */
object Audit {

  def auditDerived(
      bars: DataFrame,
      stepMs: Long,
      n: Int,
      symbolCol: String = "symbol",
      tsMsCol: String = "bar_ts_ms"): DataFrame = {
    val bucketMs = stepMs * n
    val ts = col(tsMsCol)
    // bars are unique per (symbol, ts) (canonical-dedup contract), so
    // count == distinct and the nunique gate is implied — keeps one shuffle
    val gates = bars
      .groupBy(col(symbolCol), ((ts / bucketMs).cast("long") * bucketMs).as("bucket_ms"))
      .agg(
        count(lit(1)).as("_cnt"),
        (max(ts) - min(ts)).as("_span"))
      .withColumn("_complete",
        col("_cnt") === n && col("_span") === (n - 1) * stepMs)
    gates
      .groupBy(col(symbolCol))
      .agg(
        count(lit(1)).as("n_buckets"),
        sum(when(col("_complete"), 1L).otherwise(0L)).as("n_complete"))
      .withColumn("coverage",
        round(col("n_complete").cast("double") / col("n_buckets"), 6))
  }
}
