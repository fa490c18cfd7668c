package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grouped distribution statistics: exact and sketch-based quantiles,
  * exact and HyperLogLog distinct counts.
  *
  * The reference computes quantiles with pandas `.quantile()` inside its
  * diagnostics (trade_diagnostics_mae_mfe_short.py:299 uses p05/p95); this
  * generalizes that to arbitrary grouped quantile profiles.
  *
  * Scale posture — the pair-of-paths pattern:
  *  - `groupQuantiles` uses exact `percentile` (one shuffle; per-group
  *    value buffers). Exact is what the oracle can verify, and is fine when
  *    per-group cardinality is bounded (here: events per symbol-day).
  *  - `groupQuantilesApprox` uses `percentile_approx` (t-digest style
  *    sketch, fixed memory per group, map-side partial merge) — the 100 TB
  *    path when groups can be arbitrarily large. Tests pin the sketch to
  *    the exact values within tolerance.
  * The same split applies to `count_distinct` vs `approx_count_distinct`
  * (HLL++): exact for oracle parity, sketch for unbounded key spaces.
  */
object Stats {

  /** Exact grouped quantiles of `valCol` at probabilities `ps`, one column
    * per p, named like `p50`. */
  def groupQuantiles(df: DataFrame, keyCols: Seq[String], valCol: String,
                     ps: Seq[Double]): DataFrame = {
    val aggs = ps.map(p => percentile(col(valCol), lit(p)).as(pName(p))) :+
      count(col(valCol)).as("n")
    df.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Sketch-based grouped quantiles (percentile_approx) — fixed memory per
    * group, mergeable partials; the scale path. */
  def groupQuantilesApprox(df: DataFrame, keyCols: Seq[String], valCol: String,
                           ps: Seq[Double], accuracy: Int = 10000): DataFrame = {
    val aggs = ps.map(p =>
      percentile_approx(col(valCol), lit(p), lit(accuracy)).as(pName(p))) :+
      count(col(valCol)).as("n")
    df.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  private def pName(p: Double): String = {
    val pct = p * 100
    if (pct == pct.floor) s"p${pct.toInt}" else s"p${pct}".replace('.', '_')
  }

  /** Exact + HLL distinct counts per group; `approxRsd` is the HLL relative
    * standard deviation. The exact column is oracle-checkable; the approx
    * column is the design that survives an unbounded key space. */
  def distinctProfile(df: DataFrame, keyCols: Seq[String], idCol: String,
                      approxRsd: Double = 0.02): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(
        countDistinct(col(idCol)).as("n_distinct"),
        approx_count_distinct(col(idCol), approxRsd).as("n_distinct_approx"),
        count(lit(1)).as("n_rows"))
}
