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

  /** Robust per-group scaling: median/MAD z-score plus MAD-band outlier
    * clipping (winsorization) — the mean/std-free normalization a
    * heavy-tailed feature (volume, doc length, token counts) needs before
    * training. robust_z = (x − median) / (1.4826·MAD) (the Gaussian
    * consistency constant); `<valueCol>_clipped` clamps x to
    * median ± clipK·1.4826·MAD, passing x through unchanged when MAD = 0
    * (constant group — nothing is an outlier).
    *
    * Two grouped aggregations + two joins against per-group scalars (tiny
    * sides, broadcast at scale). Exact `percentile` (the default) keeps the
    * operator oracle-checkable, but buffers every group's values in one
    * aggregation buffer — groups here are whole symbols, so a hot symbol's
    * full history lands in one task. `useApprox = true` is the 100 TB path:
    * `percentile_approx` sketches hold fixed memory per group and merge
    * map-side partials; tests pin sketch-vs-exact within tolerance. */
  def robustScale(df: DataFrame, keyCols: Seq[String], valueCol: String,
                  clipK: Double = 3.0, useApprox: Boolean = false,
                  accuracy: Int = 10000): DataFrame = {
    def median(c: Column): Column =
      if (useApprox) percentile_approx(c, lit(0.5), lit(accuracy))
      else percentile(c, lit(0.5))
    val keys = keyCols.map(col)
    val v = col(valueCol)
    val med = df.groupBy(keys: _*)
      .agg(median(v).as("_med"))
    val withMed = df.join(med, keyCols)
    val mad = withMed.groupBy(keys: _*)
      .agg(median(abs(v - col("_med"))).as("_mad"))
    val full = withMed.join(mad, keyCols)
    val denom = lit(1.4826) * col("_mad")
    val band = lit(clipK) * denom
    full
      .withColumn("robust_z",
        (col(valueCol) - col("_med")) / when(denom =!= 0.0, denom))
      .withColumn(s"${valueCol}_clipped",
        when(col("_mad") === 0.0, col(valueCol))
          .otherwise(least(greatest(col(valueCol), col("_med") - band),
            col("_med") + band)))
      .drop("_med", "_mad")
  }
}
