package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table/column profiling: one row per column with row, null, distinct
  * counts and string-rendered min/max.
  *
  * Reference: /root/reference/scripts/research/
  * inspect_router_columns_and_counts_v1_1.py — the reference's debugging
  * inspector prints per-column dtype/null/unique/value counts for a joined
  * router table.
  *
  * Spark-first: ALL columns profile in ONE aggregation pass — each metric is
  * a conditional aggregate over the same scan, so a 100 TB table is read
  * once, not once per column (the pandas inspector's `.nunique()` loop is a
  * full pass per column). Exact distinct counts expand to one shuffle per
  * distinct aggregate under Spark's `expand` planning, which is the honest
  * cost of exactness; at lake scale call with `exact = false` to ride
  * HyperLogLog (`approx_count_distinct`, one shuffle total) — the same
  * exact-vs-sketch pairing as [[Stats.distinctProfile]].
  */
object Profile {

  def columnProfile(df: DataFrame, cols: Seq[String],
                    exact: Boolean = true): DataFrame = {
    val aggs = cols.flatMap { c =>
      val v = col(c)
      Seq(
        count(v).as(s"_n_$c"),
        (if (exact) countDistinct(v) else approx_count_distinct(v))
          .as(s"_d_$c"),
        min(v).cast("string").as(s"_min_$c"),
        max(v).cast("string").as(s"_max_$c"))
    }
    val wide = df.agg(count(lit(1)).as("_rows"), aggs: _*)
    // pivot the single wide row to one output row per column: the stack is
    // driver-free (no collect) and tiny — |cols| rows
    val stacked = cols.map { c =>
      s"'$c', _rows - _n_$c, _d_$c, _min_$c, _max_$c"
    }.mkString(", ")
    wide.select(col("_rows").as("n_rows"),
        expr(s"stack(${cols.size}, $stacked) AS " +
          "(column_name, n_null, n_distinct, min_str, max_str)"))
      .select(col("column_name"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_str"), col("max_str"))
  }
}
