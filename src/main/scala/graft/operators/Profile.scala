package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
    // internal aliases are INDEX-based and input refs are backtick-escaped,
    // so arbitrary column names (spaces, dots, quotes, backticks) never
    // enter an identifier or a SQL string — everything below is Column API
    def quoted(c: String): String = "`" + c.replace("`", "``") + "`"
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      val v = col(quoted(c))
      Seq(
        count(v).as(s"_n_$i"),
        (if (exact) countDistinct(v) else approx_count_distinct(v))
          .as(s"_d_$i"),
        min(v).cast("string").as(s"_min_$i"),
        max(v).cast("string").as(s"_max_$i"))
    }
    val wide = df.agg(count(lit(1)).as("_rows"), aggs: _*)
    // pivot the single wide row to one output row per column: the
    // struct-array explode is driver-free (no collect) and tiny — |cols|
    // rows from one row
    val entries = array(cols.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c).as("column_name"),
        (col("_rows") - col(s"_n_$i")).as("n_null"),
        col(s"_d_$i").as("n_distinct"),
        col(s"_min_$i").as("min_str"),
        col(s"_max_$i").as("max_str"))
    }: _*)
    wide.select(col("_rows").as("n_rows"), explode(entries).as("_e"))
      .select(col("_e.column_name").as("column_name"), col("n_rows"),
        col("_e.n_null").as("n_null"), col("_e.n_distinct").as("n_distinct"),
        col("_e.min_str").as("min_str"), col("_e.max_str").as("max_str"))
  }

  /** Per-column value counts — the reference inspector's
    * `value_counts(dropna=False)` dump (inspect_router_columns_and_counts
    * _v1_1.py:104-114): one row per (column, rendered value) with the
    * count and the in-column fraction; nulls count as a literal 'NULL'
    * bucket (dropna=False). Spark-first: every column explodes map-side
    * into (column, value) pairs and ONE hash aggregation counts every
    * bucket of every column — a single shuffle for the whole dump (the
    * pandas inspector is one pass per column); the per-column totals for
    * the fraction come from a window over the tiny aggregated frame, not
    * a second scan. */
  def valueCounts(df: DataFrame, cols: Seq[String]): DataFrame = {
    def quoted(c: String): String = "`" + c.replace("`", "``") + "`"
    val kv = explode(array(cols.map { c =>
      struct(lit(c).as("col_name"),
        coalesce(col(quoted(c)).cast("string"), lit("NULL")).as("value"))
    }: _*))
    val counted = df.select(kv.as("_kv"))
      .groupBy(col("_kv.col_name").as("col_name"), col("_kv.value").as("value"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("col_name")
    counted
      .withColumn("frac", round(col("n") / sum(col("n")).over(w), 6))
      .select(col("col_name"), col("value"), col("n"), col("frac"))
  }
}
