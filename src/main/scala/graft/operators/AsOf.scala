package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Backward (anti-lookahead) as-of join: every left row picks up the most
  * recent right row with right.ts <= left.ts within the same key.
  *
  * Reference: /root/reference/scripts/research/build_mtf_context_h4_v1.py:228
  * (`pd.merge_asof(..., direction="backward")`) — the join that projects
  * completed coarse-timeframe context onto fine-grained rows.
  *
  * Spark-first design: Spark has no merge_asof. A range join would explode
  * and a windowed self-join would double-shuffle. Instead: tag and UNION the
  * two sides, then one window over (key, ts, tag) takes the running
  * `last(right_payload, ignoreNulls)` — right rows sort before left rows at
  * equal ts, so the match is inclusive, exactly like merge_asof/DuckDB ASOF.
  * One shuffle on the key, one sort, O(n) running frame; no pair blow-up at
  * any scale. The right payload travels as a single struct so a legitimately
  * null payload field can never "tear" across older right rows.
  */
object AsOf {

  /** @param left     fine rows; `leftTsCol` must be epoch-ms (long-castable)
    * @param right    coarse context rows, unique per (key, rightTsCol)
    * @param matchedTsCol output column holding the matched right timestamp
    */
  def joinBackward(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      matchedTsCol: String = "matched_ts"): DataFrame = {
    val payloadCols = right.columns.filterNot(c => c == keyCol || c == rightTsCol).toSeq
    val collisions = (payloadCols.toSet + matchedTsCol).intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"rename right payload / matchedTs columns colliding with left: $collisions")

    val leftType = StructType(left.schema.fields)
    val rightStructFields = StructField(matchedTsCol, LongType) +:
      payloadCols.map(c => right.schema(c).copy(name = c))
    val rightType = StructType(rightStructFields.toArray)

    val l = left.select(
      col(keyCol).as("_k"), col(leftTsCol).cast("long").as("_ts"), lit(1).as("_tag"),
      struct(left.columns.map(col).toSeq: _*).as("_l"),
      lit(null).cast(rightType).as("_r"))
    val r = right.select(
      col(keyCol).as("_k"), col(rightTsCol).cast("long").as("_ts"), lit(0).as("_tag"),
      lit(null).cast(leftType).as("_l"),
      struct((col(rightTsCol).cast("long").as(matchedTsCol) +: payloadCols.map(col)): _*).as("_r"))

    val w = Window.partitionBy("_k").orderBy("_ts", "_tag")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_rf", last(col("_r"), ignoreNulls = true).over(w))
      .where(col("_tag") === 1)
      .select(col("_l.*") +: (matchedTsCol +: payloadCols).map(c => col(s"_rf.$c")): _*)
  }

  /** Grid fast path: when left timestamps are known to live on the right
    * table's bucket grid, the as-of collapses to a plain equi-join on the
    * floored bucket — cheaper (pure hash join, broadcastable right side) and
    * exactly equivalent for grid-aligned data. */
  def joinGrid(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      bucketMs: Long): DataFrame = {
    val floored = left.withColumn("_bucket",
      (col(leftTsCol).cast("long") / bucketMs).cast("long") * bucketMs)
    floored.join(
      right.withColumnRenamed(rightTsCol, "_bucket"),
      Seq(keyCol, "_bucket"), "left")
      .drop("_bucket")
  }
}
