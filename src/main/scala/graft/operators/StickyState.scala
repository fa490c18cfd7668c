package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField}

/** Sticky direction-regime state machine with hysteresis.
  *
  * Reference: /root/reference/scripts/research/build_m15_direction_regime.py
  * :274-340 (`_sticky_state_v4`): BULL/BEAR/NEUTRAL states that require
  * `enterN` consecutive directional signals to enter, `exitN` consecutive
  * signal-free bars to decay to NEUTRAL, and allow direct BULL↔BEAR flips
  * (reducing BULL→NEUTRAL→BEAR churn); emits `dir_regime_id` (increments on
  * every state change) and `dir_state_age` (bars since the change) as
  * ML-ready columns.
  *
  * The machine LOOKS sequential, but its transitions depend only on the
  * CURRENT run lengths of the three signal conditions — so the state at any
  * row is simply the most recent "trigger" row's verdict. [[apply]] exploits
  * that: run lengths via rn−max(rn where broken), state via
  * last(trigger, ignoreNulls) — all window functions over one
  * (symbol, ts) sort, partition-parallel and codegen'd, no per-key
  * sequential bottleneck. [[seqScan]] keeps the direct imperative port as
  * the cross-check (StickyStateSpec asserts row-for-row equality on random
  * signal streams).
  */
object StickyState {

  /** Declarative window formulation — the primary, scale-preferred path. */
  def apply(bars: DataFrame, enterN: Int = 2, exitN: Int = 3,
            bullCol: String = "bull_sig", bearCol: String = "bear_sig",
            symbolCol: String = "symbol", tsCol: String = "bar_ts_ms"): DataFrame = {
    val wk = Window.partitionBy(symbolCol).orderBy(tsCol)
    val cum = wk.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bull = col(bullCol) === 1
    val bear = col(bearCol) === 1
    val rn = col("_rn")

    val withRuns = bars
      .withColumn("_rn", row_number().over(wk))
      .withColumn("_bull_run",
        rn - coalesce(max(when(!bull, rn)).over(cum), lit(0)))
      .withColumn("_bear_run",
        rn - coalesce(max(when(!bear, rn)).over(cum), lit(0)))
      .withColumn("_quiet_run",
        rn - coalesce(max(when(bull || bear, rn)).over(cum), lit(0)))
      .withColumn("_trigger",
        when(col("_bull_run") >= enterN, "BULL")
          .when(col("_bear_run") >= enterN, "BEAR")
          .when(col("_quiet_run") >= exitN, "NEUTRAL"))
    val withState = withRuns
      .withColumn("dir_state",
        coalesce(last(col("_trigger"), ignoreNulls = true).over(cum), lit("NEUTRAL")))
    val withChange = withState
      .withColumn("_changed",
        when(col("dir_state") =!=
          coalesce(lag(col("dir_state"), 1).over(wk), lit("NEUTRAL")), 1)
          .otherwise(0))
    withChange
      .withColumn("dir_regime_id", sum(col("_changed")).over(cum).cast("long"))
      .withColumn("dir_state_age",
        when(col("dir_regime_id") === 0, rn)
          .otherwise(rn - max(when(col("_changed") === 1, rn)).over(cum) + 1)
          .cast("int"))
      .drop("_rn", "_bull_run", "_bear_run", "_quiet_run", "_trigger", "_changed")
  }

  /** Direct imperative port of `_sticky_state_v4` — kept as the
    * equivalence reference for [[apply]]. */
  def seqScan(bars: DataFrame, enterN: Int = 2, exitN: Int = 3,
              bullCol: String = "bull_sig", bearCol: String = "bear_sig",
              symbolCol: String = "symbol", tsCol: String = "bar_ts_ms"): DataFrame = {
    val iBull = bars.schema.fieldIndex(bullCol)
    val iBear = bars.schema.fieldIndex(bearCol)
    val extra = Seq(
      StructField("dir_state", StringType, nullable = false),
      StructField("dir_regime_id", LongType, nullable = false),
      StructField("dir_state_age", IntegerType, nullable = false))

    final class St {
      var state = "NEUTRAL"
      var regimeId = 0L
      var age = 0
      var bullRun = 0
      var bearRun = 0
      var quietRun = 0
    }

    SeqScan.mapOrdered(bars, symbolCol, tsCol, extra)(() => new St) { (st, row) =>
      val bull = !row.isNullAt(iBull) && row.getInt(iBull) == 1
      val bear = !row.isNullAt(iBear) && row.getInt(iBear) == 1
      st.bullRun = if (bull) st.bullRun + 1 else 0
      st.bearRun = if (bear) st.bearRun + 1 else 0
      st.quietRun = if (!bull && !bear) st.quietRun + 1 else 0

      val next =
        if (st.bullRun >= enterN) "BULL"
        else if (st.bearRun >= enterN) "BEAR"
        else if (st.quietRun >= exitN) "NEUTRAL"
        else st.state
      if (next != st.state) {
        st.state = next
        st.regimeId += 1
        st.age = 0
      }
      st.age += 1
      Seq(st.state, Long.box(st.regimeId), Int.box(st.age))
    }
  }
}
