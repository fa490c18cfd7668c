package graft.operators

import org.apache.spark.sql.DataFrame
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
  * Genuinely sequential (state depends on its own history) → [[SeqScan]]
  * per symbol, like the EMA and backtest operators.
  */
object StickyState {

  def apply(bars: DataFrame, enterN: Int = 2, exitN: Int = 3,
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
