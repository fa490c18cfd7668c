package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Per-key ordered sequential scan — the escape hatch for genuinely
  * recursive state that no window frame can express (exponential smoothing,
  * event-driven position simulation).
  *
  * Pattern: `repartition(key)` + `sortWithinPartitions(key, ord)` +
  * `mapPartitions` with state reset on key change — the Spark equivalent of
  * a keyed Flink process function. Parallelism = number of distinct keys
  * (symbols), which is the inherent limit of any per-key recursion; all other
  * operators in this engine stay in declarative window/aggregate form
  * precisely so this pattern stays rare.
  */
object SeqScan {

  /** Run a stateful per-key fold over key-sorted rows. `makeState` is called
    * at every key change; `step` maps (state, row) to the extra column
    * values appended to the row. */
  def mapOrdered[S](
      df: DataFrame,
      keyCol: String,
      ordCol: String,
      extraFields: Seq[StructField])(
      makeState: () => S)(
      step: (S, Row) => Seq[Any]): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ extraFields)
    val keyIdx = df.schema.fieldIndex(keyCol)
    df.repartition(col(keyCol))
      .sortWithinPartitions(col(keyCol), col(ordCol))
      .mapPartitions { it =>
        var curKey: Any = null
        var state: S = null.asInstanceOf[S]
        var started = false
        it.map { row =>
          val k = row.get(keyIdx)
          if (!started || k != curKey) {
            curKey = k; started = true; state = makeState()
          }
          Row.fromSeq(row.toSeq ++ step(state, row))
        }
      }(Encoders.row(outSchema))
  }
}

/** Exponential smoothing specs evaluated in one [[SeqScan]] pass.
  *
  * Matches pandas `ewm(span/alpha, adjust=False, min_periods=m)` as used all
  * over the reference (build_mtf_context_h4_v1.py:90-120,
  * build_h1_regime_router_v2.py:26-41): y₀ = x₀, yₜ = α·xₜ + (1-α)·yₜ₋₁,
  * emitted once `minPeriods` non-null observations were folded. Nulls (e.g.
  * the leading true-range null) do not update state, like pandas.
  */
final case class EwmSpec(outCol: String, valueCol: String, alpha: Double, minPeriods: Int)

object EwmSpec {
  /** pandas `span` parameterization: α = 2/(span+1). */
  def span(outCol: String, valueCol: String, n: Int): EwmSpec =
    EwmSpec(outCol, valueCol, 2.0 / (n + 1), n)
  /** Wilder parameterization: α = 1/len (ATR smoothing). */
  def wilder(outCol: String, valueCol: String, len: Int): EwmSpec =
    EwmSpec(outCol, valueCol, 1.0 / len, len)
}

object Ewm {

  private final class State(n: Int) {
    val value = new Array[Double](n)
    val count = new Array[Long](n)
  }

  def apply(bars: DataFrame, specs: Seq[EwmSpec],
            keyCol: String = "symbol", ordCol: String = "bar_ts_ms"): DataFrame = {
    val valIdx = specs.map(s => bars.schema.fieldIndex(s.valueCol)).toArray
    val extra = specs.map(s => StructField(s.outCol, DoubleType, nullable = true))
    SeqScan.mapOrdered(bars, keyCol, ordCol, extra)(() => new State(specs.length)) {
      (st, row) =>
        specs.indices.map { i =>
          val s = specs(i)
          if (!row.isNullAt(valIdx(i))) {
            val x = row.getDouble(valIdx(i))
            st.value(i) =
              if (st.count(i) == 0L) x
              else s.alpha * x + (1 - s.alpha) * st.value(i)
            st.count(i) += 1
          }
          if (st.count(i) >= s.minPeriods) Double.box(st.value(i)) else null
        }
    }
  }
}
