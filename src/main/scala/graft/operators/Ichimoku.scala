package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ichimoku multi-timeframe trend scoring.
  *
  * Reference: /root/reference/scripts/research/compute_ichimoku_mtf_trend_v1
  * .py:27-46 (params: tenkan 9 / kijun 26 / senkou-B 52 / displacement 25,
  * unit weights, pass thresholds 3, neutral delta 1.0) and :99-165 (bull/bear
  * component scores, lagged cloud visibility, readiness gating, LONG / SHORT
  * / NEUTRE labels).
  *
  * Spark-first: tenkan/kijun/senkou are rolling max/min chains over one
  * (symbol, ts) window family; displacement is `lag`. Everything stays in a
  * single window pass — no self-joins, no state.
  */
final case class IchimokuParams(
    tenkanLen: Int = 9,
    kijunLen: Int = 26,
    senkouBLen: Int = 52,
    disp: Int = 25,
    wKumo: Int = 1,
    wPrice: Int = 1,
    wChikou: Int = 1,
    wTk: Int = 1,
    bullPass: Int = 3,
    bearPass: Int = 3,
    neutralDelta: Double = 1.0) {
  def warmupBars: Int = math.max(tenkanLen, math.max(kijunLen, senkouBLen)) + disp
}

object Ichimoku {

  def apply(bars: DataFrame, p: IchimokuParams = IchimokuParams(),
            symbolCol: String = "symbol", tsCol: String = "bar_ts_ms"): DataFrame = {
    val w = Window.partitionBy(symbolCol).orderBy(tsCol)
    def rolled(len: Int)(f: Column): Column = {
      val frame = w.rowsBetween(-(len - 1), Window.currentRow)
      when(count(col("high")).over(frame) === len, f.over(frame))
    }
    def midline(len: Int): Column =
      (rolled(len)(max(col("high"))) + rolled(len)(min(col("low")))) / 2.0

    val staged = bars
      .withColumn("tenkan", midline(p.tenkanLen))
      .withColumn("kijun", midline(p.kijunLen))
      .withColumn("ssb", midline(p.senkouBLen))
      .withColumn("ssa", (col("tenkan") + col("kijun")) / 2.0)
      .withColumn("rn", row_number().over(w))
    val lagged = staged
      .withColumn("ssa_vis", lag(col("ssa"), p.disp).over(w))
      .withColumn("ssb_vis", lag(col("ssb"), p.disp).over(w))
      .withColumn("close_lag", lag(col("close"), p.disp).over(w))

    def ind(c: Column): Column = when(c, 1).otherwise(0)
    val bull = ind(col("ssa") > col("ssb")) * p.wKumo +
      ind(col("close") > greatest(col("ssa_vis"), col("ssb_vis"))) * p.wPrice +
      ind(col("close") > col("close_lag")) * p.wChikou +
      ind(col("tenkan") > col("kijun")) * p.wTk
    val bear = ind(col("ssa") < col("ssb")) * p.wKumo +
      ind(col("close") < least(col("ssa_vis"), col("ssb_vis"))) * p.wPrice +
      ind(col("close") < col("close_lag")) * p.wChikou +
      ind(col("tenkan") < col("kijun")) * p.wTk

    val ready = col("tenkan").isNotNull && col("kijun").isNotNull &&
      col("ssa").isNotNull && col("ssb").isNotNull &&
      col("ssa_vis").isNotNull && col("ssb_vis").isNotNull &&
      col("close_lag").isNotNull && col("rn") >= p.warmupBars + 1

    val scored = lagged
      .withColumn("_bull", bull).withColumn("_bear", bear)
      .withColumn("_ready", ready)
    val neutral = abs(col("_bull") - col("_bear")) < p.neutralDelta
    val isLong = col("_ready") && !neutral &&
      col("_bull") >= p.bullPass && col("_bull") > col("_bear")
    val isShort = col("_ready") && !neutral &&
      col("_bear") >= p.bearPass && col("_bear") > col("_bull")

    scored
      .withColumn("bull_score",
        when(col("_ready"), col("_bull")).otherwise(0).cast("int"))
      .withColumn("bear_score",
        when(col("_ready"), col("_bear")).otherwise(0).cast("int"))
      .withColumn("label",
        when(isLong, "LONG").when(isShort, "SHORT").otherwise("NEUTRE"))
      .withColumn("score_display",
        when(!col("_ready"), 0)
          .when(isLong, col("_bull"))
          .when(isShort, col("_bear"))
          .otherwise(greatest(col("_bull"), col("_bear"))).cast("int"))
      .drop("_bull", "_bear", "_ready", "rn")
  }
}
