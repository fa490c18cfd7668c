package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Strict multi-timeframe router gate: a bar may go LONG only when the base
  * and coarse timeframe verdicts agree and the veto timeframe does not
  * oppose; mirrored for SHORT; a bar can never be both (defensive
  * neutralization).
  *
  * Reference: /root/reference/scripts/research/build_router_gate_from_audit_v1
  * .py:31-52 (`_strict_long`/`_strict_short`: all coarser labels agree,
  * `label_h4` must not be opposite). The reference gates on w1/d1/h4/h1;
  * this composition uses the timeframes the synthetic data can make READY
  * (h1 base + 4h consensus + 1d veto — weekly ichimoku needs 78 weekly bars,
  * more history than the corpus holds) with identical gate algebra.
  *
  * Spark-first: three ichimoku window chains (base + two fixed-bucket
  * resamples), coarse verdicts lagged one bucket (anti-lookahead) and
  * projected with the union+window [[AsOf]] join — no range joins, plan
  * shape invariant in data size.
  */
object RouterGate {

  def apply(bars: DataFrame, stepMs: Long,
            p: IchimokuParams = IchimokuParams(),
            symbolCol: String = "symbol", tsCol: String = "bar_ts_ms"): DataFrame = {
    val base = Ichimoku(bars, p, symbolCol, tsCol)
      .select(col(symbolCol), col(tsCol), col("close"),
        col("label").as("label_h1"))

    def laggedVerdicts(mult: Int, outCol: String): DataFrame = {
      val coarse = Ichimoku(
        Resample.ohlcFixed(bars, stepMs * mult, symbolCol, tsCol),
        p, symbolCol, tsCol)
      val wb = Window.partitionBy(symbolCol).orderBy(tsCol)
      coarse.select(col(symbolCol), col(tsCol),
        lag(col("label"), 1).over(wb).as(outCol))
    }

    val j1 = AsOf.joinBackward(base, laggedVerdicts(4, "label_h4"),
      symbolCol, tsCol, tsCol, matchedTsCol = "h4_ts_ms")
    val j2 = AsOf.joinBackward(j1, laggedVerdicts(24, "label_d1"),
      symbolCol, tsCol, tsCol, matchedTsCol = "d1_ts_ms")

    val rawLong = col("label_h1") === "LONG" && col("label_h4") === "LONG" &&
      (col("label_d1").isNull || col("label_d1") =!= "SHORT")
    val rawShort = col("label_h1") === "SHORT" && col("label_h4") === "SHORT" &&
      (col("label_d1").isNull || col("label_d1") =!= "LONG")
    j2
      .withColumn("allow_long",
        when(rawLong && !rawShort, 1).otherwise(0))
      .withColumn("allow_short",
        when(rawShort && !rawLong, 1).otherwise(0))
      .select(col(symbolCol), col(tsCol), col("label_h1"),
        col("label_h4"), col("label_d1"),
        col("allow_long"), col("allow_short"))
  }
}
