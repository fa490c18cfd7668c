package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType, StructField}

/** Trade analytics: MAE/MFE excursion diagnostics, vectorized tp-R parameter
  * sweep, and the event-driven backtest engine.
  *
  * References: /root/reference/trade_diagnostics_mae_mfe_short.py:47-82,299
  * (forward-window excursions in R multiples, profit factor),
  * trade_sweep_tpR_short.py (fixed policy, tp-R grid, conservative SL-first
  * on both-touch), scripts/backtest/backtest_router_event_v1_1.py:255-475
  * (entry at next open, SL/TP/time exits, per-bar state machine).
  *
  * Spark-first split: everything *path-free* (excursions, window-level
  * outcome classification, the whole sweep grid) is window functions + one
  * broadcast cross join with the parameter grid — fully parallel, no state.
  * Only the genuinely sequential position lifecycle (one open position at a
  * time, entries gated on being flat) runs as a [[SeqScan]] state machine.
  */
object Backtest {

  /** Forward-window excursion diagnostics for hypothetical SHORT entries at
    * the next bar's open: MAE/MFE over the following `horizon` bars, in R
    * multiples of `slK`·ATR (trade_diagnostics_mae_mfe_short.py:65-82). */
  def maeMfeShort(bars: DataFrame, horizon: Int = 16, slK: Double = 1.0,
                  symbolCol: String = "symbol", tsCol: String = "bar_ts_ms"): DataFrame = {
    val w = Window.partitionBy(symbolCol).orderBy(tsCol)
    val fwd = w.rowsBetween(1, horizon)
    val entry = lead(col("open"), 1).over(w)
    val risk = lit(slK) * col("atr")
    val full = count(col("high")).over(fwd) === horizon
    bars
      .withColumn("entry", entry)
      .withColumn("_risk", risk)
      .withColumn("fwd_max_high", when(full, max(col("high")).over(fwd)))
      .withColumn("fwd_min_low", when(full, min(col("low")).over(fwd)))
      .where(col("entry").isNotNull && col("_risk").isNotNull &&
        col("_risk") > 0.0 && col("fwd_max_high").isNotNull)
      .withColumn("mae_r", (col("fwd_max_high") - col("entry")) / col("_risk"))
      .withColumn("mfe_r", (col("entry") - col("fwd_min_low")) / col("_risk"))
      .drop("_risk")
  }

  /** Window-level SHORT outcome for one (entry, tpR): SL-first when both
    * touched (conservative), else TP, else time exit at the horizon close. */
  private def outcomeR(tpR: Column): Column = {
    val slTouched = col("fwd_max_high") >= col("entry") + col("_risk")
    val tpTouched = col("fwd_min_low") <= col("entry") - tpR * col("_risk")
    when(slTouched, lit(-1.0))
      .when(tpTouched, tpR)
      .otherwise((col("entry") - col("fwd_close")) / col("_risk"))
  }

  /** tp-R parameter sweep (trade_sweep_tpR_short.py): every bar is a
    * hypothetical entry; the tiny grid is broadcast cross-joined, outcomes
    * classified per (bar, tpR) and rolled up per tpR. One shuffle (the final
    * groupBy); the grid side is a literal local relation. Risk is sized
    * from the ENTRY bar's (i+1) ATR, the reference's
    * `atr_i = df.loc[entry_i, "atr"]` convention — degenerate entry-bar
    * ATRs are skipped (`n_skip_atr`), just like in the event engines. */
  def sweepTpR(bars: DataFrame, tpRs: Seq[Double], horizon: Int = 16,
               slK: Double = 1.0, symbolCol: String = "symbol",
               tsCol: String = "bar_ts_ms"): DataFrame = {
    val w = Window.partitionBy(symbolCol).orderBy(tsCol)
    val fwd = w.rowsBetween(1, horizon)
    val full = count(col("high")).over(fwd) === horizon
    val staged = bars
      .withColumn("entry", lead(col("open"), 1).over(w))
      .withColumn("_risk", lit(slK) * lead(col("atr"), 1).over(w))
      .withColumn("fwd_max_high", when(full, max(col("high")).over(fwd)))
      .withColumn("fwd_min_low", when(full, min(col("low")).over(fwd)))
      .withColumn("fwd_close", when(full, nth_value(col("close"), horizon).over(fwd)))
      .where(col("entry").isNotNull && col("_risk").isNotNull &&
        col("_risk") > 0.0 && col("fwd_max_high").isNotNull)
    val spark = bars.sparkSession
    import spark.implicits._
    val grid = broadcast(tpRs.toDF("tp_r"))
    staged.crossJoin(grid)
      .withColumn("r_mult", outcomeR(col("tp_r")))
      .groupBy(col("tp_r"))
      .agg(
        count(lit(1)).as("n_trades"),
        avg(col("r_mult")).as("mean_r"),
        avg(when(col("r_mult") > 0.0, 1.0).otherwise(0.0)).as("wr"),
        sum(when(col("r_mult") > 0.0, col("r_mult")).otherwise(0.0)).as("_pos"),
        sum(when(col("r_mult") < 0.0, -col("r_mult")).otherwise(0.0)).as("_neg"))
      .withColumn("pf", col("_pos") / when(col("_neg") =!= 0.0, col("_neg")))
      .drop("_pos", "_neg")
  }

  /** 2-D sweep over (slK, tpR) pairs (trade_sweep_short_atr_tpR.py): same
    * machinery as [[sweepTpR]] with the risk unit also varying per grid
    * point. Grid is a broadcast literal relation; one shuffle total.
    * Entry-bar ATR sizes the risk, as in [[sweepTpR]]. */
  def sweepGrid(bars: DataFrame, slKs: Seq[Double], tpRs: Seq[Double],
                horizon: Int = 16, symbolCol: String = "symbol",
                tsCol: String = "bar_ts_ms"): DataFrame = {
    val w = Window.partitionBy(symbolCol).orderBy(tsCol)
    val fwd = w.rowsBetween(1, horizon)
    val full = count(col("high")).over(fwd) === horizon
    val staged = bars
      .withColumn("entry", lead(col("open"), 1).over(w))
      .withColumn("_atr_e", lead(col("atr"), 1).over(w))
      .withColumn("fwd_max_high", when(full, max(col("high")).over(fwd)))
      .withColumn("fwd_min_low", when(full, min(col("low")).over(fwd)))
      .withColumn("fwd_close", when(full, nth_value(col("close"), horizon).over(fwd)))
      .where(col("entry").isNotNull && col("_atr_e").isNotNull &&
        col("_atr_e") > 0.0 && col("fwd_max_high").isNotNull)
    val spark = bars.sparkSession
    import spark.implicits._
    val grid = broadcast(
      (for (s <- slKs; t <- tpRs) yield (s, t)).toDF("sl_k", "tp_r"))
    val risk = col("sl_k") * col("_atr_e")
    val slTouched = col("fwd_max_high") >= col("entry") + risk
    val tpTouched = col("fwd_min_low") <= col("entry") - col("tp_r") * risk
    staged.crossJoin(grid)
      .withColumn("r_mult",
        when(slTouched, lit(-1.0))
          .when(tpTouched, col("tp_r"))
          .otherwise((col("entry") - col("fwd_close")) / risk))
      .groupBy(col("sl_k"), col("tp_r"))
      .agg(
        count(lit(1)).as("n_trades"),
        avg(col("r_mult")).as("mean_r"),
        avg(when(col("r_mult") > 0.0, 1.0).otherwise(0.0)).as("wr"),
        sum(when(col("r_mult") > 0.0, col("r_mult")).otherwise(0.0)).as("_pos"),
        sum(when(col("r_mult") < 0.0, -col("r_mult")).otherwise(0.0)).as("_neg"))
      .withColumn("pf", col("_pos") / when(col("_neg") =!= 0.0, col("_neg")))
      .drop("_pos", "_neg")
  }

  /** 3-D (horizon × slK × tpR) sweep — the reference's full grid
    * (_tmp_trade_sweep_short_atr_tpR.py: H_LIST × SL_K_LIST × TP_R_LIST,
    * per-cell n/mean/wr/pf plus exit-reason counts). The horizon dimension
    * costs WINDOW FRAMES, not passes: per-horizon forward extrema are extra
    * frames on the one (symbol, ts) sort, the broadcast grid row selects
    * its horizon's columns with a codegen'd conditional, and ONE hash
    * aggregation rolls up every cell. |H| more frames ≪ |H| more scans.
    * Entry-bar ATR sizes the risk, as in [[sweepTpR]]. */
  def sweepGrid3d(bars: DataFrame, horizons: Seq[Int], slKs: Seq[Double],
                  tpRs: Seq[Double], symbolCol: String = "symbol",
                  tsCol: String = "bar_ts_ms"): DataFrame = {
    val w = Window.partitionBy(symbolCol).orderBy(tsCol)
    val staged = horizons.foldLeft(
        bars.withColumn("entry", lead(col("open"), 1).over(w))
          .withColumn("_atr_e", lead(col("atr"), 1).over(w))) { (df, h) =>
      val fwd = w.rowsBetween(1, h)
      val full = count(col("high")).over(fwd) === h
      df.withColumn(s"_fmh_$h", when(full, max(col("high")).over(fwd)))
        .withColumn(s"_fml_$h", when(full, min(col("low")).over(fwd)))
        .withColumn(s"_fc_$h", when(full, nth_value(col("close"), h).over(fwd)))
    }.where(col("entry").isNotNull && col("_atr_e").isNotNull && col("_atr_e") > 0.0)
    val spark = bars.sparkSession
    import spark.implicits._
    val cells = for { h <- horizons; s <- slKs; t <- tpRs } yield (h, s, t)
    val grid = broadcast(cells.toDF("horizon_bars", "sl_k", "tp_r"))
    def pick(prefix: String) = coalesce(
      horizons.map(h => when(col("horizon_bars") === h, col(s"${prefix}_$h"))): _*)
    staged.crossJoin(grid)
      .withColumn("_risk", col("sl_k") * col("_atr_e"))
      .withColumn("fwd_max_high", pick("_fmh"))
      .withColumn("fwd_min_low", pick("_fml"))
      .withColumn("fwd_close", pick("_fc"))
      .where(col("fwd_max_high").isNotNull)
      .withColumn("r_mult", outcomeR(col("tp_r")))
      .withColumn("_reason",
        when(col("fwd_max_high") >= col("entry") + col("_risk"), "SL")
          .when(col("fwd_min_low") <= col("entry") - col("tp_r") * col("_risk"), "TP")
          .otherwise("TIME"))
      .groupBy(col("horizon_bars"), col("sl_k"), col("tp_r"))
      .agg(
        count(lit(1)).as("n_trades"),
        avg(col("r_mult")).as("mean_r"),
        avg(when(col("r_mult") > 0.0, 1.0).otherwise(0.0)).as("wr"),
        sum(when(col("r_mult") > 0.0, col("r_mult")).otherwise(0.0)).as("_pos"),
        sum(when(col("r_mult") < 0.0, -col("r_mult")).otherwise(0.0)).as("_neg"),
        sum(when(col("_reason") === "SL", 1L).otherwise(0L)).as("n_sl"),
        sum(when(col("_reason") === "TP", 1L).otherwise(0L)).as("n_tp"),
        sum(when(col("_reason") === "TIME", 1L).otherwise(0L)).as("n_time"))
      .withColumn("pf", col("_pos") / when(col("_neg") =!= 0.0, col("_neg")))
      .drop("_pos", "_neg")
  }

  private val tradeFields = Seq(
    StructField("entry_ts", LongType, nullable = true),
    StructField("entry_price", DoubleType, nullable = true),
    StructField("exit_price", DoubleType, nullable = true),
    StructField("exit_reason", StringType, nullable = true),
    StructField("r_mult", DoubleType, nullable = true),
    StructField("bars_held", IntegerType, nullable = true))

  /** Event-driven SHORT backtest — see [[run]]. */
  def runShort(bars: DataFrame, signalCol: String, tpR: Double = 2.0,
               slK: Double = 1.0, horizon: Int = 16,
               symbolCol: String = "symbol", tsCol: String = "bar_ts_ms"): DataFrame =
    run(bars, signalCol, short = true, tpR, slK, horizon, feeBps = 0.0,
      symbolCol = symbolCol, tsCol = tsCol)

  /** Event-driven LONG backtest — mirrored exits. */
  def runLong(bars: DataFrame, signalCol: String, tpR: Double = 2.0,
              slK: Double = 1.0, horizon: Int = 16, feeBps: Double = 0.0,
              symbolCol: String = "symbol", tsCol: String = "bar_ts_ms"): DataFrame =
    run(bars, signalCol, short = false, tpR, slK, horizon, feeBps,
      symbolCol = symbolCol, tsCol = tsCol)

  /** Event-driven backtest (backtest_router_event_v1_1.py:255-475):
    * one open position per symbol; `signalCol`==1 arms an entry executed at
    * the NEXT bar's open; exits on SL (conservative first on both-touch),
    * TP (tpR·risk in the trade direction), an optional regime-flip exit at
    * close when `flipCol`==1 (run_sweep_router_v3_breakout.py FLIP_ROUTER —
    * leave when the router leaves TREND), or time-out after `horizon` bars
    * at close. `feeBps` deducts round-trip costs (entry+exit, in basis
    * points of the entry price) from the R multiple, like the reference's
    * apply_costs_on_entry. Emits one row per closed trade. Runs as a
    * per-symbol [[SeqScan]] — the position lifecycle is inherently
    * sequential; parallelism is across symbols, exactly like a keyed stream
    * processor.
    *
    * Two further risk overlays from backtest_router_event_v1.py:
    *  - `breakEvenAtR` (MR_BREAK_EVEN_AT_R, :252-258): once the bar CLOSE
    *    shows an unrealized gain of that many R, the stop moves to
    *    entry ± `beOffsetR`·risk (locking break-even or a small profit) —
    *    armed once per trade, checked BEFORE the same bar's SL test, in the
    *    reference's exact order. An SL exit then realizes the armed stop's
    *    R, not -1.
    *  - `cooldownBars` (COOLDOWN_AFTER_LOSS_BARS, :209-316): after a LOSING
    *    trade exits at bar i, no new entry may execute until bar
    *    i + cooldownBars + 1 (pre-fee R decides "losing", matching the
    *    reference's pnl_r).
    *
    * A single-engine config IS a degenerate dual config — one constant
    * mode, one constant risk tuple, the explicit `flipCol` as the flip
    * signal — so this folds the SAME [[dualStep]] transition as
    * [[runDualEngine]] and the streaming
    * [[graft.streaming.Ingest.dualBacktestStream]]: one state machine,
    * three entry points, batch/stream equivalence by construction. */
  def run(bars: DataFrame, signalCol: String, short: Boolean,
          tpR: Double = 2.0, slK: Double = 1.0, horizon: Int = 16,
          feeBps: Double = 0.0, flipCol: Option[String] = None,
          breakEvenAtR: Option[Double] = None, beOffsetR: Double = 0.0,
          cooldownBars: Int = 0,
          symbolCol: String = "symbol", tsCol: String = "bar_ts_ms"): DataFrame = {
    val sch = bars.schema
    val iSym = sch.fieldIndex(symbolCol)
    val iTs = sch.fieldIndex(tsCol)
    val iOpen = sch.fieldIndex("open")
    val iHigh = sch.fieldIndex("high")
    val iLow = sch.fieldIndex("low")
    val iClose = sch.fieldIndex("close")
    val iAtr = sch.fieldIndex("atr")
    val iSig = sch.fieldIndex(signalCol)
    val iFlip = flipCol.map(sch.fieldIndex)

    final class Holder { var s: DualState = DualState.init }
    val perBar = SeqScan.mapOrdered(bars, symbolCol, tsCol, tradeFields)(
      () => new Holder) { (h, row) =>
      val bar = DualBar(
        symbol = row.getString(iSym),
        barTsMs = row.getLong(iTs),
        open = row.getDouble(iOpen), high = row.getDouble(iHigh),
        low = row.getDouble(iLow), close = row.getDouble(iClose),
        atr = if (row.isNullAt(iAtr)) None else Some(row.getDouble(iAtr)),
        signal = if (row.isNullAt(iSig)) None else Some(row.getInt(iSig)),
        mode = Some("E"), tpR = tpR, slK = slK, horizonBars = horizon,
        beAtR = breakEvenAtR,
        flip = iFlip.map(i => if (row.isNullAt(i)) 0 else row.getInt(i)))
      val (next, trade) = dualStep(h.s, bar, short, beOffsetR, cooldownBars, feeBps)
      h.s = next
      trade match {
        case Some(t) => Seq(Long.box(t.entryTs), Double.box(t.entryPrice),
          Double.box(t.exitPrice), t.exitReason, Double.box(t.rMult),
          Int.box(t.barsHeld))
        case None => Seq(null, null, null, null, null, null)
      }
    }
    perBar
      .where(col("exit_reason").isNotNull)
      .select(col(symbolCol), col("entry_ts"), col("entry_price"),
        col(tsCol).as("exit_ts"), col("exit_price"), col("exit_reason"),
        col("r_mult"), col("bars_held"))
  }

  private val dualTradeFields = tradeFields :+
    StructField("engine", StringType, nullable = true)

  /** One input bar of the dual-engine state machine in typed form — the
    * streaming path ([[graft.streaming.Ingest.dualBacktestStream]]) consumes
    * this directly; the batch [[runDualEngine]] AND the single-engine
    * [[run]] adapt Rows to it, so all three run the SAME [[dualStep]]
    * transition. `flip` carries [[run]]'s explicit regime-flip signal
    * (run_sweep_router_v3_breakout.py FLIP_ROUTER); the dual engine leaves
    * it None and flips on mode change instead. */
  final case class DualBar(symbol: String, barTsMs: Long, open: Double,
                           high: Double, low: Double, close: Double,
                           atr: Option[Double], signal: Option[Int],
                           mode: Option[String], tpR: Double, slK: Double,
                           horizonBars: Int, beAtR: Option[Double],
                           flip: Option[Int] = None)

  /** One closed trade emitted by the dual-engine machine. */
  final case class DualTrade(symbol: String, engine: String, entryTs: Long,
                             entryPrice: Double, exitTs: Long,
                             exitPrice: Double, exitReason: String,
                             rMult: Double, barsHeld: Int)

  /** The dual-engine position state as an immutable product, so it is both
    * a SeqScan fold accumulator and an encodable streaming `GroupState`.
    * `beAtR` is NaN when break-even is disabled for the open trade.
    * `lastTsMs` is the fold's high-watermark: a bar at or before it is a
    * late arrival or a duplicate and is dropped by [[dualStep]]. */
  final case class DualState(inPos: Boolean, pendingEntry: Boolean,
                             entryTs: Long, entry: Double, risk: Double,
                             barsHeld: Int, beArmed: Boolean, barIdx: Long,
                             cooldownUntil: Long, mode: String, tpR: Double,
                             horizon: Int, beAtR: Double, lastTsMs: Long)

  object DualState {
    val init: DualState = DualState(inPos = false, pendingEntry = false,
      entryTs = 0L, entry = 0.0, risk = 0.0, barsHeld = 0, beArmed = false,
      barIdx = 0L, cooldownUntil = -1L, mode = null, tpR = 0.0, horizon = 0,
      beAtR = Double.NaN, lastTsMs = Long.MinValue)
  }

  /** The per-bar transition of the dual-engine backtest — one pure
    * function shared verbatim by the batch SeqScan and the streaming
    * flatMapGroupsWithState wrapper, so batch/stream equivalence is by
    * construction, not by parallel implementations. Semantics documented
    * on [[runDualEngine]].
    *
    * A bar whose timestamp is at or before the state's `lastTsMs`
    * high-watermark is DROPPED (state unchanged): in a stream, that is a
    * cross-micro-batch late arrival that the batch engine — which sorts
    * globally — would have folded in order, so folding it late would
    * silently diverge from the batch result; in batch (sorted input) it
    * only fires on duplicate timestamps, mirroring minuteBars' dedup
    * hygiene. */
  private[graft] def dualStep(st0: DualState, b: DualBar, short: Boolean,
                              beOffsetR: Double, cooldownBars: Int,
                              feeBps: Double): (DualState, Option[DualTrade]) = {
    if (b.barTsMs <= st0.lastTsMs) return (st0, None)
    var st = st0.copy(barIdx = st0.barIdx + 1, lastTsMs = b.barTsMs)
    var trade: Option[DualTrade] = None
    val mode = b.mode.orNull
    // atr > 0 gate as in [[run]]: a degenerate bar skips the entry rather
    // than opening an unmanageable risk-0 position.
    if (!st.inPos && st.pendingEntry && b.atr.exists(_ > 0.0) && mode != null &&
        st.barIdx > st.cooldownUntil) {
      st = st.copy(inPos = true, entryTs = b.barTsMs, entry = b.open,
        risk = b.slK * b.atr.get, barsHeld = 0, beArmed = false,
        mode = mode, tpR = b.tpR, horizon = b.horizonBars,
        beAtR = b.beAtR.getOrElse(Double.NaN))
    }
    if (st.inPos && st.risk > 0.0) {
      st = st.copy(barsHeld = st.barsHeld + 1)
      val unrealR =
        if (short) (st.entry - b.close) / st.risk
        else (b.close - st.entry) / st.risk
      if (!st.beArmed && !st.beAtR.isNaN && unrealR >= st.beAtR)
        st = st.copy(beArmed = true)
      val sl =
        if (st.beArmed)
          if (short) st.entry - beOffsetR * st.risk
          else st.entry + beOffsetR * st.risk
        else if (short) st.entry + st.risk
        else st.entry - st.risk
      val tp =
        if (short) st.entry - st.tpR * st.risk else st.entry + st.tpR * st.risk
      val slHit = if (short) b.high >= sl else b.low <= sl
      val tpHit = if (short) b.low <= tp else b.high >= tp
      val slR = if (short) (st.entry - sl) / st.risk else (sl - st.entry) / st.risk
      val flip = mode == null || mode != st.mode || b.flip.contains(1)
      val exited: Option[(Double, String, Double)] =
        if (slHit) Some((sl, "SL", slR))
        else if (tpHit) Some((tp, "TP", st.tpR))
        else if (flip) Some((b.close, "FLIP", unrealR))
        else if (st.barsHeld >= st.horizon) Some((b.close, "TIME", unrealR))
        else None
      exited.foreach { case (px, reason, r) =>
        val feeR = 2.0 * feeBps * 1e-4 * st.entry / st.risk
        trade = Some(DualTrade(b.symbol, st.mode, st.entryTs, st.entry,
          b.barTsMs, px, reason, r - feeR, st.barsHeld))
        st = st.copy(inPos = false,
          cooldownUntil =
            if (cooldownBars > 0 && r < 0.0) st.barIdx + cooldownBars
            else st.cooldownUntil)
      }
    }
    st = st.copy(pendingEntry = !st.inPos && b.signal.contains(1))
    (st, trade)
  }

  /** Dual-engine router backtest (backtest_router_event_v1.py:200-330, the
    * TREND/RANGE split): the regime `modeCol` at the ENTRY bar picks the
    * engine, and the trade's whole risk config — `tpRCol`, `slKCol`,
    * `horizonCol`, and a nullable `beAtRCol` (null = no break-even for that
    * engine) — is read from the entry row, so the upstream frame routes
    * per-regime configs with plain `when(...)` columns. Exits add a FLIP
    * when the CURRENT bar's mode differs from the entry engine (the
    * reference's router_mode_now != pos.engine; a null mode counts as
    * left). One position and the post-loss cooldown are shared across
    * engines, exactly like the reference's single `pos` + cooldown_until.
    * Entries require a non-null mode (VOL_EXCLUDE_NA). Emits the entry
    * engine per trade. */
  def runDualEngine(bars: DataFrame, signalCol: String, modeCol: String,
                    short: Boolean = true, tpRCol: String = "tp_r",
                    slKCol: String = "sl_k", horizonCol: String = "horizon_bars",
                    beAtRCol: String = "be_at_r", beOffsetR: Double = 0.0,
                    cooldownBars: Int = 0, feeBps: Double = 0.0,
                    symbolCol: String = "symbol",
                    tsCol: String = "bar_ts_ms"): DataFrame = {
    val sch = bars.schema
    val iSym = sch.fieldIndex(symbolCol)
    val iTs = sch.fieldIndex(tsCol)
    val iOpen = sch.fieldIndex("open")
    val iHigh = sch.fieldIndex("high")
    val iLow = sch.fieldIndex("low")
    val iClose = sch.fieldIndex("close")
    val iAtr = sch.fieldIndex("atr")
    val iSig = sch.fieldIndex(signalCol)
    val iMode = sch.fieldIndex(modeCol)
    val iTpR = sch.fieldIndex(tpRCol)
    val iSlK = sch.fieldIndex(slKCol)
    val iHz = sch.fieldIndex(horizonCol)
    val iBe = sch.fieldIndex(beAtRCol)

    final class Holder { var s: DualState = DualState.init }
    val perBar = SeqScan.mapOrdered(bars, symbolCol, tsCol, dualTradeFields)(
      () => new Holder) { (h, row) =>
      val bar = DualBar(
        symbol = row.getString(iSym),
        barTsMs = row.getLong(iTs),
        open = row.getDouble(iOpen), high = row.getDouble(iHigh),
        low = row.getDouble(iLow), close = row.getDouble(iClose),
        atr = if (row.isNullAt(iAtr)) None else Some(row.getDouble(iAtr)),
        signal = if (row.isNullAt(iSig)) None else Some(row.getInt(iSig)),
        mode = if (row.isNullAt(iMode)) None else Some(row.getString(iMode)),
        tpR = row.getDouble(iTpR), slK = row.getDouble(iSlK),
        horizonBars = row.getInt(iHz),
        beAtR = if (row.isNullAt(iBe)) None else Some(row.getDouble(iBe)))
      val (next, trade) = dualStep(h.s, bar, short, beOffsetR, cooldownBars, feeBps)
      h.s = next
      trade match {
        case Some(t) =>
          Seq(Long.box(t.entryTs), Double.box(t.entryPrice),
            Double.box(t.exitPrice), t.exitReason, Double.box(t.rMult),
            Int.box(t.barsHeld), t.engine)
        case None => Seq(null, null, null, null, null, null, null)
      }
    }
    perBar
      .where(col("exit_reason").isNotNull)
      .select(col(symbolCol), col("engine"), col("entry_ts"), col("entry_price"),
        col(tsCol).as("exit_ts"), col("exit_price"), col("exit_reason"),
        col("r_mult"), col("bars_held"))
  }

  /** Volatility-bucketed excursion report
    * (trade_diagnostics_mae_mfe_short.py:47-82): bucket each entry by its
    * range percentile (the reference's `_rp_bucket` edges) and aggregate the
    * `_perf_series` stats — n, mean, win rate, sample std, p05/p95
    * percentiles, min/max — over the chosen R column. One shuffle.
    *
    * The bucket keys are SEVEN FIXED bands, so each aggregation group is a
    * constant fraction of ALL trades — group size grows linearly with the
    * lake, never with cardinality. `useApprox = true` is therefore the
    * 100 TB path: `percentile_approx` (t-digest-style sketch) holds fixed
    * memory per group and merges map-side partials, where exact
    * `percentile` would buffer ~1/7 of every trade in one task. Exact stays
    * the default for oracle parity at test scale. */
  def bucketReport(rows: DataFrame, rCol: String, pctlCol: String,
                   useApprox: Boolean = false,
                   accuracy: Int = 10000): DataFrame = {
    def pctl(prob: Double): Column =
      if (useApprox) percentile_approx(col(rCol), lit(prob), lit(accuracy))
      else percentile(col(rCol), lit(prob))
    val p = col(pctlCol) / 100.0
    val bucket = when(p.isNull, "NA")
      .when(p < 0.02, "[0.00,0.02)")
      .when(p < 0.04, "[0.02,0.04)")
      .when(p < 0.06, "[0.04,0.06)")
      .when(p < 0.08, "[0.06,0.08)")
      .when(p < 0.10, "[0.08,0.10)")
      .when(p < 0.12, "[0.10,0.12)")
      .otherwise(">=0.12")
    rows.groupBy(bucket.as("rp_bucket"))
      .agg(
        count(col(rCol)).as("n"),
        avg(col(rCol)).as("mean_r"),
        avg(when(col(rCol) > 0.0, 1.0).otherwise(0.0)).as("wr"),
        stddev_samp(col(rCol)).as("std_r"),
        pctl(0.05).as("p05"),
        pctl(0.95).as("p95"),
        min(col(rCol)).as("min_r"),
        max(col(rCol)).as("max_r"))
  }

  /** Confidence keep-fraction sweep (run_ml_m15_v2_flow.py:238-263,
    * `choose_keep_frac_val`): for each fraction f, keep the top-f fraction
    * of rows by `scoreCol` and report the kept cohort's return stats —
    * n, mean r, win rate, profit factor. Rank-based (row_number over a
    * deterministic (score, key) order), not interpolated percentiles, so
    * the kept set is bit-identical across engines and partitionings.
    *
    * The global rank is a single-partition window — fine at validation-set
    * scale (the reference applies this to one fold's rows), and kept as the
    * oracle-checkable small-data variant. [[keepFracSweepApprox]] is the
    * lake-scale path: no global sort anywhere. */
  def keepFracSweep(scored: DataFrame, scoreCol: String, rCol: String,
                    fracs: Seq[Double], tieCols: Seq[String]): DataFrame = {
    val clean = scored.where(col(scoreCol).isNotNull && col(rCol).isNotNull)
    val ord = col(scoreCol).desc +: tieCols.map(col(_).asc)
    val ranked = clean
      .withColumn("_rk", row_number().over(Window.orderBy(ord: _*)))
      .withColumn("_n", count(lit(1)).over(
        Window.orderBy(ord: _*).rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
    val r = col(rCol)
    ranked
      .select(col("_rk"), col("_n"), r.as("_r"),
        explode(array(fracs.map(lit(_)): _*)).as("keep_frac"))
      .where(col("_rk") <= ceil(col("keep_frac") * col("_n")))
      .groupBy(col("keep_frac"))
      .agg(
        count(lit(1)).as("n_kept"),
        avg(col("_r")).as("mean_r"),
        avg(when(col("_r") > 0.0, 1.0).otherwise(0.0)).as("wr"),
        sum(when(col("_r") > 0.0, col("_r")).otherwise(0.0)).as("_pos"),
        sum(when(col("_r") < 0.0, -col("_r")).otherwise(0.0)).as("_neg"))
      .withColumn("pf", col("_pos") / when(col("_neg") =!= 0.0, col("_neg")))
      .drop("_pos", "_neg")
  }

  /** Sketch-path keep-fraction sweep — the 100 TB variant of
    * [[keepFracSweep]]. One `percentile_approx` pass computes the score
    * threshold at probability (1 − f) for EVERY fraction at once (a single
    * mergeable sketch, fixed memory, map-side partials); the resulting
    * |fracs|-row threshold table broadcast-joins back (`score >= thr`) and
    * one hash aggregation rolls up the kept cohorts. No window, no global
    * sort, no single-partition funnel — every stage is either map-side or
    * a standard hash shuffle.
    *
    * Semantics vs the rank form: the sketch keeps `score >= threshold`, so
    * cohort membership can differ from exact top-⌈f·n⌉ by sketch error and
    * score ties (the rank form tie-breaks deterministically). Tests pin the
    * two within tolerance; use the rank form when bit-identical cohorts
    * matter and this form when the data doesn't fit one task. */
  def keepFracSweepApprox(scored: DataFrame, scoreCol: String, rCol: String,
                          fracs: Seq[Double],
                          accuracy: Int = 10000): DataFrame = {
    val clean = scored.where(col(scoreCol).isNotNull && col(rCol).isNotNull)
    val probs = array(fracs.map(f => lit(1.0 - f)): _*)
    val thresholds = clean
      .agg(percentile_approx(col(scoreCol), probs, lit(accuracy)).as("_thrs"))
      .select(posexplode(col("_thrs")).as(Seq("_i", "_thr")))
      .select(element_at(array(fracs.map(lit(_)): _*), col("_i") + 1)
        .as("keep_frac"), col("_thr"))
    val r = col(rCol)
    clean
      .join(broadcast(thresholds), col(scoreCol) >= col("_thr"))
      .groupBy(col("keep_frac"))
      .agg(
        count(lit(1)).as("n_kept"),
        avg(r).as("mean_r"),
        avg(when(r > 0.0, 1.0).otherwise(0.0)).as("wr"),
        sum(when(r > 0.0, r).otherwise(0.0)).as("_pos"),
        sum(when(r < 0.0, -r).otherwise(0.0)).as("_neg"))
      .withColumn("pf", col("_pos") / when(col("_neg") =!= 0.0, col("_neg")))
      .drop("_pos", "_neg")
  }

  /** Per-symbol performance rollup of a trades frame: n, mean R, win rate,
    * profit factor, max drawdown of the cumulative R curve
    * (trade_diagnostics_mae_mfe_short.py:85-90, backtest_router_event_v1_1
    * .py:133-150). */
  def perf(trades: DataFrame, symbolCol: String = "symbol"): DataFrame =
    perfBy(trades, Seq(symbolCol))

  /** [[perf]] over a composite key — e.g. (symbol, engine) for the
    * per-engine summary tables the dual-engine reference script prints.
    * Keeping the symbol in the key keeps the equity ordering deterministic
    * (exit timestamps are unique within a symbol: one position at a time). */
  def perfBy(trades: DataFrame, keyCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy("exit_ts")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withEq = trades
      .withColumn("_eq", sum(col("r_mult")).over(w))
      .withColumn("_peak", max(col("_eq")).over(w))
      .withColumn("_dd", col("_peak") - col("_eq"))
    withEq.groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_trades"),
        avg(col("r_mult")).as("mean_r"),
        avg(when(col("r_mult") > 0.0, 1.0).otherwise(0.0)).as("wr"),
        sum(when(col("r_mult") > 0.0, col("r_mult")).otherwise(0.0)).as("_pos"),
        sum(when(col("r_mult") < 0.0, -col("r_mult")).otherwise(0.0)).as("_neg"),
        max(col("_dd")).as("max_drawdown_r"))
      .withColumn("pf", col("_pos") / when(col("_neg") =!= 0.0, col("_neg")))
      .drop("_pos", "_neg")
  }
}
