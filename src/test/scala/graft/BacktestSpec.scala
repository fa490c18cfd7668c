package graft

import graft.operators.Backtest

class BacktestSpec extends SparkTestBase {
  import spark.implicits._

  // (symbol, ts, open, high, low, close, atr, signal)
  private def mk(rows: (Long, Double, Double, Double, Double, Double, Int)*) =
    rows.map { case (ts, o, h, l, c, atr, sig) => ("A", ts, o, h, l, c, atr, sig) }
      .toDF("symbol", "bar_ts_ms", "open", "high", "low", "close", "atr", "signal")

  test("SL exit: signal arms entry at next open; stop at entry + atr") {
    val bars = mk(
      (0L, 100, 101, 99, 100, 10.0, 1),   // signal
      (1L, 100, 102, 98, 101, 10.0, 0),   // entry at open=100, SL=110
      (2L, 101, 115, 100, 112, 10.0, 0))  // high 115 >= 110 -> SL
    val t = Backtest.runShort(bars, "signal", tpR = 2.0, slK = 1.0, horizon = 16)
      .collect()
    assert(t.length == 1)
    assert(t(0).getAs[Long]("entry_ts") == 1L)
    assert(t(0).getAs[Double]("entry_price") == 100.0)
    assert(t(0).getAs[String]("exit_reason") == "SL")
    assert(t(0).getAs[Double]("exit_price") == 110.0)
    assert(t(0).getAs[Double]("r_mult") == -1.0)
  }

  test("TP exit at entry - tpR*risk") {
    val bars = mk(
      (0L, 100, 101, 99, 100, 5.0, 1),
      (1L, 100, 101, 99, 100, 5.0, 0),    // entry 100, risk 5, TP=90
      (2L, 99, 100, 89, 95, 5.0, 0))      // low 89 <= 90 -> TP
    val t = Backtest.runShort(bars, "signal", tpR = 2.0).collect()
    assert(t.length == 1)
    assert(t(0).getAs[String]("exit_reason") == "TP")
    assert(t(0).getAs[Double]("r_mult") == 2.0)
  }

  test("conservative both-touch: SL wins inside one bar") {
    val bars = mk(
      (0L, 100, 101, 99, 100, 5.0, 1),
      (1L, 100, 120, 80, 100, 5.0, 0))    // both SL(105) and TP(90) touched
    val t = Backtest.runShort(bars, "signal", tpR = 2.0).collect()
    assert(t(0).getAs[String]("exit_reason") == "SL")
  }

  test("time exit after horizon bars at close; no re-entry while in position") {
    val bars = mk(
      (0L, 100, 100, 100, 100, 5.0, 1),
      (1L, 100, 101, 99, 100, 5.0, 1),    // entry; signal here ignored (in pos)
      (2L, 100, 101, 99, 98, 5.0, 0),
      (3L, 98, 99, 97, 95, 5.0, 0))       // horizon=3 -> exit at close 95
    val t = Backtest.runShort(bars, "signal", tpR = 10.0, slK = 1.0, horizon = 3)
      .collect()
    assert(t.length == 1)
    assert(t(0).getAs[String]("exit_reason") == "TIME")
    assert(t(0).getAs[Double]("r_mult") == 1.0) // (100-95)/5
    assert(t(0).getAs[Int]("bars_held") == 3)
  }

  test("mae/mfe in R multiples over the forward window") {
    // 5 bars, horizon 2: entry at next open, excursions from following 2 bars
    val bars = mk(
      (0L, 100, 100, 100, 100, 10.0, 0),
      (1L, 100, 100, 100, 100, 10.0, 0),
      (2L, 100, 115, 95, 100, 10.0, 0),
      (3L, 100, 105, 85, 100, 10.0, 0),
      (4L, 100, 100, 100, 100, 10.0, 0))
    val out = Backtest.maeMfeShort(bars, horizon = 2, slK = 1.0)
      .orderBy("bar_ts_ms").collect()
    // row at ts=1: entry=open@2=100, fwd bars 2..3: maxH=115, minL=85
    val r = out.find(_.getAs[Long]("bar_ts_ms") == 1L).get
    assert(r.getAs[Double]("mae_r") == 1.5)
    assert(r.getAs[Double]("mfe_r") == 1.5)
  }

  test("sweep ranks outcomes per tp_r with conservative both-touch") {
    val bars = mk(
      (0L, 100, 100, 100, 100, 10.0, 0),
      (1L, 100, 100, 100, 100, 10.0, 0),
      (2L, 100, 105, 79, 100, 10.0, 0),
      (3L, 100, 105, 95, 92, 10.0, 0))
    val out = Backtest.sweepTpR(bars, Seq(1.0, 3.0), horizon = 2, slK = 1.0)
      .orderBy("tp_r").collect()
    // two qualifying entries (ts=0 and ts=1, both entry=100, no SL touch):
    // tp_r=1: TP at 90 touched for both (low 79) -> mean 1.0
    // tp_r=3: TP at 70 missed -> TIME exits at close 100 (r=0) and 92 (r=0.8)
    assert(out(0).getAs[Double]("mean_r") == 1.0)
    assert(out(1).getAs[Double]("mean_r") == 0.4)
  }

  test("router-flip exit closes at the flip bar's close before any time stop") {
    val bars = Seq(
      ("A", 0L, 100.0, 101.0, 99.0, 100.0, 10.0, 1, 0),  // signal, in regime
      ("A", 1L, 100.0, 101.0, 99.0, 100.0, 10.0, 0, 0),  // entry at 100
      ("A", 2L, 100.0, 101.0, 99.0, 98.0, 10.0, 0, 0),   // no exit yet
      ("A", 3L, 98.0, 99.0, 97.0, 97.0, 10.0, 0, 1),     // regime flips -> exit
      ("A", 4L, 97.0, 98.0, 96.0, 96.0, 10.0, 0, 1))
      .toDF("symbol", "bar_ts_ms", "open", "high", "low", "close", "atr",
        "signal", "flip")
    val t = Backtest.run(bars, "signal", short = true, tpR = 5.0, slK = 1.0,
      horizon = 16, flipCol = Some("flip")).collect()
    assert(t.length == 1)
    assert(t(0).getAs[String]("exit_reason") == "FLIP")
    assert(t(0).getAs[Long]("exit_ts") == 3L)
    assert(t(0).getAs[Double]("exit_price") == 97.0)
    // r = (entry - close)/risk = (100-97)/10
    assert(math.abs(t(0).getAs[Double]("r_mult") - 0.3) < 1e-12)
  }

  test("break-even arms on the SAME bar's close before its SL test") {
    // entry bar closes +0.6R in favor -> stop moves to entry; the same
    // bar's high then trips the moved stop at r=0 (the reference's
    // arm-before-SL-check order, backtest_router_event_v1.py:252)
    val bars = mk(
      (0L, 100, 101, 99, 100, 10.0, 1),
      (1L, 100, 100.5, 93, 94, 10.0, 0)) // close 94 -> +0.6R; high 100.5 >= 100
    val t = Backtest.run(bars, "signal", short = true, tpR = 2.0, slK = 1.0,
      horizon = 16, breakEvenAtR = Some(0.6)).collect()
    assert(t.length == 1)
    assert(t(0).getAs[String]("exit_reason") == "SL")
    assert(t(0).getAs[Double]("exit_price") == 100.0)
    assert(t(0).getAs[Double]("r_mult") == 0.0)
  }

  test("break-even stop: armed on a later close, retrace exits at entry not -1R") {
    val bars = mk(
      (0L, 100, 101, 99, 100, 10.0, 1),
      (1L, 100, 101, 96, 98, 10.0, 0),   // entry 100; +0.2R close: not armed
      (2L, 98, 99, 93, 93, 10.0, 0),     // close 93 -> +0.7R: arm; high 99 < 100
      (3L, 94, 101, 93, 100, 10.0, 0),   // high 101 >= moved stop 100 -> BE exit
      (4L, 100, 101, 99, 100, 10.0, 0))
    val be = Backtest.run(bars, "signal", short = true, tpR = 3.0, slK = 1.0,
      horizon = 16, breakEvenAtR = Some(0.6)).collect()
    assert(be.length == 1)
    assert(be(0).getAs[String]("exit_reason") == "SL")
    assert(be(0).getAs[Double]("exit_price") == 100.0)
    assert(be(0).getAs[Double]("r_mult") == 0.0)
    assert(be(0).getAs[Long]("exit_ts") == 3L)
    // without the overlay the same path never hits SL(110)/TP(70) and the
    // horizon is longer than the data: no exit at all
    val plain = Backtest.run(bars, "signal", short = true, tpR = 3.0, slK = 1.0,
      horizon = 16).collect()
    assert(plain.isEmpty)
    // a positive offset locks +offset R instead of break-even
    val off = Backtest.run(bars, "signal", short = true, tpR = 3.0, slK = 1.0,
      horizon = 16, breakEvenAtR = Some(0.6), beOffsetR = 0.2).collect()
    assert(off(0).getAs[Double]("exit_price") == 98.0) // entry - 0.2*risk
    assert(math.abs(off(0).getAs[Double]("r_mult") - 0.2) < 1e-12)
  }

  test("cooldown after a loss suppresses entries for N bars; wins don't cool down") {
    val bars = mk(
      (0L, 100, 100, 100, 100, 10.0, 1),  // signal
      (1L, 100, 115, 99, 100, 10.0, 1),   // entry; SL at 110 -> -1R; re-signal
      (2L, 100, 100, 100, 100, 10.0, 1),  // blocked (cooldown), re-signal
      (3L, 100, 100, 100, 100, 10.0, 1),  // blocked, re-signal
      (4L, 100, 100, 100, 100, 10.0, 1),  // last blocked bar, re-signal
      (5L, 100, 101, 99, 100, 10.0, 0),   // cooldown over: entry executes here
      (6L, 100, 101, 99, 100, 10.0, 0),
      (7L, 100, 115, 99, 100, 10.0, 0))   // SL again
    val cd = Backtest.run(bars, "signal", short = true, tpR = 2.0, slK = 1.0,
      horizon = 16, cooldownBars = 3).collect()
    assert(cd.length == 2)
    assert(cd(0).getAs[Long]("entry_ts") == 1L)
    assert(cd(1).getAs[Long]("entry_ts") == 5L) // loss at bar idx 2 blocks idx 3-5 = ts 2-4
    // without cooldown the second entry lands immediately after the loss
    val plain = Backtest.run(bars, "signal", short = true, tpR = 2.0, slK = 1.0,
      horizon = 16).collect()
    assert(plain.length == 2 && plain(1).getAs[Long]("entry_ts") == 2L)
    // a WINNING trade triggers no cooldown: TP then immediate re-entry
    val winBars = mk(
      (0L, 100, 100, 100, 100, 10.0, 1),
      (1L, 100, 101, 79, 90, 10.0, 1),    // entry; TP at 80 -> +2R; re-signal
      (2L, 90, 91, 89, 90, 10.0, 0),      // entry executes immediately
      (3L, 90, 120, 89, 90, 10.0, 0))     // SL
    val win = Backtest.run(winBars, "signal", short = true, tpR = 2.0, slK = 1.0,
      horizon = 16, cooldownBars = 3).collect()
    assert(win.length == 2 && win(1).getAs[Long]("entry_ts") == 2L)
  }

  // (ts, o, h, l, c, atr, sig, mode) with per-mode config columns attached
  private def mkDual(rows: (Long, Double, Double, Double, Double, Double, Int, String)*) = {
    import org.apache.spark.sql.functions._
    rows.map { case (ts, o, h, l, c, atr, sig, m) => ("A", ts, o, h, l, c, atr, sig, m) }
      .toDF("symbol", "bar_ts_ms", "open", "high", "low", "close", "atr",
        "signal", "mode")
      .withColumn("tp_r", when(col("mode") === "TREND", 2.0).otherwise(1.2))
      .withColumn("sl_k", when(col("mode") === "TREND", 1.0).otherwise(0.8))
      .withColumn("horizon_bars", when(col("mode") === "TREND", 16).otherwise(2))
      .withColumn("be_at_r", when(col("mode") === "RANGE", 0.5)) // TREND: null
  }

  test("dual engine: entry row's mode picks the whole risk config") {
    // RANGE entry: risk = 0.8*10 = 8, TP at entry - 1.2*8 = 90.4, horizon 2
    val bars = mkDual(
      (0L, 100, 100, 100, 100, 10.0, 1, "RANGE"),
      (1L, 100, 101, 99, 100, 10.0, 0, "RANGE"),  // entry 100
      // close 95 arms BE (+0.625R >= 0.5) but high 99 stays under the moved
      // stop, so the TP touch wins this bar
      (2L, 99, 99, 90, 95, 10.0, 0, "RANGE"))     // low 90 <= 90.4 -> TP +1.2R
    val t = Backtest.runDualEngine(bars, "signal", "mode").collect()
    assert(t.length == 1)
    assert(t(0).getAs[String]("engine") == "RANGE")
    assert(t(0).getAs[String]("exit_reason") == "TP")
    assert(math.abs(t(0).getAs[Double]("exit_price") - 90.4) < 1e-9)
    assert(math.abs(t(0).getAs[Double]("r_mult") - 1.2) < 1e-12)
    // same path under TREND config never reaches its TP (80): RANGE horizon
    // would also differ — the short RANGE time stop fires at bar 2
    val trendBars = mkDual(
      (0L, 100, 100, 100, 100, 10.0, 1, "TREND"),
      (1L, 100, 101, 99, 100, 10.0, 0, "TREND"),
      (2L, 99, 99, 90, 95, 10.0, 0, "TREND"))
    val tt = Backtest.runDualEngine(trendBars, "signal", "mode").collect()
    assert(tt.isEmpty) // TREND: TP=80 not reached, horizon 16 > data
  }

  test("dual engine: break-even only for the engine that carries be_at_r") {
    // RANGE be_at_r=0.5: close +0.5R arms; retrace exits at entry, r=0
    val bars = mkDual(
      (0L, 100, 100, 100, 100, 10.0, 1, "RANGE"),
      (1L, 100, 99, 95, 96, 10.0, 0, "RANGE"),    // risk 8; close 96 -> +0.5R arm
      (2L, 97, 101, 96, 100, 10.0, 0, "RANGE"))   // high 101 >= 100 -> BE exit
    val t = Backtest.runDualEngine(bars, "signal", "mode").collect()
    assert(t.length == 1)
    assert(t(0).getAs[String]("exit_reason") == "SL")
    assert(t(0).getAs[Double]("r_mult") == 0.0)
    assert(t(0).getAs[Double]("exit_price") == 100.0)
  }

  test("dual engine: flip exit when the mode leaves the entry engine; NA blocks entry") {
    val bars = mkDual(
      (0L, 100, 100, 100, 100, 10.0, 1, "TREND"),
      (1L, 100, 101, 99, 98, 10.0, 0, "TREND"),   // entry 100 (TREND)
      (2L, 98, 99, 97, 97, 10.0, 0, "RANGE"),     // mode left TREND -> FLIP
      (3L, 97, 98, 96, 96, 10.0, 1, null),        // signal, but mode NA
      (4L, 96, 97, 95, 95, 10.0, 1, null),        // NA entry blocked; re-signal
      (5L, 95, 96, 94, 94, 10.0, 0, "RANGE"),     // mode back: entry executes
      (6L, 94, 120, 93, 94, 10.0, 0, "RANGE"))    // SL (risk 8 -> 103)
    val t = Backtest.runDualEngine(bars, "signal", "mode").collect()
    assert(t.length == 2)
    assert(t(0).getAs[String]("exit_reason") == "FLIP")
    assert(t(0).getAs[Long]("exit_ts") == 2L)
    assert(t(0).getAs[Double]("exit_price") == 97.0)
    // r = (100-97)/10 (TREND risk = 1.0*atr)
    assert(math.abs(t(0).getAs[Double]("r_mult") - 0.3) < 1e-12)
    assert(t(1).getAs[Long]("entry_ts") == 5L)
    assert(t(1).getAs[String]("engine") == "RANGE")
    assert(t(1).getAs[String]("exit_reason") == "SL")
  }
}
