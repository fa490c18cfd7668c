package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ichimoku, IchimokuParams, Regime, RegimeParams}

class IchimokuRegimeSpec extends SparkTestBase {
  import spark.implicits._

  private def trendBars(n: Int, slope: Double) =
    (0 until n).map { i =>
      val c = 100.0 + slope * i
      ("A", i * 3600000L, c, c + 0.5, c - 0.5, c, 10.0)
    }.toDF("symbol", "bar_ts_ms", "open", "high", "low", "close", "volume")

  test("ichimoku: zero scores and NEUTRE before warmup, LONG on steady uptrend") {
    val p = IchimokuParams(tenkanLen = 3, kijunLen = 5, senkouBLen = 8, disp = 4)
    val out = Ichimoku(trendBars(40, 1.0), p).orderBy("bar_ts_ms").collect()
    val warm = p.warmupBars // 12
    out.take(warm).foreach { r =>
      assert(r.getAs[Int]("bull_score") == 0)
      assert(r.getAs[String]("label") == "NEUTRE")
    }
    val late = out.drop(warm + 2)
    assert(late.nonEmpty)
    late.foreach { r =>
      assert(r.getAs[String]("label") == "LONG", r.toString)
      assert(r.getAs[Int]("bull_score") >= 3)
    }
  }

  test("ichimoku: steady downtrend goes SHORT") {
    val p = IchimokuParams(tenkanLen = 3, kijunLen = 5, senkouBLen = 8, disp = 4)
    val out = Ichimoku(trendBars(40, -1.0), p).orderBy("bar_ts_ms").collect()
    assert(out.drop(p.warmupBars + 2).forall(_.getAs[String]("label") == "SHORT"))
  }

  test("MTF ichimoku consensus goes LONG when both timeframes agree") {
    val p = IchimokuParams(tenkanLen = 3, kijunLen = 5, senkouBLen = 8, disp = 4)
    val out = graft.operators.IchimokuMtf(
        trendBars(200, 1.0).withColumn("volume", lit(1.0))
          .withColumn("n_trades", lit(1L)),
        stepMs = 3600000L, coarseMult = 4, p)
      .orderBy("bar_ts_ms").collect()
    // late bars: base fully bullish (4-0) and lagged coarse fully bullish
    // -> mtf = 4*1 + 4*2 = 12, consensus LONG
    val late = out.drop(150)
    assert(late.nonEmpty)
    late.foreach { r =>
      assert(r.getAs[String]("mtf_label") == "LONG", r.toString)
      assert(r.getAs[Int]("mtf_score") == 12)
    }
    // warmup bars stay NEUTRE (scores forced to zero)
    assert(out.take(10).forall(_.getAs[String]("mtf_label") == "NEUTRE"))
  }

  test("regime router labels a clean trend as TREND once warm") {
    val out = Regime.router(trendBars(260, 1.0), RegimeParams())
      .orderBy("bar_ts_ms").collect()
    val warm = out.drop(210)
    assert(warm.nonEmpty)
    // perfectly monotone closes: er = 1, alignment bull
    warm.foreach { r =>
      assert(r.getAs[Int]("aligned_bull") == 1)
      assert(r.getAs[String]("regime") == "TREND", r.toString)
      assert(r.getAs[String]("router_mode") == "TREND")
    }
  }

  test("regime router: flat noise-free series falls back to RANGE") {
    val flat = (0 until 260).map { i =>
      val c = 100.0 + (if (i % 2 == 0) 0.5 else -0.5)
      ("A", i * 3600000L, c, c + 0.1, c - 0.1, c, 10.0)
    }.toDF("symbol", "bar_ts_ms", "open", "high", "low", "close", "volume")
    val out = Regime.router(flat, RegimeParams()).orderBy("bar_ts_ms").collect()
    val warm = out.drop(210)
    assert(warm.forall(r => r.getAs[String]("regime") != "TREND"))
  }
}
