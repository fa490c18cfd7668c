package graft

import org.apache.spark.sql.functions._

import graft.functions.Features
import graft.operators.{Ewm, EwmSpec}

class FeatureSpec extends SparkTestBase {
  import spark.implicits._

  private def barsFromCloses(closes: Seq[Double]) =
    closes.zipWithIndex.map { case (c, i) =>
      ("A", i * 60000L, c, c + 1.0, c - 1.0, c, 10.0)
    }.toDF("symbol", "bar_ts_ms", "open", "high", "low", "close", "volume")

  test("true range matches hand computation, null on first bar") {
    val df = barsFromCloses(Seq(10, 20, 15))
    val tr = Features.withTrueRange(df).orderBy("bar_ts_ms")
      .select("tr").collect().map(r => Option(r.get(0)))
    assert(tr(0).isEmpty)
    // bar1: h=21 l=19 prevC=10 -> max(2, 11, 9) = 11
    assert(tr(1).contains(11.0))
    // bar2: h=16 l=14 prevC=20 -> max(2, 4, 6) = 6
    assert(tr(2).contains(6.0))
  }

  test("ATR(2) is SMA of TR gated on 2 non-null TRs") {
    val df = barsFromCloses(Seq(10, 20, 15, 15))
    val atr = Features.withAtrSma(df, 2).orderBy("bar_ts_ms")
      .select("atr").collect().map(r => Option(r.get(0)))
    assert(atr(0).isEmpty && atr(1).isEmpty)
    assert(atr(2).contains((11.0 + 6.0) / 2))
    // bar3: h=16 l=14 prevC=15 -> max(2,1,1)=2; atr=(6+2)/2=4
    assert(atr(3).contains(4.0))
  }

  test("rolling stats gate on full window and match hand values") {
    val df = barsFromCloses(Seq(1, 2, 3, 4))
    val out = Features.withRollingStats(df, "close", 3).orderBy("bar_ts_ms").collect()
    assert(out(1).isNullAt(out(1).fieldIndex("roll_mean")))
    assert(out(2).getAs[Double]("roll_mean") == 2.0)
    assert(out(3).getAs[Double]("roll_mean") == 3.0)
    assert(out(3).getAs[Double]("roll_min") == 2.0)
    assert(out(3).getAs[Double]("roll_max") == 4.0)
  }

  test("EWM matches pandas adjust=False recursion with min_periods") {
    // pandas: s.ewm(alpha=0.5, adjust=False, min_periods=2).mean()
    // x = [2, 4, 8] -> y = [2, 3, 5.5]; first emitted at index 1
    val df = barsFromCloses(Seq(2, 4, 8))
    val out = Ewm(df, Seq(EwmSpec("e", "close", 0.5, 2)))
      .orderBy("bar_ts_ms").select("e").collect().map(r => Option(r.get(0)))
    assert(out(0).isEmpty)
    assert(out(1).contains(3.0))
    assert(out(2).contains(5.5))
  }

  test("EWM state resets between keys") {
    val df = (Seq(("A", 0L, 2.0), ("A", 60000L, 4.0), ("B", 0L, 100.0)))
      .toDF("symbol", "bar_ts_ms", "close")
    val out = Ewm(df, Seq(EwmSpec("e", "close", 0.5, 1)))
      .orderBy("symbol", "bar_ts_ms").select("e").as[Double].collect()
    assert(out.toSeq == Seq(2.0, 3.0, 100.0))
  }

  test("rolling percentile counts values <= current in full windows") {
    val df = barsFromCloses(Seq(5, 1, 3, 2))
    val out = Features.withRollingPercentile(df, "close", "p", 3)
      .orderBy("bar_ts_ms").select("p").collect().map(r => Option(r.get(0)))
    assert(out(0).isEmpty && out(1).isEmpty)
    // window [5,1,3]: 2 of 3 <= 3
    assert(out(2).contains(200.0 / 3))
    // window [1,3,2]: 2 of 3 <= 2
    assert(out(3).contains(200.0 / 3))
  }

  test("efficiency ratio is 1 for a perfectly trending series") {
    val df = barsFromCloses(Seq(1, 2, 3, 4, 5))
    val out = Features.withEfficiencyRatio(df, 3).orderBy("bar_ts_ms")
      .select("er").collect().map(r => Option(r.get(0)))
    assert(out(2).isEmpty) // only 2 diffs available
    assert(out(3).contains(1.0))
    assert(out(4).contains(1.0))
  }
}
