package graft

import graft.operators.Funding

class FundingSpec extends SparkTestBase {
  import spark.implicits._

  test("settlement rates and anti-lookahead accrual onto bars") {
    // two 8h windows of hour bars with +1% and -2% mean bar returns
    val bars = (0 until 16).map { i =>
      val ret = if (i < 8) 0.01 else -0.02
      ("A", i * 3600000L, 100.0, 101.0, 99.0, 100.0 * (1 + ret))
    }.toDF("symbol", "bar_ts_ms", "open", "high", "low", "close")
    val rates = Funding.ratesFromBars(bars).orderBy("bucket_ms").collect()
    assert(rates.length == 2)
    assert(math.abs(rates(0).getAs[Double]("rate") - 0.01) < 1e-12)
    assert(rates(0).getAs[Long]("pay_ms") == 8 * 3600000L)

    val accrued = Funding.accrueOntoBars(bars, Funding.ratesFromBars(bars))
      .orderBy("bar_ts_ms").collect()
    // bars inside the first settlement window know NO funding yet
    accrued.take(8).foreach { r =>
      assert(r.getAs[Double]("cum_funding") == 0.0)
      assert(r.isNullAt(r.fieldIndex("last_pay_ms")))
    }
    // bars in the second window carry exactly the first window's rate
    accrued.drop(8).foreach { r =>
      assert(math.abs(r.getAs[Double]("cum_funding") - 0.01) < 1e-12)
      assert(r.getAs[Long]("last_pay_ms") == 8 * 3600000L)
    }
  }
}
