package graft

import org.apache.spark.sql.functions._

import graft.functions.Salting
import graft.operators.Backtest

class ExtSaltLongSpec extends SparkTestBase {
  import spark.implicits._

  test("cosine_sim is available from SQL via spark.sql.extensions") {
    // GraftSession sets spark.sql.extensions=graft.GraftExtensions, so the
    // function resolves with no per-session registration call
    val out = Seq((Array(1.0, 0.0), Array(1.0, 0.0)))
      .toDF("a", "b")
      .selectExpr("cosine_sim(a, b) AS c")
      .as[Double].collect()
    assert(out.toSeq == Seq(1.0))
  }

  test("salted aggregation equals plain aggregation") {
    val df = (1 to 1000).map(i => ("hot", i.toLong, i.toDouble)).toDF("k", "ord", "v")
      .unionByName(Seq(("cold", 1L, 5.0)).toDF("k", "ord", "v"))
    val salted = Salting.saltedSumCount(df, Seq("k"), "v", "ord", salts = 8)
      .orderBy("k").collect()
    assert(salted(0).getAs[Double]("sum_v") == 5.0)       // cold
    assert(salted(1).getAs[Double]("sum_v") == 500500.0)  // hot
    assert(salted(1).getAs[Long]("cnt") == 1000L)
    // phase-1 spreads the hot key across salt partitions
    val p = Salting.saltedSumCount(df, Seq("k"), "v", "ord", 8)
      .queryExecution.executedPlan.toString
    assert(p.contains("_salt") || p.contains("HashAggregate"), p)
  }

  test("salted distinct count equals plain distinct count") {
    // hot key: 1000 values, each appearing 3x; cold key: 2 values. The salt
    // comes from hash(value), so every distinct value lands in exactly one
    // (key, salt) group and per-group set sizes are additive.
    val rows = (1 to 1000).flatMap(i =>
      Seq.fill(3)(("hot", (i % 400).toLong))) ++ Seq(("cold", 1L), ("cold", 2L))
    val df = rows.toDF("k", "v")
    val salted = Salting.saltedDistinctCount(df, Seq("k"), "v", salts = 8)
      .orderBy("k").collect()
    assert(salted(0).getAs[Long]("n_distinct_v") == 2L)
    assert(salted(1).getAs[Long]("n_distinct_v") == 400L)
    val plain = df.groupBy("k").agg(countDistinct(col("v")).as("d"))
      .orderBy("k").collect().map(_.getLong(1)).toSeq
    assert(plain == Seq(2L, 400L))
  }

  test("long-side backtest mirrors exits and applies fees") {
    val bars = Seq(
      ("A", 0L, 100.0, 100.0, 100.0, 100.0, 5.0, 1),
      ("A", 1L, 100.0, 101.0, 99.0, 100.0, 5.0, 0),   // entry long @100, SL 95, TP 110
      ("A", 2L, 100.0, 111.0, 99.0, 108.0, 5.0, 0))   // high 111 >= 110 -> TP
      .toDF("symbol", "bar_ts_ms", "open", "high", "low", "close", "atr", "signal")
    val t = Backtest.runLong(bars, "signal", tpR = 2.0, feeBps = 10.0).collect()
    assert(t.length == 1)
    assert(t(0).getAs[String]("exit_reason") == "TP")
    // r = 2.0 minus round-trip fees: 2 * 10bps * 100 / 5 = 0.04
    assert(math.abs(t(0).getAs[Double]("r_mult") - 1.96) < 1e-12)
  }
}
