package graft

import org.apache.spark.sql.functions._

import graft.ml.MlFilter
import graft.operators.{FlatLevels, VolRegime}

class MlVolFlatSpec extends SparkTestBase {
  import spark.implicits._

  test("flat levels: run-length encoding finds plateaus >= min bars") {
    val bars = Seq(
      ("A", 0L, 5.0), ("A", 1L, 5.0), ("A", 2L, 5.0),   // plateau of 3
      ("A", 3L, 6.0), ("A", 4L, 6.0),                    // plateau of 2 (dropped)
      ("A", 5L, 7.0), ("A", 6L, 7.0), ("A", 7L, 7.0), ("A", 8L, 7.0))
      .toDF("symbol", "bar_ts_ms", "line")
    val out = FlatLevels(bars, "line", minFlatBars = 3)
      .orderBy("start_ms").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Double]("level") == 5.0 && out(0).getAs[Long]("length_bars") == 3L)
    assert(out(1).getAs[Double]("level") == 7.0 && out(1).getAs[Long]("length_bars") == 4L)
    assert(out(1).getAs[Long]("start_ms") == 5L && out(1).getAs[Long]("end_ms") == 8L)
  }

  test("vol regime: percentile thresholds label LOW/MID/HIGH") {
    // ranges ramp linearly -> latest bar is always at the top percentile
    val bars = (0 until 60).map { i =>
      ("A", i.toLong, 100.0, 100.0 + (i + 1) * 0.1, 100.0, 100.0)
    }.toDF("symbol", "bar_ts_ms", "open", "high", "low", "close")
    val out = VolRegime(bars, lookback = 48).orderBy("bar_ts_ms").collect()
    assert(out.take(47).forall(_.isNullAt(out(0).fieldIndex("vol_state"))))
    val warm = out.drop(47)
    assert(warm.forall(_.getAs[String]("vol_state") == "HIGH"))
    assert(warm.forall(_.getAs[Int]("market_ready") == 1))
  }

  test("ml filter learns a separable rule and reports a sane confusion matrix") {
    // label == next bar up exactly when feature f > 0
    val rows = (0 until 400).map { i =>
      val up = i % 2 == 0
      // close alternates so that close[i+1] > close[i] iff i even
      val close = if (up) 10.0 else 20.0
      ("A", i.toLong, close, if (up) 1.0 else -1.0)
    }
    val df = rows.toDF("symbol", "bar_ts_ms", "close", "f")
    val scored = MlFilter.trainScore(MlFilter.withLabel(df), Seq("f"))
    val conf = MlFilter.confusion(scored).collect()(0)
    assert(conf.getAs[Double]("accuracy") > 0.95, conf.toString)
    assert(conf.getAs[Long]("tp") + conf.getAs[Long]("tn") +
      conf.getAs[Long]("fp") + conf.getAs[Long]("fn") == conf.getAs[Long]("n"))
  }

  test("gbt filter learns the same separable rule behind the same interface") {
    // the reference's run_ml_m5/m15 family uses tree models; same contract
    val rows = (0 until 400).map { i =>
      val up = i % 2 == 0
      val close = if (up) 10.0 else 20.0
      ("A", i.toLong, close, if (up) 1.0 else -1.0)
    }
    val df = rows.toDF("symbol", "bar_ts_ms", "close", "f")
    val scored = MlFilter.trainScore(MlFilter.withLabel(df), Seq("f"),
      classifier = "gbt")
    assert(scored.columns.contains("probability_up") &&
      scored.columns.contains("prediction"))
    val conf = MlFilter.confusion(scored).collect()(0)
    assert(conf.getAs[Double]("accuracy") > 0.95, conf.toString)
    // unknown classifier names fail loudly
    intercept[IllegalArgumentException] {
      MlFilter.trainScore(MlFilter.withLabel(df), Seq("f"), classifier = "svm")
    }
  }
}
