package graft

import org.apache.spark.sql.functions._

import graft.ml.{MlFilter, RegimeEval}
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

  test("regime eval: period frame takes OHLC + last feature per period") {
    val hour = 3600000L
    // two days of hour bars; feature value = hour index so "last" is obvious
    val bars = (0 until 48).map { i =>
      ("A", new java.sql.Timestamp(i * hour), 10.0 + i, 20.0 + i, 5.0 + i,
        15.0 + i, 1.0, 1L, i.toDouble)
    }.toDF("symbol", "bar_ts", "open", "high", "low", "close", "volume",
      "n_trades", "feat")
    val f = RegimeEval.periodFrame(bars, "day", Seq("feat"))
      .orderBy("period_ms").collect()
    assert(f.length == 2)
    assert(f(0).getAs[Double]("open") == 10.0)   // first hour's open
    assert(f(0).getAs[Double]("high") == 43.0)   // max over hours 0..23
    assert(f(0).getAs[Double]("low") == 5.0)
    assert(f(0).getAs[Double]("close") == 38.0)  // last hour's close
    assert(f(0).getAs[Double]("feat") == 23.0)   // LAST feature, not max/avg
    assert(f(1).getAs[Double]("feat") == 47.0)
  }

  test("regime eval: last feature per period skips nulls (pandas .last semantics)") {
    val hour = 3600000L
    // day 0: feature defined only on hours 0..19 (null at the period end —
    // the warm-up-null shape a rolling feature has on its first day);
    // day 1: feature null on EVERY bar
    val bars = (0 until 48).map { i =>
      val feat: java.lang.Double =
        if (i < 20) java.lang.Double.valueOf(i.toDouble) else null
      ("A", new java.sql.Timestamp(i * hour), 10.0, 20.0, 5.0, 15.0, 1.0, 1L,
        feat)
    }.toDF("symbol", "bar_ts", "open", "high", "low", "close", "volume",
      "n_trades", "feat")
    val f = RegimeEval.periodFrame(bars, "day", Seq("feat"))
      .orderBy("period_ms").collect()
    assert(f(0).getAs[Double]("feat") == 19.0)   // last NON-NULL, not null
    assert(f(1).isNullAt(f(1).fieldIndex("feat"))) // all-null stays null
  }

  test("regime eval: week grain truncates to Mondays and keeps frame semantics") {
    val hour = 3600000L
    val jan1 = 1704067200000L // 2024-01-01T00:00Z, a Monday
    // two ISO weeks of hour bars
    val bars = (0 until 336).map { i =>
      ("A", new java.sql.Timestamp(jan1 + i * hour), 10.0 + i, 20.0 + i,
        5.0 + i, 15.0 + i, 1.0, 1L, i.toDouble)
    }.toDF("symbol", "bar_ts", "open", "high", "low", "close", "volume",
      "n_trades", "feat")
    val f = RegimeEval.periodFrame(bars, "week", Seq("feat"))
      .orderBy("period_ms").collect()
    assert(f.length == 2)
    assert(f(0).getAs[Long]("period_ms") == jan1)
    assert(f(1).getAs[Long]("period_ms") == jan1 + 168L * hour)
    assert(f(0).getAs[Double]("open") == 10.0)
    assert(f(0).getAs[Double]("high") == 20.0 + 167)
    assert(f(0).getAs[Double]("close") == 15.0 + 167)
    assert(f(0).getAs[Double]("feat") == 167.0)
    assert(f(1).getAs[Double]("feat") == 335.0)
  }

  test("regime eval learns a separable 3-class regime and reports macro-F1") {
    val day = 86400000L
    // deterministic regime cycle (period i%4): up / range / down / range —
    // feature x at t fixes the next period's return. Exactly HALF the
    // periods are range with |ret| <= 0.004 and half are trends with
    // |ret| >= 0.3, so the q=0.5 train threshold interpolates strictly
    // BETWEEN the two blocks: labels are perfectly consistent with x.
    val rets = (0 until 90).map { i =>
      i % 4 match {
        case 0 => 0.3 + 0.01 * (i % 5)    // up-trend periods
        case 2 => -(0.3 + 0.01 * (i % 7)) // down-trend periods
        case _ => 0.002 * (i % 3)         // range periods
      }
    }
    var close = 100.0
    val rows = (0 until 90).map { i =>
      val r = (i.toLong * day, close, (i % 4) match {
        case 0 => 1.0
        case 2 => -1.0
        case _ => 0.0
      })
      close *= (1.0 + rets(i))
      ("A", r._1, r._2, r._3)
    }
    val frame = rows.toDF("symbol", "period_ms", "close", "x")
    val out = RegimeEval.evaluate(frame, Seq("x"), horizon = 1,
      trendQuantile = 0.5, trainEndMs = 60 * day, valEndMs = 75 * day)
      .orderBy("set_name").collect()
    assert(out.map(_.getAs[String]("set_name")).toSeq ==
      Seq("TEST", "TRAIN", "VAL"))
    val train = out(1)
    assert(train.getAs[Long]("n_samples") == 60L)
    // all three classes present and the separable rule is learned
    assert(train.getAs[Long]("n_range") > 0 &&
      train.getAs[Long]("n_trend_up") > 0 &&
      train.getAs[Long]("n_trend_down") > 0)
    assert(train.getAs[Double]("accuracy") > 0.9, train.toString)
    assert(train.getAs[Double]("macro_f1") > 0.9, train.toString)
    val test_ = out(0)
    assert(test_.getAs[Double]("macro_f1") > 0.9, test_.toString)

    // an empty TRAIN slice fails loudly (the reference raises too) instead
    // of silently labeling everything RANGE off a null threshold
    val e = intercept[IllegalArgumentException] {
      RegimeEval.evaluate(frame, Seq("x"), horizon = 1,
        trendQuantile = 0.5, trainEndMs = 0L, valEndMs = 75 * day)
    }
    assert(e.getMessage.contains("TRAIN slice empty"))
  }
}
