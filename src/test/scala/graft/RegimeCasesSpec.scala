package graft

import graft.operators.RegimeCases

/** Unit coverage of the regime-case cascade with injected direction votes —
  * in particular the breakout → fake-breakout chains, which need verdict
  * sequences the synthetic corpus never produces. */
class RegimeCasesSpec extends SparkTestBase {
  import spark.implicits._

  // rows: (ts, label_h1, score_h1, d_h4, d_d1)
  private def run(rows: (Long, String, Int, Integer, Integer)*): Seq[(Long, String, Double)] =
    RegimeCases.classify(
      rows.map { case (ts, l, s, h4, d1) => ("A", ts, l, s, h4, d1) }
        .toDF("symbol", "bar_ts_ms", "label_h1", "score_h1", "d_h4", "d_d1"))
      .orderBy("bar_ts_ms")
      .select("bar_ts_ms", "regime_case", "size_mult")
      .as[(Long, String, Double)].collect().toSeq

  private val i0: Integer = 0
  private val i1: Integer = 1
  private val im1: Integer = -1

  test("per-row branches: warmup, data gap, conflict, opposition, trend, pullback") {
    val out = run(
      (0L, "NEUTRE", 0, i0, i0),    // WARMUP_UNDEFINED
      (1L, "NEUTRE", 2, null, i0),  // DATA_GAP_OR_INVALID (null d_h4)
      (2L, "LONG", 4, im1, i1),     // CHAOS_CONFLICT_TF (d1*h4 = -1)
      (3L, "SHORT", 4, i1, i1),     // MACRO_BULL_MICRO_BEAR
      (4L, "LONG", 4, i1, i1),      // TREND_CONTINUATION_LONG (score 7)
      (5L, "SHORT", 4, i0, i1),     // PULLBACK_LONG_IN_BULL_TREND? no —
                                    // d_d1=1, d_h1=-1 hits MACRO_BULL_MICRO_BEAR first
      (6L, "NEUTRE", 4, i0, i0))    // score 0 -> RANGE_NEUTRAL
    assert(out(0)._2 == "WARMUP_UNDEFINED" && out(0)._3 == 0.0)
    assert(out(1)._2 == "DATA_GAP_OR_INVALID" && out(1)._3 == 0.0)
    assert(out(2)._2 == "CHAOS_CONFLICT_TF" && out(2)._3 == 0.0)
    assert(out(3)._2 == "MACRO_BULL_MICRO_BEAR")
    assert(out(4)._2 == "TREND_CONTINUATION_LONG" && out(4)._3 == 0.75) // |7|
    assert(out(5)._2 == "MACRO_BULL_MICRO_BEAR")
    assert(out(6)._2 == "RANGE_NEUTRAL" && out(6)._3 == 0.25)
  }

  test("breakout fires out of RANGE_NEUTRAL; fake-breakout follows a failed one") {
    val out = run(
      (0L, "NEUTRE", 4, i0, i0),   // RANGE_NEUTRAL (score 0)
      (1L, "LONG", 4, i1, i1),     // TC_LONG conditions + prev RANGE -> BREAKOUT_UP
      (2L, "NEUTRE", 4, i1, i0),   // falls through to LOW_CONFIDENCE? score 2 -> |2|<3
                                   // and d_d1=0 -> RANGE_NEUTRAL actually
      (3L, "NEUTRE", 4, i1, i1))   // score 5, no macro rule (d_h1=0) -> LOW_CONFIDENCE
    assert(out(0)._2 == "RANGE_NEUTRAL")
    assert(out(1)._2 == "BREAKOUT_UP_FROM_RANGE")
    assert(out(2)._2 == "RANGE_NEUTRAL")
    assert(out(3)._2 == "LOW_CONFIDENCE_NEUTRAL")
  }

  test("fake-breakout: breakout then micro turns against with low-confidence base") {
    val out = run(
      (0L, "NEUTRE", 4, i0, i0),   // RANGE_NEUTRAL
      (1L, "LONG", 4, i1, i1),     // BREAKOUT_UP_FROM_RANGE
      (2L, "NEUTRE", 4, i1, i1))   // base: d_h1=0, score 5 -> LOW_CONFIDENCE,
                                   // lag1=TC_LONG(base), lag2=RANGE_NEUTRAL,
                                   // d_h1 <= 0 -> FAKE_BREAKOUT_UP
    assert(out(1)._2 == "BREAKOUT_UP_FROM_RANGE")
    assert(out(2)._2 == "FAKE_BREAKOUT_UP")
  }

  test("size tiers follow |confluence score|") {
    // d_d1=1,d_h4=1,d_h1=1 -> score 7 -> 0.75 ; d_d1=1,h4=0,h1=1 -> 5 -> 0.5
    val out = run(
      (0L, "LONG", 4, i1, i1),
      (1L, "LONG", 4, i0, i1))
    assert(out(0)._3 == 0.75)
    assert(out(1)._3 == 0.5)
  }
}
