package graft

import graft.operators.StickyState

class StickyStateSpec extends SparkTestBase {
  import spark.implicits._

  private def run(sigs: Seq[(Int, Int)], enterN: Int = 2, exitN: Int = 3) = {
    val df = sigs.zipWithIndex.map { case ((b, r), i) => ("A", i.toLong, b, r) }
      .toDF("symbol", "bar_ts_ms", "bull_sig", "bear_sig")
    StickyState(df, enterN, exitN).orderBy("bar_ts_ms")
      .select("dir_state", "dir_regime_id", "dir_state_age")
      .as[(String, Long, Int)].collect().toSeq
  }

  test("enter after N consecutive signals; age and regime id track changes") {
    val out = run(Seq((1, 0), (1, 0), (1, 0), (0, 0), (0, 0)))
    assert(out.map(_._1) == Seq("NEUTRAL", "BULL", "BULL", "BULL", "BULL"))
    assert(out(1)._2 == 1L && out(1)._3 == 1) // new regime, age resets
    assert(out(4)._3 == 4)
  }

  test("direct BULL to BEAR flip without passing through NEUTRAL") {
    val out = run(Seq((1, 0), (1, 0), (0, 1), (0, 1)))
    assert(out.map(_._1) == Seq("NEUTRAL", "BULL", "BULL", "BEAR"))
    assert(out(3)._2 == 2L)
  }

  test("decays to NEUTRAL only after exitN quiet bars") {
    val out = run(Seq((1, 0), (1, 0), (0, 0), (0, 0), (0, 0)))
    assert(out.map(_._1) == Seq("NEUTRAL", "BULL", "BULL", "BULL", "NEUTRAL"))
  }

  test("single-signal blips never enter a regime") {
    val out = run(Seq((1, 0), (0, 1), (1, 0), (0, 0)))
    assert(out.map(_._1).forall(_ == "NEUTRAL"))
  }
}
