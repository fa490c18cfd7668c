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

  test("declarative window form equals the imperative SeqScan port on random streams") {
    val rnd = new scala.util.Random(42)
    val rows = for {
      sym <- Seq("A", "B", "C")
      i <- 0 until 400
    } yield {
      val roll = rnd.nextInt(4) // 0=bull, 1=bear, 2/3=quiet
      (sym, i.toLong, if (roll == 0) 1 else 0, if (roll == 1) 1 else 0)
    }
    val df = rows.toDF("symbol", "bar_ts_ms", "bull_sig", "bear_sig")
    for ((enterN, exitN) <- Seq((2, 3), (1, 1), (3, 5))) {
      val a = StickyState(df, enterN, exitN)
        .select("symbol", "bar_ts_ms", "dir_state", "dir_regime_id", "dir_state_age")
      val b = StickyState.seqScan(df, enterN, exitN)
        .select("symbol", "bar_ts_ms", "dir_state", "dir_regime_id", "dir_state_age")
      assert(a.exceptAll(b).count() === 0L && b.exceptAll(a).count() === 0L,
        s"divergence at enterN=$enterN exitN=$exitN")
    }
  }
}
