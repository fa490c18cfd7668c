package graft

import graft.operators.Gaps

class GapsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val present = Seq(
    ("A", 0L), ("A", 60000L), ("A", 240000L), ("A", 300000L), ("A", 600000L),
    ("B", 0L), ("B", 60000L)
  ).toDF("symbol", "bar_ts_ms")

  test("gapsReport finds contiguous missing ranges per symbol") {
    val gaps = Gaps.gapsReport(present, 60000L).orderBy("symbol", "gap_start_ms").collect()
    assert(gaps.length == 2)
    assert(gaps(0).getAs[Long]("gap_start_ms") == 120000L)
    assert(gaps(0).getAs[Long]("gap_end_ms") == 180000L)
    assert(gaps(0).getAs[Long]("n_missing") == 2L)
    assert(gaps(1).getAs[Long]("gap_start_ms") == 360000L)
    assert(gaps(1).getAs[Long]("n_missing") == 4L)
  }

  test("backfillPlan explodes exactly the missing grid points") {
    val plan = Gaps.backfillPlan(Gaps.gapsReport(present, 60000L), 60000L)
    val missing = plan.orderBy("missing_ms").select("missing_ms").as[Long].collect().toSeq
    assert(missing == Seq(120000L, 180000L, 360000L, 420000L, 480000L, 540000L))
  }

  test("integrityCheck counts dups, missing and monotonicity violations") {
    val rows = Seq(
      ("A", 0L, 1L), ("A", 60000L, 2L), ("A", 60000L, 3L), // dup minute
      ("A", 240000L, 4L), ("A", 120000L, 5L) // out of order vs event id
    ).toDF("symbol", "ts_ms", "event_id")
    val r = Gaps.integrityCheck(rows, 60000L).collect()(0)
    assert(r.getAs[Long]("n_rows") == 5L)
    assert(r.getAs[Long]("n_distinct") == 4L)
    assert(r.getAs[Long]("n_dups") == 1L)
    assert(r.getAs[Long]("expected_rows") == 5L)
    assert(r.getAs[Long]("n_missing") == 1L)
    assert(r.getAs[Long]("n_non_monotonic") == 1L)
  }

  test("lastRow picks max ord per symbol") {
    val rows = Seq(("A", 0L, 1L, 5.0), ("A", 60000L, 2L, 7.0), ("B", 0L, 9L, 1.0))
      .toDF("symbol", "ts_ms", "event_id", "value")
    val out = Gaps.lastRow(rows).orderBy("symbol").collect()
    assert(out(0).getAs[Long]("last_event_id") == 2L)
    assert(out(0).getAs[Double]("last_value") == 7.0)
    assert(out(0).getAs[Long]("last_ms") == 60000L)
  }
}
