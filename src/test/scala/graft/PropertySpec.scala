package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.{AsOf, Canonical, Gaps, TfAggregate}

/** Randomized properties: each operator vs an in-memory brute-force
  * reference over seeded random inputs (deterministic across runs). */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new Random(20260812L)

  test("property: tf aggregation emits exactly the complete buckets") {
    for (_ <- 1 to 5) {
      val step = 60000L
      val n = 1 + rnd.nextInt(4)
      val present = (0 until 120).filter(_ => rnd.nextDouble() < 0.6)
      val bars = present.map(i => ("S", i * step, 1.0, 2.0, 0.5, 1.5, 1.0, 1L))
        .toDF("symbol", "bar_ts_ms", "open", "high", "low", "close", "volume", "n_trades")
      val got = TfAggregate(bars, step, n).select("bucket_ms")
        .as[Long].collect().toSet
      val expected = present.map(_.toLong).groupBy(i => i / n)
        .filter { case (_, is) => is.size == n }
        .keySet.map(_ * n * step)
      assert(got == expected, s"n=$n present=$present")
    }
  }

  test("property: asof backward matches the max right ts <= left ts") {
    for (_ <- 1 to 5) {
      val leftTs = Seq.fill(30)(rnd.nextInt(1000).toLong).distinct
      val rightTs = Seq.fill(10)(rnd.nextInt(1000).toLong).distinct
      val left = leftTs.map(t => ("K", t)).toDF("symbol", "ts")
      val right = rightTs.map(t => ("K", t, t * 2.0)).toDF("symbol", "rts", "payload")
      val got = AsOf.joinBackward(left, right, "symbol", "ts", "rts")
        .select("ts", "matched_ts").as[(Long, Option[Long])]
        .collect().toMap
      leftTs.foreach { t =>
        val expected = rightTs.filter(_ <= t) match {
          case Nil => None
          case xs  => Some(xs.max)
        }
        assert(got(t) == expected, s"left=$t right=$rightTs")
      }
    }
  }

  test("property: dedup keep-last returns the max-ord row per key") {
    for (_ <- 1 to 5) {
      val rows = Seq.fill(50)((rnd.nextInt(8).toString, rnd.nextInt(1000).toLong))
        .distinctBy(_._2)
      val df = rows.toDF("k", "ord")
      val got = Canonical.dedupKeepLast(df, Seq("k"), col("ord"))
        .select("k", "ord").as[(String, Long)].collect().toMap
      val expected = rows.groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).max }
      assert(got == expected)
    }
  }

  test("property: gap report totals agree with the integrity missing count") {
    for (_ <- 1 to 5) {
      val step = 60000L
      val present = (0 until 200).filter(_ => rnd.nextDouble() < 0.5)
      if (present.size >= 2) {
        val bars = present.map(i => ("S", i * step)).toDF("symbol", "bar_ts_ms")
        val gapsTotal = Gaps.gapsReport(bars, step)
          .agg(coalesce(sum("n_missing"), lit(0L))).as[Long].collect()(0)
        val expectedMissing = (present.max - present.min + 1) - present.size
        assert(gapsTotal == expectedMissing.toLong, s"present=$present")
      }
    }
  }
}
