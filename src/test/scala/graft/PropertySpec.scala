package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.{AsOf, Canonical, Gaps, Sessions, TfAggregate}

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

  test("property: sessionize matches a sequential fold reference") {
    import java.sql.Timestamp
    for (_ <- 1 to 5) {
      val gap = 1000L
      val events = Seq.fill(60)(
        (rnd.nextInt(3).toLong, rnd.nextInt(20000).toLong * 1L, rnd.nextDouble()))
        .distinctBy(e => (e._1, e._2))
      val df = events.map { case (u, t, v) => (u, new Timestamp(t), v) }
        .toDF("user_id", "ts", "value")
      val got = Sessions.sessionize(df, "user_id", "ts", "value", gap)
        .select("user_id", "session_id", "session_start_ms", "session_end_ms", "n_events")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      // reference: sort per user, break when diff > gap
      val expected = events.groupBy(_._1).flatMap { case (u, es) =>
        val ts = es.map(_._2).sorted
        val sessions = ts.foldLeft(List.empty[List[Long]]) {
          case (acc, t) if acc.nonEmpty && t - acc.head.head <= gap =>
            (t :: acc.head) :: acc.tail
          case (acc, t) => List(t) :: acc
        }.reverse.map(_.reverse)
        sessions.zipWithIndex.map { case (s, i) =>
          (u, (i + 1).toLong, s.head, s.last, s.size.toLong)
        }
      }.toSet
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

  test("property: connected components match a sequential union-find") {
    for (trial <- 1 to 3) {
      val nV = 20 + rnd.nextInt(30)
      val vertexIds = (0 until nV).map(_.toLong)
      val nE = rnd.nextInt(nV)
      val edgeList = Seq.fill(nE) {
        val a = rnd.nextInt(nV).toLong; val b = rnd.nextInt(nV).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct

      // brute-force union-find with path compression
      val parent = scala.collection.mutable.Map(vertexIds.map(v => v -> v): _*)
      def find(x: Long): Long = {
        if (parent(x) != x) parent(x) = find(parent(x)); parent(x)
      }
      edgeList.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = vertexIds.map(v => v -> find(v)).toMap

      val got = graft.llm.Cluster.connectedComponents(
          vertexIds.toDF("id"),
          edgeList.toDF("id1", "id2"))
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster_id"))
        .toMap
      assert(got == expected, s"trial=$trial edges=$edgeList")
    }
  }

  test("property: shard packing matches a sequential per-shard fold") {
    for (trial <- 1 to 5) {
      val budget = 8L + rnd.nextInt(40)
      val nShards = 1 + rnd.nextInt(4)
      val docs = (0 until 80).map { i =>
        val n = 1 + rnd.nextInt(20)
        (i.toLong, (1 to n).map(t => s"w$t").mkString(" "))
      }
      val got = graft.llm.TextAnalysis.packShards(
          docs.toDF("doc_id", "text"), budget, nShards)
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Int]("shard"), r.getAs[Long]("cum_tokens"),
            r.getAs[Long]("pack_id")))
        .toMap
      // sequential reference: per-shard prefix sums in doc_id order
      val expected = docs
        .map { case (id, text) => (id, text.split("\\s+").length.toLong) }
        .groupBy { case (id, _) => (id % nShards).toInt }
        .flatMap { case (shard, ds) =>
          var cum = 0L
          ds.sortBy(_._1).map { case (id, n) =>
            val before = cum; cum += n
            id -> (shard, cum, before / budget)
          }
        }
      assert(got == expected, s"trial=$trial budget=$budget shards=$nShards")
    }
  }

  test("property: fixed-config run() and constant-mode runDualEngine agree") {
    // since round 8 both engines fold the SAME dualStep transition, so this
    // property pins the Row→DualBar adaptation layers (global-config vs
    // per-row-config columns): with a constant mode and constant config
    // columns they must emit identical trade sets on random walks
    import org.apache.spark.sql.functions._
    import graft.operators.Backtest
    import spark.implicits._
    for (trial <- 1 to 5) {
      val tpR = Seq(1.2, 2.0, 3.0)(rnd.nextInt(3))
      val slK = Seq(0.5, 1.0, 1.5)(rnd.nextInt(3))
      val hz = Seq(4, 8, 16)(rnd.nextInt(3))
      val beAtR = if (rnd.nextBoolean()) Some(0.4 + rnd.nextDouble() * 0.4) else None
      val cd = rnd.nextInt(4)
      val rows = (0 until 300).map { i =>
        val base = 100.0 + 15.0 * math.sin(i * (0.1 + 0.2 * rnd.nextDouble())) +
          rnd.nextGaussian() * 3.0
        val spread = 1.0 + rnd.nextDouble() * 4.0
        ("S" + (i % 3), i.toLong, base, base + spread, base - spread,
          base + rnd.nextGaussian() * spread / 2,
          2.0 + rnd.nextDouble() * 3.0, if (rnd.nextInt(5) == 0) 1 else 0)
      }
      val bars = rows.toDF("symbol", "bar_ts_ms", "open", "high", "low",
        "close", "atr", "signal")
      val plain = Backtest.run(bars, "signal", short = true, tpR = tpR,
          slK = slK, horizon = hz, breakEvenAtR = beAtR, cooldownBars = cd)
        .collect().map(_.toSeq).toSet
      val dual = Backtest.runDualEngine(
          bars.withColumn("mode", lit("ONLY"))
            .withColumn("tp_r", lit(tpR)).withColumn("sl_k", lit(slK))
            .withColumn("horizon_bars", lit(hz))
            .withColumn("be_at_r", beAtR.map(lit).getOrElse(lit(null).cast("double"))),
          "signal", "mode", cooldownBars = cd)
        .drop("engine")
        .select("symbol", "entry_ts", "entry_price", "exit_ts", "exit_price",
          "exit_reason", "r_mult", "bars_held")
        .collect().map(_.toSeq).toSet
      assert(plain == dual,
        s"trial=$trial tpR=$tpR slK=$slK hz=$hz be=$beAtR cd=$cd " +
          s"plain-only=${plain -- dual} dual-only=${dual -- plain}")
    }
  }

  test("property: dualStep invariants on random walks (pure fold, no Spark)") {
    import graft.operators.Backtest
    import graft.operators.Backtest.{DualBar, DualState, DualTrade}
    for (trial <- 1 to 50) {
      val cd = rnd.nextInt(5)
      val beOff = if (rnd.nextBoolean()) 0.0 else 0.2
      val bars = (0 until 400).map { i =>
        val base = 100.0 + 12.0 * math.sin(i * 0.21) + rnd.nextGaussian() * 2.5
        val spread = 0.5 + rnd.nextDouble() * 4.0
        val mode =
          if (rnd.nextInt(17) == 0) None
          else if ((i / 9) % 2 == 0) Some("TREND") else Some("RANGE")
        DualBar("S", i.toLong * 1000L, base, base + spread, base - spread,
          base + rnd.nextGaussian() * spread / 2,
          atr = if (rnd.nextInt(23) == 0) None
                else if (rnd.nextInt(29) == 0) Some(0.0)   // degenerate ATR
                else Some(1.0 + rnd.nextDouble() * 4.0),
          signal = Some(if (rnd.nextInt(4) == 0) 1 else 0),
          mode = mode, tpR = 2.0, slK = 1.0, horizonBars = 6,
          beAtR = if (mode.contains("RANGE")) Some(0.5) else None)
      }
      def fold(bs: Seq[DualBar], st0: DualState = DualState.init)
          : (DualState, Vector[(DualTrade, Int)]) =
        bs.zipWithIndex.foldLeft((st0, Vector.empty[(DualTrade, Int)])) {
          case ((st, acc), (b, i)) =>
            val (next, t) = Backtest.dualStep(st, b, short = true,
              beOffsetR = beOff, cooldownBars = cd, feeBps = 0.0)
            (next, acc ++ t.map(_ -> i))
        }
      val (endSt, trades) = fold(bars)
      val barIdxOfTs = bars.map(_.barTsMs).zipWithIndex.toMap

      // one position at a time: strictly non-overlapping, time-ordered
      trades.map(_._1).sliding(2).foreach {
        case Seq(a, b2) =>
          assert(b2.entryTs > a.exitTs,
            s"trial=$trial overlapping trades: $a then $b2")
        case _ =>
      }
      trades.foreach { case (t, exitIdx) =>
        assert(t.barsHeld >= 1 && t.exitTs >= t.entryTs)
        assert(t.barsHeld <= 6, s"trial=$trial time stop overrun: $t")
        // the entry bar's ATR was valid (atr > 0) and its mode non-null
        val eIdx = barIdxOfTs(t.entryTs)
        assert(bars(eIdx).atr.exists(_ > 0.0),
          s"trial=$trial entered on degenerate ATR: $t")
        assert(bars(eIdx).mode.isDefined)
        assert(t.engine == bars(eIdx).mode.get)
        assert(exitIdx == barIdxOfTs(t.exitTs))
      }
      // post-loss cooldown: at least cd bars between a losing exit and
      // the next entry (in bar-index space, not wall time)
      trades.sliding(2).foreach {
        case Seq((a, aIdx), (b2, _)) if a.rMult < 0.0 =>
          assert(barIdxOfTs(b2.entryTs) - aIdx > cd,
            s"trial=$trial cd=$cd violated: exit@$aIdx -> ${b2.entryTs}")
        case _ =>
      }
      // stale/duplicate bars are dropped without touching state: replaying
      // a random prefix after the full fold changes nothing
      val stale = bars.take(1 + rnd.nextInt(bars.size))
      val (replaySt, replayTrades) = fold(stale, endSt)
      assert(replaySt == endSt && replayTrades.isEmpty,
        s"trial=$trial stale replay mutated state or emitted trades")
    }
  }
}
