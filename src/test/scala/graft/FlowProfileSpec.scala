package graft

import org.apache.spark.sql.functions._

import graft.operators.{Backtest, Flow, LowPlus, Profile}

/** Round-4 operators: order-flow/CVD features, LOW+ gating, column profile,
  * keep-fraction sweep, per-symbol equity/perf rollup. */
class FlowProfileSpec extends SparkTestBase {
  import spark.implicits._

  private def flowBars(rows: (Long, Double, Double, Double)*) =
    rows.map { case (ts, close, b, s) => ("A", ts, close, b, s) }
      .toDF("symbol", "bar_ts_ms", "close", "aggr_buy", "aggr_sell")

  test("flow features: CVD cumsum, slopes, fills, divergence signs") {
    val bars = flowBars(
      (0L, 100.0, 6.0, 4.0),   // delta +2, cvd 2
      (1L, 101.0, 3.0, 5.0),   // delta -2, cvd 0
      (2L, 102.0, 7.0, 1.0),   // delta +6, cvd 6
      (3L, 103.0, 0.0, 0.0),   // delta 0, norm 0 (guarded), cvd 6
      (4L, 99.0, 2.0, 8.0))    // delta -6, cvd 0
    val f = Flow.withFlowFeatures(bars).orderBy("bar_ts_ms").collect()

    assert(f.map(_.getAs[Double]("cvd_proxy")).toSeq == Seq(2.0, 0.0, 6.0, 6.0, 0.0))
    // first row's diff is null -> filled 0
    assert(f(0).getAs[Double]("cvd_ret1") == 0.0)
    assert(f(2).getAs[Double]("cvd_ret1") == 6.0)
    // zero total aggression -> norm 0, not null/NaN
    assert(f(3).getAs[Double]("delta_aggr_norm") == 0.0)
    assert(f(1).getAs[Double]("delta_aggr_norm") == -0.25)
    // slope_3 at row 3: cvd 6 - cvd 2 = 4; price 103 - 100 = 3 -> sign +1
    assert(f(3).getAs[Double]("cvd_slope_3") == 4.0)
    assert(f(3).getAs[Double]("price_slope_3") == 3.0)
    assert(f(3).getAs[Int]("div_cvd_price_3") == 1)
    // row 4: cvd 0 - cvd 0 = 0 -> sign 0
    assert(f(4).getAs[Int]("div_cvd_price_3") == 0)
  }

  test("flow z-score honors min_periods and zero-std guard") {
    val bars = flowBars((0L to 30L).map(i => (i, 100.0, 1.0, 0.0)): _*)
    val f = Flow.withFlowFeatures(bars, zWin = 10, zMinPeriods = 5)
      .orderBy("bar_ts_ms").collect()
    // constant delta -> cvd_ret1 constant 1 after row 0 -> std 0 -> filled 0
    assert(f.forall(_.getAs[Double]("cvd_ret1_z") == 0.0))
  }

  test("LOW+ gating: boolean algebra and reason codes are consistent") {
    val n = 120
    val bars = (0 until n).map { i =>
      val drift = if (i > 60) i * 0.8 else 0.0 // trend in back half
      ("A", i.toLong, 100.0 + drift + (i % 7), 101.0 + drift + (i % 5),
        99.0 + drift - (i % 3), 100.0 + drift + (i % 4) * 0.5)
    }.toDF("symbol", "bar_ts_ms", "open", "high", "low", "close")
    val g = LowPlus.enrich(bars).collect()
    assert(g.length == n)
    g.foreach { r =>
      val base = r.getAs[Boolean]("tradable_base")
      val ovr = r.getAs[Boolean]("tradable_override")
      assert(r.getAs[Boolean]("tradable_final") == (base || ovr))
      assert(r.getAs[Boolean]("is_add") == (ovr && !base))
      if (r.getAs[Boolean]("low_plus") && r.getAs[Boolean]("dir_ready"))
        assert(r.getAs[String]("override_reason") == "LOW_PLUS_AND_DIR_READY")
      if (!r.getAs[Boolean]("dir_ready"))
        assert(r.getAs[String]("block_reason_base") == "DIR_NOT_READY")
      val ds = r.getAs[String]("dir_state")
      Option(r.getAs[Double]("dir_score")).foreach { s =>
        if (s >= 0.15) assert(ds == "BULL")
        else if (s <= -0.15) assert(ds == "BEAR")
        else assert(ds == "NEUTRAL")
      }
    }
    // the trending back half must produce at least one dir-ready bar
    assert(g.exists(_.getAs[Boolean]("dir_ready")))
  }

  test("column profile: one pass, exact counts and stringified extrema") {
    val df = Seq(
      (1L, Some("a"), Some(1.5)),
      (2L, Some("b"), None),
      (3L, None, Some(0.5)),
      (4L, Some("b"), Some(2.5))
    ).toDF("id", "s", "v")
    val p = Profile.columnProfile(df, Seq("id", "s", "v"))
      .collect().map(r => r.getAs[String]("column_name") -> r).toMap
    assert(p("id").getAs[Long]("n_rows") == 4)
    assert(p("id").getAs[Long]("n_null") == 0)
    assert(p("id").getAs[Long]("n_distinct") == 4)
    assert(p("s").getAs[Long]("n_null") == 1)
    assert(p("s").getAs[Long]("n_distinct") == 2)
    assert(p("s").getAs[String]("min_str") == "a")
    assert(p("v").getAs[String]("max_str") == "2.5")
    // approx path returns the same shape
    val ap = Profile.columnProfile(df, Seq("id"), exact = false).collect()
    assert(ap.head.getAs[Long]("n_distinct") > 0)
  }

  test("keep-frac sweep: rank-based top-f cohorts") {
    // 10 rows, score = 10-i, r alternates +1/-0.5
    val rows = (0 until 10).map(i =>
      ("A", i.toLong, (10 - i).toDouble, if (i % 2 == 0) 1.0 else -0.5))
      .toDF("symbol", "bar_ts_ms", "score", "r")
    val out = Backtest.keepFracSweep(rows, "score", "r",
        Seq(0.2, 0.5, 1.0), Seq("symbol", "bar_ts_ms"))
      .collect().map(r => r.getAs[Double]("keep_frac") -> r).toMap
    // top 2 by score = rows i=0 (r=+1), i=1 (r=-0.5)
    assert(out(0.2).getAs[Long]("n_kept") == 2)
    assert(math.abs(out(0.2).getAs[Double]("mean_r") - 0.25) < 1e-12)
    assert(out(0.2).getAs[Double]("pf") == 2.0)
    assert(out(1.0).getAs[Long]("n_kept") == 10)
    assert(math.abs(out(1.0).getAs[Double]("wr") - 0.5) < 1e-12)
  }

  test("connected components: chains collapse to min label, singletons kept") {
    import graft.llm.Cluster
    val vertices = Seq(1L, 2L, 3L, 4L, 5L, 9L).toDF("id")
    // chain 3-2, 2-5; pair 1-4; 9 isolated
    val edges = Seq((2L, 3L), (2L, 5L), (1L, 4L)).toDF("id1", "id2")
    val cc = Cluster.connectedComponents(vertices, edges)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster_id")).toMap
    assert(cc == Map(1L -> 1L, 4L -> 1L, 2L -> 2L, 3L -> 2L, 5L -> 2L, 9L -> 9L))
  }

  test("near-dup clusters: seeded dups land with their source, no cross join") {
    import graft.llm.Cluster
    // docs with distinctive vocabularies; 101/102 are near-dups of 1/2
    def words(seed: Int) = (0 until 12).map(i => s"w${seed}_$i").mkString(" ")
    val docs = Seq(
      (1L, words(1)), (2L, words(2)), (3L, words(3)),
      (101L, words(1).split(" ").dropRight(2).mkString(" ")),
      (102L, words(2).split(" ").dropRight(2).mkString(" ")))
      .toDF("doc_id", "text")
    val out = Cluster.nearDupClusters(docs, maxDf = 5, minCommon = 2)
    assert(!out.queryExecution.executedPlan.toString.contains("CartesianProduct"))
    val m = out.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size"),
          r.getAs[Int]("is_canonical"))).toMap
    assert(m(1L) == (1L, 2L, 1))
    assert(m(101L) == (1L, 2L, 0))
    assert(m(102L) == (2L, 2L, 0))
    assert(m(3L) == (3L, 1L, 1))
  }

  test("stratified sample: deterministic, proportional, shuffle-free") {
    import graft.llm.Sampling
    val rows = (0 until 4000).map(i =>
      (i.toLong, if (i % 2 == 0) "a" else "b")).toDF("id", "stratum")
    val fr = Map("a" -> 0.25, "b" -> 0.75)
    val s1 = Sampling.stratified(rows, "id", "stratum", fr)
    // map-only: no exchange in the sampling operator itself
    assert(!s1.queryExecution.executedPlan.toString.contains("Exchange"),
      s1.queryExecution.executedPlan.toString)
    val c1 = s1.groupBy("stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // hash buckets are uniform-ish: within 15% of the target per stratum
    assert(math.abs(c1("a") - 500.0) / 500.0 < 0.15, c1)
    assert(math.abs(c1("b") - 1500.0) / 1500.0 < 0.15, c1)
    // bit-for-bit reproducible across runs and partitionings
    val ids1 = s1.select("id").collect().map(_.getLong(0)).sorted.toSeq
    val ids2 = Sampling.stratified(rows.repartition(7), "id", "stratum", fr)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids1 == ids2)
    // strata without a weight are dropped
    val s3 = Sampling.stratified(rows, "id", "stratum", Map("a" -> 1.0))
    assert(s3.select("stratum").distinct().collect().map(_.getString(0)).toSeq == Seq("a"))
  }

  test("mixture sampling: weight-derived fractions, availability cap, determinism") {
    import graft.llm.Sampling
    // a: 1000 rows, b: 3000 rows, c: 100 rows (scarce), d: unweighted
    val rows = ((0 until 1000).map(i => (i.toLong, "a")) ++
      (0 until 3000).map(i => (1000L + i, "b")) ++
      (0 until 100).map(i => (4000L + i, "c")) ++
      (0 until 500).map(i => (4100L + i, "d")))
      .toDF("id", "source")
    val w = Map("a" -> 0.3, "b" -> 0.2, "c" -> 0.5)
    val kept = Sampling.mixture(rows, "id", "source", w, targetRows = 1000)
    val fr = kept.select("source", "keep_frac").distinct()
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // derived fractions: a = 0.3*1000/1000 = 0.3, b = 0.2*1000/3000 = 1/15,
    // c wants 500 of 100 available -> capped at 1.0 (everything it has)
    assert(math.abs(fr("a") - 0.3) < 1e-12 &&
      math.abs(fr("b") - 0.2 * 1000 / 3000) < 1e-12 && fr("c") == 1.0, fr)
    val counts = kept.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("c") == 100L, counts)          // capped source keeps all
    assert(!counts.contains("d"), counts)        // unweighted source dropped
    assert(math.abs(counts("a") - 300.0) / 300.0 < 0.2, counts)
    // bit-for-bit reproducible under a different input partitioning
    val ids1 = kept.select("id").collect().map(_.getLong(0)).sorted.toSeq
    val ids2 = Sampling.mixture(rows.repartition(11), "id", "source", w, 1000)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids1 == ids2)
  }

  test("semi-structured extraction: typed fields, malformed rows counted") {
    import graft.operators.Semi
    val rows = Seq(
      (1L, "a", """{"k": 10, "tag": "x"}"""),
      (2L, "a", """{"k": 20}"""),            // missing tag -> null tag only
      (3L, "a", "not json at all"),          // malformed -> all nulls
      (4L, "b", """{"k": 7, "tag": "y"}"""),
      (5L, "b", null))                       // null payload -> all nulls
      .toDF("id", "grp", "props")
    val t = Semi.extractTyped(rows, "props", "k INT, tag STRING")
      .orderBy("id").collect()
    assert(t.map(r => Option(r.getAs[Integer]("k")).map(_.toInt)).toSeq ==
      Seq(Some(10), Some(20), None, Some(7), None))
    assert(t(0).getAs[String]("tag") == "x" && t(1).getAs[String]("tag") == null)
    val prof = Semi.jsonFieldProfile(rows, "grp", "props", "k")
      .orderBy("grp").collect()
      .map(r => (r.getAs[String]("grp"), r.getAs[Long]("n"),
        r.getAs[Long]("n_malformed"), r.getAs[Long]("n_null_field"),
        r.getAs[Integer]("min_k"), r.getAs[Integer]("max_k")))
    // group a: one malformed row; group b: a NULL payload is not a parse
    // failure (n_malformed 0) though its field is unavailable
    assert(prof.toSeq == Seq(("a", 3L, 1L, 1L, Integer.valueOf(10),
      Integer.valueOf(20)), ("b", 2L, 0L, 1L, Integer.valueOf(7),
      Integer.valueOf(7))))
    // a VALID payload with the field merely missing is not malformed
    val opt = Semi.jsonFieldProfile(
      Seq((1L, "c", """{"tag": "only"}""")).toDF("id", "grp", "props"),
      "grp", "props", "k").collect()(0)
    assert(opt.getAs[Long]("n_malformed") == 0L &&
      opt.getAs[Long]("n_null_field") == 1L)
    // a wrong-TYPED field in VALID JSON ({"k":"x"}): Spark's PERMISSIVE
    // parse marks the whole row corrupt (the corrupt-record column captures
    // the raw payload) and nulls the field — so it counts in BOTH
    // n_malformed and n_null_field; pinned here so the DuckDB oracle's
    // json_type guard must stay aligned with this semantics
    val wrong = Semi.jsonFieldProfile(
      Seq((1L, "d", """{"k": "x"}"""), (2L, "d", """{"k": 3}"""))
        .toDF("id", "grp", "props"),
      "grp", "props", "k").collect()(0)
    assert(wrong.getAs[Long]("n_malformed") == 1L &&
      wrong.getAs[Long]("n_null_field") == 1L &&
      wrong.getAs[Integer]("min_k") == 3 &&
      wrong.getAs[Integer]("max_k") == 3, wrong.toString)
    // the parse is map-side: only the final profile aggregation exchanges
    val plan = Semi.jsonFieldProfile(rows, "grp", "props", "k")
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size <= 2, plan)
  }

  test("shard shuffle: partition, position, seed epoch, determinism") {
    import graft.llm.Sampling
    val rows = (0 until 2000).map(_.toLong).toDF("id")
    val out = Sampling.shardShuffle(rows, "id", nShards = 8, seed = "e0")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // every row exactly once, shards in range
    assert(out.length == 2000 && out.map(_._1).distinct.length == 2000)
    assert(out.forall(t => t._2 >= 0 && t._2 < 8))
    // positions are contiguous 1..n within each shard
    out.groupBy(_._2).foreach { case (_, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length).toSeq)
    }
    // uniform-ish shard sizes (md5 buckets): within 25% of 250
    out.groupBy(_._2).values.foreach(rs =>
      assert(math.abs(rs.length - 250.0) / 250.0 < 0.25, rs.length))
    // bit-for-bit reproducible under a different input partitioning
    val again = Sampling.shardShuffle(rows.repartition(13), "id", 8, "e0")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
    assert(again.toSeq == out.sorted.toSeq)
    // a different seed is a genuinely different permutation
    val e1 = Sampling.shardShuffle(rows, "id", 8, "e1")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
    assert(e1.toSeq != out.sorted.toSeq)
    // decorrelation: ingestion order doesn't survive — consecutive ids
    // rarely stay adjacent in (shard, pos) order
    val orderOf = out.sortBy(t => (t._2, t._3)).map(_._1).zipWithIndex.toMap
    val adjacent = (0L until 1999L).count(i =>
      math.abs(orderOf(i) - orderOf(i + 1)) == 1)
    assert(adjacent < 20, s"$adjacent consecutive-id adjacencies")
  }

  test("doc chunking: window arithmetic, overlap, short-tail chunk") {
    import graft.llm.TextAnalysis
    def doc(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, doc(10)), (2L, doc(56)), (3L, doc(57)))
      .toDF("doc_id", "text")
    val ch = TextAnalysis.chunk(docs, chunkSize = 32, overlap = 8)
      .collect().groupBy(_.getAs[Long]("doc_id"))
    assert(ch(1L).length == 1 && ch(1L).head.getAs[Int]("n_tokens") == 10)
    // 56 tokens, stride 24: [1..32], [25..56]
    assert(ch(2L).length == 2)
    val c2 = ch(2L).sortBy(_.getAs[Int]("chunk_idx"))
    assert(c2(0).getAs[String]("chunk_text").startsWith("t1 ") &&
      c2(0).getAs[String]("chunk_text").endsWith(" t32"))
    assert(c2(1).getAs[String]("chunk_text").startsWith("t25 ") &&
      c2(1).getAs[String]("chunk_text").endsWith(" t56"))
    assert(c2(1).getAs[Int]("n_tokens") == 32)
    // 57 tokens: third chunk is the 9-token tail [49..57]
    assert(ch(3L).length == 3)
    val last3 = ch(3L).maxBy(_.getAs[Int]("chunk_idx"))
    assert(last3.getAs[Int]("n_tokens") == 9)
    assert(last3.getAs[String]("chunk_text") ==
      (49 to 57).map(i => s"t$i").mkString(" "))
  }

  test("tf-idf top-k: hand-computed scores and deterministic tiebreak") {
    import graft.llm.TextAnalysis
    val docs = Seq(
      (1L, "apple banana apple"), // tf(apple)=2, tf(banana)=1
      (2L, "banana cherry"),
      (3L, "cherry cherry durian"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopK(docs, k = 2).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    // doc 1: apple df=1 -> 2*ln(4/2)=1.386; banana df=2 -> ln(4/3)=0.288
    val d1 = out(1L).sortBy(_.getAs[Int]("rank"))
    assert(d1.head.getAs[String]("term") == "apple")
    assert(math.abs(d1.head.getAs[Double]("tfidf") - 2 * math.log(2.0)) < 1e-12)
    assert(d1(1).getAs[String]("term") == "banana")
    // doc 3: cherry 2*ln(4/3)=0.575 beats durian ln(4/2)=0.693? no:
    // durian df=1 -> 1*ln(2)=0.693 > cherry 0.575 -> durian first
    val d3 = out(3L).sortBy(_.getAs[Int]("rank"))
    assert(d3.head.getAs[String]("term") == "durian")
    assert(d3(1).getAs[String]("term") == "cherry")
    assert(out.values.forall(_.length <= 2))
  }

  test("robust scale: median/MAD z and MAD-band clipping, hand-computed") {
    import graft.operators.Stats
    // values 1..5 plus outlier 100: median 3.5, |x-med| = 2.5,1.5,.5,.5,1.5,96.5
    // -> MAD = 1.5
    val df = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 100.0).zipWithIndex
      .map { case (v, i) => ("A", i.toLong, v) }
      .toDF("symbol", "bar_ts_ms", "v")
    val out = Stats.robustScale(df, Seq("symbol"), "v", clipK = 3.0)
      .collect().map(r => r.getAs[Double]("v") ->
        (r.getAs[Double]("robust_z"), r.getAs[Double]("v_clipped"))).toMap
    val denom = 1.4826 * 1.5
    assert(math.abs(out(100.0)._1 - (100.0 - 3.5) / denom) < 1e-12)
    // outlier clips to med + 3*denom; inliers pass through
    assert(math.abs(out(100.0)._2 - (3.5 + 3.0 * denom)) < 1e-12)
    assert(out(3.0)._2 == 3.0 && out(5.0)._2 == 5.0)

    // constant group: MAD 0 -> z null, values unchanged
    val const = Seq(("B", 0L, 7.0), ("B", 1L, 7.0)).toDF("symbol", "bar_ts_ms", "v")
    val c = Stats.robustScale(const, Seq("symbol"), "v").collect()
    assert(c.forall(r => r.isNullAt(r.fieldIndex("robust_z")) &&
      r.getAs[Double]("v_clipped") == 7.0))
  }

  test("rolling correlation/beta match a sequential Pearson reference") {
    import graft.functions.Features
    val rnd = new scala.util.Random(7L)
    val xs = Array.fill(40)(rnd.nextDouble() * 10)
    val ys = xs.zipWithIndex.map { case (x, i) => 0.7 * x + rnd.nextDouble() * 3 }
    val df = (0 until 40).map(i => ("p", i.toLong, xs(i), ys(i)))
      .toDF("pair", "bar_ts_ms", "x", "y")
    val got = Features.withRollingCorr(df, "x", "y", n = 10, keyCols = Seq("pair"))
      .orderBy("bar_ts_ms").collect()
    // warmup rows gate to null
    assert((0 until 9).forall(i => got(i).isNullAt(got(i).fieldIndex("roll_corr"))))
    def pearson(i: Int): (Double, Double) = {
      val wx = xs.slice(i - 9, i + 1); val wy = ys.slice(i - 9, i + 1)
      val mx = wx.sum / 10; val my = wy.sum / 10
      val cov = wx.zip(wy).map { case (a, b) => a * b }.sum / 10 - mx * my
      val sx = math.sqrt(wx.map(a => a * a).sum / 10 - mx * mx)
      val sy = math.sqrt(wy.map(a => a * a).sum / 10 - my * my)
      (cov / (sx * sy), cov / (sx * sx))
    }
    Seq(9, 20, 39).foreach { i =>
      val (c, b) = pearson(i)
      assert(math.abs(got(i).getAs[Double]("roll_corr") - c) < 1e-9, s"row $i")
      assert(math.abs(got(i).getAs[Double]("roll_beta") - b) < 1e-9, s"row $i")
    }
    // positive relationship should show up
    assert(got(39).getAs[Double]("roll_corr") > 0.3)
  }

  test("containment: subset doc scores 1.0 where jaccard dips") {
    import graft.llm.Dedup
    val full = (1 to 20).map(i => s"w$i").mkString(" ")
    val quote = (1 to 8).map(i => s"w$i").mkString(" ") // strict prefix
    val pairs = Seq((1L, 2L, full, quote)).toDF("id1", "id2", "_t1", "_t2")
    val r = Dedup.withContainment(pairs, "_t1", "_t2", n = 3).collect().head
    // quote's 6 shingles all appear among full's 18
    assert(r.getAs[Double]("containment_b_in_a") == 1.0)
    assert(r.getAs[Double]("containment_a_in_b") > 1.0 - 1e-9 ||
      r.getAs[Double]("containment_a_in_b") < 0.5) // asymmetric: 6/18
    assert(math.abs(r.getAs[Double]("containment_a_in_b") - 6.0 / 18.0) < 1e-12)
    assert(r.getAs[Double]("jaccard") < 0.5) // symmetric score misses the quote
  }

  test("perf rollup: equity curve max drawdown and profit factor") {
    val trades = Seq(
      ("A", 0L, 2.0), ("A", 1L, -1.0), ("A", 2L, -1.0), ("A", 3L, 3.0))
      .toDF("symbol", "exit_ts", "r_mult")
    val p = Backtest.perf(trades).collect().head
    assert(p.getAs[Long]("n_trades") == 4)
    // equity 2,1,0,3 -> peaks 2,2,2,3 -> dd 0,1,2,0 -> max 2
    assert(p.getAs[Double]("max_drawdown_r") == 2.0)
    assert(p.getAs[Double]("pf") == 2.5) // (2+3)/(1+1)
    assert(p.getAs[Double]("wr") == 0.5)
  }

  test("LOW+ config gate: first-failing reason cascade and interval algebra") {
    val hourMs = 3600000L
    // (id, hour, dir_state, dir_score, range_pctl, low_plus, ready_base)
    val rows = Seq(
      (1L, 2, "BULL", 0.50, Some(15.0), true, false),  // all gates pass
      (2L, 3, "BULL", 0.50, Some(15.0), true, false),  // hour not allowed
      (3L, 2, "NEUTRAL", 0.00, Some(15.0), true, false), // neutral
      (4L, 2, "BEAR", 0.50, Some(15.0), true, false),  // side (bull only)
      (5L, 2, "BULL", 0.10, Some(15.0), true, false),  // below score floor
      (6L, 2, "BULL", 0.50, Some(25.0), true, false),  // outside allow union
      (7L, 2, "BULL", 0.50, Some(21.0), true, false),  // inside block union
      (8L, 2, "BULL", 0.50, Some(15.0), false, true),  // not a candidate
      (9L, 2, "BULL", 0.50, None, true, false))        // warmup NULL pctl
    val df = rows.map { case (id, h, st, sc, rp, lp, mr) =>
      (id, h * hourMs, st, sc, rp.map(Double.box).orNull, lp, mr)
    }.toDF("id", "bar_ts_ms", "dir_state", "dir_score", "range_pctl",
      "low_plus", "market_ready_base")
    // widened allow union so pctl=21 reaches the BLOCK interval check
    val cfg = LowPlus.LowPlusConfig("t",
      allowRangePctl = Seq(LowPlus.Interval(14.0, 22.0)),
      blockRangePctl = Seq(LowPlus.Interval(20.0, 22.0)))
    val out = LowPlus.applyConfigs(df, Seq(cfg)).orderBy("id").collect()
    val reasons = out.map(_.getAs[String]("low_plus_block_reason")).toSeq
    assert(reasons == Seq("", "hour", "neutral", "side", "dir_score",
      "range_not_allowed", "range_blocked", "", "range_not_allowed"))
    val allowed = out.map(_.getAs[Boolean]("low_plus_allow")).toSeq
    assert(allowed == Seq(true, false, false, false, false, false, false,
      false, false))
    // override = base readiness OR the LOW+ allow
    assert(out(0).getAs[Boolean]("market_ready_override"))
    assert(out(7).getAs[Boolean]("market_ready_override")) // base carries
    assert(!out(1).getAs[Boolean]("market_ready_override"))
  }

  test("value counts: per-column buckets, NULL bucket, in-column fractions") {
    import spark.implicits._
    val df = Seq(
      (Some("BULL"), Some(1)), (Some("BULL"), Some(0)),
      (Some("BEAR"), None), (None, Some(1)))
      .toDF("state", "flag")
    val out = graft.operators.Profile.valueCounts(df, Seq("state", "flag"))
      .orderBy("col_name", "value").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("flag", "0", 1L, 0.25), ("flag", "1", 2L, 0.5),
      ("flag", "NULL", 1L, 0.25),
      ("state", "BEAR", 1L, 0.25), ("state", "BULL", 2L, 0.5),
      ("state", "NULL", 1L, 0.25)))
    // one aggregation exchange for the whole dump (plus the window over
    // the tiny counted frame) — never one scan per column
    val plan = graft.operators.Profile.valueCounts(df, Seq("state", "flag"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), s"per-column union scan:\n$plan")
  }
}
