package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Features
import graft.llm.{Dedup, MinHashLsh, SimHash, TextAnalysis}
import graft.operators._
import graft.sources.Lake

/** Degenerate-input robustness: every operator must return an empty/sane
  * frame on empty and single-row inputs, never throw. */
class EdgeCaseSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emptyBars = Seq.empty[(String, Long, Double, Double, Double, Double, Double, Long)]
    .toDF("symbol", "bar_ts_ms", "open", "high", "low", "close", "volume", "n_trades")
  private lazy val oneBar = Seq(("A", 0L, 1.0, 2.0, 0.5, 1.5, 1.0, 1L))
    .toDF("symbol", "bar_ts_ms", "open", "high", "low", "close", "volume", "n_trades")
  private lazy val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private lazy val oneDoc = Seq((1L, "hello world end")).toDF("doc_id", "text")

  private def sizes(dfs: (String, DataFrame, Long)*): Unit =
    dfs.foreach { case (name, df, expected) =>
      assert(df.count() == expected, s"$name expected $expected rows")
    }

  test("bar/tf/gap operators survive empty input") {
    sizes(
      ("tf", TfAggregate(emptyBars, 60000L, 2), 0L),
      ("gaps", Gaps.gapsReport(emptyBars, 60000L), 0L),
      ("ffill", Gaps.gridFfill(emptyBars, 60000L), 0L),
      ("resample", Resample.ohlc(emptyBars.withColumn("bar_ts", timestamp_millis(col("bar_ts_ms"))), "day"), 0L),
      ("atr", Features.withAtrSma(emptyBars, 14), 0L),
      ("ichimoku", Ichimoku(emptyBars), 0L),
      ("regime", Regime.router(emptyBars), 0L),
      ("boxes", RangeBoxes(emptyBars), 0L),
      ("ewm", Ewm(emptyBars, Seq(EwmSpec.span("e", "close", 3))), 0L))
  }

  test("single-bar input: warmup gates yield nulls, no crashes") {
    assert(TfAggregate(oneBar, 60000L, 2).count() == 0) // incomplete bucket
    assert(TfAggregate(oneBar, 60000L, 1).count() == 1) // n=1 complete
    val f = Features.withAtrSma(oneBar, 14).collect()(0)
    assert(f.isNullAt(f.fieldIndex("atr")))
    assert(Gaps.gridFfill(oneBar, 60000L).count() == 1)
    val ich = Ichimoku(oneBar).collect()(0)
    assert(ich.getAs[String]("label") == "NEUTRE")
  }

  test("asof join with empty right side keeps all left rows null-filled") {
    val left = Seq(("A", 5L)).toDF("symbol", "ts")
    val right = Seq.empty[(String, Long, Double)].toDF("symbol", "rts", "ctx")
    val out = AsOf.joinBackward(left, right, "symbol", "ts", "rts").collect()
    assert(out.length == 1 && out(0).isNullAt(out(0).fieldIndex("ctx")))
  }

  test("llm operators survive empty and single-doc corpora") {
    sizes(
      ("exact", Dedup.exact(emptyDocs), 0L),
      ("minhash", MinHashLsh.nearDupPairs(emptyDocs, 0.5), 0L),
      ("simhash", SimHash.nearDupPairs(emptyDocs), 0L),
      ("quality", TextAnalysis.withQuality(emptyDocs), 0L))
    // a single doc can never pair with itself
    assert(MinHashLsh.nearDupPairs(oneDoc, 0.0).count() == 0)
    assert(SimHash.nearDupPairs(oneDoc).count() == 0)
    assert(Dedup.exact(oneDoc).count() == 1)
  }

  test("merge upsert with one empty side degenerates to identity") {
    val a = Seq(("A", 1L, 1.0)).toDF("symbol", "k", "v")
    val none = Seq.empty[(String, Long, Double)].toDF("symbol", "k", "v")
    assert(Lake.mergeUpsert(a, none, Seq("symbol", "k")).count() == 1)
    assert(Lake.mergeUpsert(none, a, Seq("symbol", "k")).count() == 1)
    assert(Lake.mergeUpsert(none, none, Seq("symbol", "k")).count() == 0)
  }

  test("backtest with no signals emits no trades") {
    val bars = Seq(("A", 0L, 1.0, 2.0, 0.5, 1.5, 1.0, 0))
      .toDF("symbol", "bar_ts_ms", "open", "high", "low", "close", "atr", "signal")
    assert(Backtest.runShort(bars, "signal").count() == 0)
    assert(Backtest.maeMfeShort(bars, horizon = 2).count() == 0)
  }

  test("sessions/stats/text operators survive empty and degenerate input") {
    import java.sql.Timestamp
    val emptyEvents = Seq.empty[(Long, Timestamp, Double)]
      .toDF("user_id", "ts", "value")
    assert(operators.Sessions.sessionize(
      emptyEvents, "user_id", "ts", "value", 1000L).count() == 0)

    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(llm.TextAnalysis.ngramFreq(emptyDocs, 2).count() == 0)
    assert(llm.TextAnalysis.repetitionProfile(emptyDocs, 2).count() == 0)
    assert(llm.Dedup.contamination(
      Seq((1L, "a b c")).toDF("doc_id", "text"), emptyDocs).count() == 0)

    // single-token docs produce no bigrams and drop out of the profile
    val short = Seq((1L, "solo"), (2L, "")).toDF("doc_id", "text")
    assert(llm.TextAnalysis.repetitionProfile(short, 2).count() == 0)

    // quantiles of an all-null group: percentile null, n = 0
    val nulls = Seq(("A", Option.empty[Double]), ("A", None))
      .toDF("symbol", "value")
    val q = operators.Stats.groupQuantiles(nulls, Seq("symbol"), "value", Seq(0.5))
      .collect()(0)
    assert(q.isNullAt(q.fieldIndex("p50")) && q.getAs[Long]("n") == 0L)
  }

  test("structure features: first day and short history gate to nulls/zeros") {
    val bars = Seq(
      ("A", 0L, 1.0, 2.0, 0.5, 1.5, 10.0),
      ("A", 3600000L, 1.5, 2.5, 1.0, 2.0, 0.0))
      .toDF("symbol", "bar_ts_ms", "open", "high", "low", "close", "volume")
    val out = graft.functions.Features.withSwingBreaks(
      graft.functions.Features.withDailyVwap(bars), swing = 12)
      .orderBy("bar_ts_ms").collect()
    // swing lookback incomplete -> no HH/LL flags
    assert(out.forall(r => r.getAs[Int]("is_hh") == 0 && r.getAs[Int]("is_ll") == 0))
    // zero-volume second bar keeps the prior cumulative VWAP
    assert(math.abs(out(1).getAs[Double]("vwap_d") -
      out(0).getAs[Double]("vwap_d")) < 1e-12)
  }

  test("round-4 operators survive empty and degenerate input") {
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")

    // clustering on an empty / edgeless corpus: every doc its own cluster
    assert(llm.Cluster.nearDupClusters(emptyDocs).count() == 0)
    val loner = Seq((7L, "only one doc here at all")).toDF("doc_id", "text")
    val solo = llm.Cluster.nearDupClusters(loner).collect()
    assert(solo.length == 1 && solo.head.getAs[Long]("cluster_size") == 1L &&
      solo.head.getAs[Int]("is_canonical") == 1)

    // chunking: empty corpus, and a doc shorter than one chunk
    assert(llm.TextAnalysis.chunk(emptyDocs).count() == 0)
    val tiny = llm.TextAnalysis.chunk(Seq((1L, "a b")).toDF("doc_id", "text"))
      .collect()
    assert(tiny.length == 1 && tiny.head.getAs[Int]("n_tokens") == 2)

    // tf-idf: single doc — idf = ln(2/2) = 0 for every term, ranks by term
    val one = llm.TextAnalysis.tfidfTopK(
      Seq((1L, "b a")).toDF("doc_id", "text"), k = 5).collect()
    assert(one.length == 2 && one.forall(_.getAs[Double]("tfidf") == 0.0))
    assert(one.sortBy(_.getAs[Int]("rank")).head.getAs[String]("term") == "a")

    // sampling: empty weights drop everything; frac 1.0 keeps everything
    val rows = (0 until 50).map(i => (i.toLong, "x")).toDF("id", "stratum")
    assert(llm.Sampling.stratified(rows, "id", "stratum", Map.empty).count() == 0)
    assert(llm.Sampling.stratified(rows, "id", "stratum", Map("x" -> 1.0)).count() == 50)

    // flow features on a single bar: diffs fill to 0, norm guarded
    val oneBar = Seq(("A", 0L, 1.0, 0.0, 0.0))
      .toDF("symbol", "bar_ts_ms", "close", "aggr_buy", "aggr_sell")
    val f = operators.Flow.withFlowFeatures(oneBar).collect().head
    assert(f.getAs[Double]("delta_aggr_norm") == 0.0 &&
      f.getAs[Double]("cvd_ret1") == 0.0 &&
      f.getAs[Int]("div_cvd_price_3") == 0)

    // keep-frac sweep with all-null scores: empty result, no crash
    val nullScores = Seq(("A", 0L, Option.empty[Double], Some(1.0)))
      .toDF("symbol", "bar_ts_ms", "score", "r")
    assert(operators.Backtest.keepFracSweep(
      nullScores, "score", "r", Seq(0.5, 1.0), Seq("symbol", "bar_ts_ms"))
      .count() == 0)

    // column profile of an empty frame: zero rows/nulls/distinct per column
    val p = operators.Profile.columnProfile(
      emptyDocs, Seq("doc_id", "text")).collect()
    assert(p.length == 2 && p.forall(r => r.getAs[Long]("n_rows") == 0L &&
      r.getAs[Long]("n_null") == 0L && r.getAs[Long]("n_distinct") == 0L))
  }

  test("round-6 operators survive degenerate configs and inputs") {
    import spark.implicits._
    // packShards: budget 1 -> every doc is tokens-before packs (still the
    // greedy rule); empty corpus -> empty output; invalid params throw
    val docs = Seq((1L, "a b c"), (2L, "d")).toDF("doc_id", "text")
    val tight = llm.TextAnalysis.packShards(docs, tokensPerPack = 1L,
      nShards = 1).orderBy("doc_id").collect()
    assert(tight.map(_.getAs[Long]("pack_id")).toSeq == Seq(0L, 3L))
    assert(llm.TextAnalysis.packShards(docs.limit(0), 8L).count() == 0L)
    intercept[IllegalArgumentException] {
      llm.TextAnalysis.packShards(docs, tokensPerPack = 0L)
    }
    // LOW+ config with EMPTY allow-interval union: nothing is allowed and
    // the reason cascade reports range_not_allowed (not a crash)
    val enriched = Seq((1L, 7200000L, "BULL", 0.5, 15.0, true, false))
      .toDF("id", "bar_ts_ms", "dir_state", "dir_score", "range_pctl",
        "low_plus", "market_ready_base")
    val noAllow = operators.LowPlus.LowPlusConfig("none",
      allowHoursUtc = 0 until 24, allowRangePctl = Nil,
      blockRangePctl = Nil)
    val out = operators.LowPlus.applyConfigs(enriched, Seq(noAllow)).collect()
    assert(!out(0).getAs[Boolean]("low_plus_allow"))
    assert(out(0).getAs[String]("low_plus_block_reason") == "range_not_allowed")
    // retry with maxRetries = 0: the first failure is terminal
    var attempts = 0
    val dead: sources.Collector.Fetch = (_, _, _) => {
      attempts += 1; throw new RuntimeException("down")
    }
    intercept[RuntimeException] {
      sources.Collector.withRetry(dead, maxRetries = 0,
        sleep = _ => ())("S", None, 1)
    }
    assert(attempts == 1)
  }

  test("round-7 backtest overlays: cross-symbol isolation and degenerate inputs") {
    import spark.implicits._
    import graft.operators.Backtest

    // cooldown state NEVER crosses symbols: A's loss must not block B's
    // entry on the next bar (SeqScan resets state at every key change)
    def sym(s: String) = Seq(
      (s, 0L, 100.0, 100.0, 100.0, 100.0, 10.0, 1),
      (s, 1L, 100.0, 115.0, 99.0, 100.0, 10.0, 1),  // entry; SL -> loss
      (s, 2L, 100.0, 101.0, 99.0, 100.0, 10.0, 0),  // re-entry bar
      (s, 3L, 100.0, 115.0, 99.0, 100.0, 10.0, 0))  // SL again
    val bars = (sym("A") ++ sym("B"))
      .toDF("symbol", "bar_ts_ms", "open", "high", "low", "close", "atr", "signal")
    val t = Backtest.run(bars, "signal", short = true, tpR = 2.0, slK = 1.0,
      horizon = 16, cooldownBars = 10).collect()
    // one trade per symbol (the re-entry is cooled down IN each symbol),
    // proving B's first trade was not blocked by A's loss
    assert(t.length == 2 && t.map(_.getAs[String]("symbol")).toSet == Set("A", "B"))
    assert(t.forall(_.getAs[Long]("entry_ts") == 1L))

    // zero/negative ATR at the entry bar SKIPS the entry (the reference's
    // `atr <= 0: continue`) instead of opening an unmanageable risk-0
    // position — and, crucially, does NOT wedge the symbol: a later signal
    // with a valid ATR still trades.
    val z = Seq(("A", 0L, 100.0, 100.0, 100.0, 100.0, 0.0, 1, "TREND"),
        ("A", 1L, 100.0, 120.0, 80.0, 100.0, 0.0, 1, "TREND"),   // skipped entry (atr=0), re-signal
        ("A", 2L, 100.0, 101.0, 99.0, 100.0, 10.0, 0, "TREND"),  // valid entry executes here
        ("A", 3L, 100.0, 115.0, 99.0, 100.0, 10.0, 0, "TREND"))  // SL exit
      .toDF("symbol", "bar_ts_ms", "open", "high", "low", "close", "atr", "signal", "mode")
      .withColumn("tp_r", lit(2.0)).withColumn("sl_k", lit(1.0))
      .withColumn("horizon_bars", lit(16)).withColumn("be_at_r", lit(null).cast("double"))
    val zt = Backtest.runDualEngine(z, "signal", "mode").collect()
    assert(zt.length == 1 && zt.head.getAs[Long]("entry_ts") == 2L &&
      zt.head.getAs[String]("exit_reason") == "SL")
    // same gate in the single-engine event machine
    val zs = Backtest.run(z, "signal", short = true).collect()
    assert(zs.length == 1 && zs.head.getAs[Long]("entry_ts") == 2L)

    // 3-D sweep: horizon longer than the data emits zero cells for that
    // horizon but full cells for the short one
    val short = (0 until 12).map(i =>
        ("A", i.toLong, 100.0, 101.0, 99.0, 100.0, 5.0))
      .toDF("symbol", "bar_ts_ms", "open", "high", "low", "close", "atr")
    val cells = Backtest.sweepGrid3d(short, horizons = Seq(8, 64),
        slKs = Seq(1.0), tpRs = Seq(2.0))
      .collect().map(r => r.getAs[Int]("horizon_bars") -> r.getAs[Long]("n_trades")).toMap
    assert(cells.contains(8) && !cells.contains(64))
  }

  test("round-8 selection/embedding operators survive degenerate input") {
    import graft.llm.{Selection, Similarity}
    val docs = Seq((1L, "only", true), (2L, "two words", false))
      .toDF("doc_id", "text", "tgt")
    // 1-token doc scores in importanceWeight but has no bigrams: lmScore
    // drops it rather than emitting a 0/0 row
    assert(Selection.importanceWeight(docs, col("tgt")).count() == 2)
    assert(Selection.lmScore(docs, col("tgt")).count() == 1)
    // all-target corpus: p_target == p_raw, every weight is exactly 0
    val allT = Selection.importanceWeight(docs, lit(true)).collect()
    assert(allT.forall(_.getAs[Double]("log_weight") == 0.0))
    // dedup curve on a corpus with no qualifying pairs: zero-filled curve
    val lone = Seq((1L, "a b c")).toDF("doc_id", "text")
    val curve = Dedup.dedupRateCurve(lone, thresholds = Seq(0.5), n = 3)
      .collect()
    assert(curve.map(r => (r.getAs[Long]("n_pairs"),
      r.getAs[Long]("n_dropped"))).toSeq == Seq((0L, 0L)))
    // zero-norm vector: no cosine is defined -> null cluster row, and
    // semanticDedup keeps it (it can never match anything)
    val vz = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)),
      (2L, Seq(0.0, 0.0))).toDF("vec_id", "embedding")
    val asg = Similarity.kmeansAssign(vz, k = 2).orderBy("vec_id").collect()
    assert(asg(2).isNullAt(1) && asg(2).isNullAt(2))
    val sd = Similarity.semanticDedup(vz, k = 2, tau = 0.9)
      .where(col("vec_id") === 2).collect()(0)
    assert(sd.getAs[Int]("kept") == 1)
    // k larger than the corpus: codebook is just every vector
    assert(Similarity.kmeansAssign(vz.where(col("vec_id") < 2), k = 10)
      .count() == 2)
  }

  test("round-9 paths survive degenerate input") {
    import graft.llm.{Cluster, MinHashLsh, Selection, Similarity}
    // posting-list blocking: empty corpus, single doc, and a maxDf=1 cap
    // (every shared shingle over-cap) all yield zero edges, no crash
    val empty = spark.emptyDataFrame
      .select(lit(0L).as("doc_id"), lit("").as("text")).where(lit(false))
    assert(Cluster.rareShingleEdges(empty).count() == 0)
    val lone = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    assert(Cluster.rareShingleEdges(lone).count() == 0)
    val twins = Seq((1L, "a b c d e f"), (2L, "a b c d e f"))
      .toDF("doc_id", "text")
    assert(Cluster.rareShingleEdges(twins, maxDf = 1).count() == 0)
    assert(Cluster.rareShingleEdges(twins, maxDf = 5).count() == 1)
    // connectedComponents with an empty edge set: all singletons
    val cc = Cluster.connectedComponents(
      Seq(1L, 2L).toDF("id"), Cluster.rareShingleEdges(lone)
        .select(col("id1"), col("id2")))
    assert(cc.where(col("id") === col("cluster_id")).count() == 2)
    // maxCell=1: maximal salt-split still equals the plain join
    val vecs = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)),
      (2L, Seq(1.0, 0.01)), (3L, Seq(1.0, 0.02))).toDF("vec_id", "embedding")
    val plain = Similarity.semanticDedup(vecs, k = 2, tau = 0.9)
      .orderBy("vec_id").collect().map(_.toSeq).toSeq
    val split1 = Similarity.semanticDedup(vecs, k = 2, tau = 0.9,
      maxCell = Some(1)).orderBy("vec_id").collect().map(_.toSeq).toSeq
    assert(split1 == plain)
    // maxBucket=1 drops every shared bucket; organic-only corpus unaffected
    assert(MinHashLsh.nearDupPairs(twins, threshold = 0.3,
      maxBucket = Some(1)).count() == 0)
    // scoreWithRelation against an EMPTY model: every token takes the OOV
    // floor; empty docs frame scores to an empty frame
    val m0 = Seq.empty[(String, Double)].toDF("token", "weight")
    val scored = Selection.scoreWithRelation(
      Seq((7L, "x y z")).toDF("doc_id", "text"), m0, oovWeight = -1.5)
      .collect()(0)
    assert(scored.getAs[Int]("n_tokens") == 3)
    assert(math.abs(scored.getAs[Double]("log_weight") - (-4.5)) < 1e-9)
    assert(Selection.scoreWithRelation(
      empty.select(col("doc_id"), col("text")), m0, 0.0).count() == 0)
  }

  test("round-9 curation ops survive empty/degenerate input") {
    import graft.llm.{Curation, Dedup, Sampling, Similarity, TextAnalysis}
    // bloom decontamination with an EMPTY benchmark: no grams -> a filter
    // that matches nothing -> no corpus doc flagged (and no exception
    // from the size-0 build)
    assert(Dedup.contaminationBloom(oneDoc, emptyDocs).count() == 0)
    // ... and an empty corpus against a real benchmark
    assert(Dedup.contaminationBloom(emptyDocs, oneDoc).count() == 0)
    // incremental dedup: empty batch; empty history handled in LlmSpec
    assert(Dedup.exactIncremental(emptyDocs, oneDoc
      .select(TextAnalysis.fingerprint(col("text")).as("fingerprint")))
      .count() == 0)
    // shard shuffle: nShards=1 is a single contiguous permutation
    val one = Sampling.shardShuffle((0L until 10L).toDF("id"), "id", 1)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(one.forall(_._1 == 0) && one.map(_._2).sorted.toSeq == (1L to 10L))
    assert(Sampling.shardShuffle(emptyDocs.select(col("doc_id")),
      "doc_id", 8).count() == 0)
    // quantization of a zero-DIMENSIONAL vector: scale null (undefined),
    // codes empty, no crash
    val zeroDim = Seq((1L, Seq.empty[Float])).toDF("vec_id", "embedding")
    val qz = Similarity.quantizeInt8(zeroDim).collect()(0)
    assert(qz.getAs[Int]("dim") == 0 && qz.isNullAt(qz.fieldIndex("scale")))
    // projection with a mismatched inDim surfaces null, not silent junk
    val shortVec = Seq((1L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    assert(Similarity.randomProject(shortVec, inDim = 4, outDim = 2)
      .where(col("value").isNull).count() == 2)
    // vocab coverage: empty corpus -> empty; all-empty docs -> no tokens
    assert(TextAnalysis.vocabCoverage(emptyDocs, 5).count() == 0)
    assert(TextAnalysis.vocabCoverage(
      Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text"), 5).count() == 0)
    // normalization of null text stays null; empty stays empty
    val nn = TextAnalysis.withNormalized(
      Seq((1L, null.asInstanceOf[String]), (2L, "")).toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
    assert(nn(0).isNullAt(nn(0).fieldIndex("norm_text")))
    assert(nn(1).getAs[String]("norm_text") == "")
    // data card on a single-source, single-doc corpus
    val card = Curation.dataCard(
      Seq((1L, "a", "one tiny doc")).toDF("doc_id", "source", "text"))
      .collect()(0)
    assert(card.getAs[Long]("n_docs") == 1L &&
      card.getAs[Double]("dup_rate") == 0.0)
    // compressed ANN with k larger than the corpus: emits what exists
    val emb = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val comp = Similarity.annTopKCompressed(emb, emb, k = 10, inDim = 2,
      projDim = 2, shortlist = 10)
    assert(comp.count() == 6) // 3 queries x 2 neighbors each
  }
}
