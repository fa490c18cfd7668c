package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.ExplainMode

/** Writes PLANS.md: the formatted physical plans of headline queries with
  * the scale-relevant properties called out. Regenerate with
  * `sbt "runMain graft.PlanDump"` after plan-affecting changes. */
object PlanDump {

  private val Commentary = Map(
    "tf_aggregate" -> "One hash aggregate per logical aggregation (bars, buckets), partial aggregation map-side, completeness gates as a post-aggregation Filter — no extra distinct shuffle.",
    "asof_join" -> "Union of tagged sides + ONE running-frame window — no range join, no pair explosion; this plan shape is invariant in data size.",
    "rolling_stats" -> "All window frames share a single (symbol, ts) sort/exchange.",
    "ann_topk" -> "Query side broadcast (BroadcastNestedLoopJoin is the intended brute-force shape); cosine_sim is the codegen'd native expression, no UDF nodes.",
    "minhash_lsh" -> "Candidates from equi-joins on (band, bucket); the signature map stage is computed once and shared by both self-join sides via exchange reuse (no cache); no CartesianProduct anywhere.",
    "robust_scale" -> "Two grouped aggregations (median, then MAD) with per-group scalars joined back — tiny sides, broadcast-eligible; the useApprox flag swaps exact percentile buffers for fixed-memory percentile_approx sketches at lake scale.",
    "equity_curve" -> "Per-symbol SeqScan state machine for the inherently sequential position lifecycle (parallel across symbols, like a keyed stream processor), then one window + one hash aggregate for the drawdown/perf rollup.",
    "merge_upsert" -> "Tagged union + one keep-last window on the merge keys — upsert without read-modify-write.",
    "sessionize" -> "session_window aggregation: one hash-shuffle on the key, sessions merged inside the aggregate (UpdatingSessions), tiny post-pass for ids — the identical expression runs under Structured Streaming.",
    "topk_docs" -> "WindowGroupLimit above AND below the exchange: per-partition top-k pruned map-side before the shuffle, so the exchange carries at most k rows per group.",
    "exact_dedup" -> "One hash aggregate keyed on the content fingerprint with map-side partial aggregation — the canonical shuffle-on-hash dedup; no window, no join.",
    "ann_ivf" -> "Codebook is driver-side literals; cell assignment and probe are codegen'd projections, candidates from a broadcast equi-join on cell id — no ML pipeline nodes on the hot path.",
    "flow_features" -> "Entire CVD block (cumulative sum, slope lags, rolling z) rides ONE (symbol, ts) sort after the bar hash-aggregate — adding features does not add exchanges.",
    "column_profile" -> "All columns profiled in one scan; exact multi-distinct plans as a single Expand (one row per distinct aggregate) feeding one aggregation — the honest exactness cost, with the HLL path one-shuffle.",
    "stratified_sample" -> "Map-only: the md5-bucket membership filter sits directly above the scan — no exchange, no RNG state; sampling composes with partition pruning.",
    "rolling_corr" -> "Pair join on the time grid, then every Pearson co-moment (avg, avg-of-product, stddev_pop) rides ONE window sort per pair key.",
    "low_plus_sweep" -> "Config grid explode: the |configs|-row table broadcasts (BroadcastNestedLoopJoin over a local relation — the big side never shuffles for the join), interval-union membership is a codegen'd exists over each config's interval array, and ONE hash aggregation on config_id rolls up every policy at once.",
    "keep_frac_sweep_sketch" -> "The lake-scale sweep (contract key since round 6, rows-only): one percentile_approx sketch pass for ALL fraction thresholds, a broadcast threshold join, one hash aggregation — NO window, no global sort, nothing single-partition (the rank-based keep_frac_sweep keeps the oracle-checkable exact cohort).",
    "pack_shards" -> "Stable hash sharding is a map-side projection; the running token sum is ONE per-shard window (nShards-way parallel, never a global sort) — the plan holds at any corpus size by raising nShards so per-shard window state stays executor-sized.",
    "corpus_pipeline" -> "The training-data capstone as ONE plan: exact-dedup keep-min window on the content fingerprint, codegen'd quality/language gates (stateless map), chunk explode (map-side sequence generation), and the per-shard packing window — two keyed exchanges total (fingerprint, shard) for the whole clean→dedup→chunk→pack path; every other stage is narrow.",
    "ml_filter" -> "The scoring pass of the MLlib trade filter: feature windows (atr/er/vwap-z) share one (symbol, ts) sort above the bar hash-aggregate, vector assembly and the fitted model's transform are projections, and the confusion matrix is one final hash aggregate. The LBFGS fit itself ran upstream of this plan on a narrow repartitioned cached iterate, unpersisted on return (ScaleHygieneSpec) — training cost amortizes with data and leaves no block-manager residue.",
    "ml_regime_month" -> "The per-slice evaluation plan of the period-grain regime model: the coarse frame is ONE hash aggregation (min_by/max_by per day bucket) over the shared feature-window sort; forward-return labels are a per-symbol lead window on the period grid (bounded by symbols x periods, tiny at any bar volume); scoring is projections above the fitted model; the TRAIN/VAL/TEST summary is one hash aggregate. Threshold/impute/moment scalars were pulled upstream from the symbols x periods frame — boundary metadata, not a data-path collect (the deterministic frame itself is hash-checked under the regime_frame key).",
    "ann_lsh" -> "Banded-LSH candidate generation as id-only equi-joins: hash-band signatures are codegen'd projections, candidates come from a (band, bucket) self-equi-join carrying ONLY ids (vectors rejoin after the distinct), exact re-rank is the native cosine expression, top-k is WindowGroupLimit pruned map-side before the final exchange. No CartesianProduct anywhere (PlanAuditSpec asserts it).",
    "param_sweep_3d" -> "The horizon dimension costs WINDOW FRAMES, not passes: every per-horizon forward-extrema frame rides the one (symbol, ts) sort, the 8-cell grid broadcasts (BroadcastNestedLoopJoin over a literal local relation — the bar side never shuffles for the join), each grid row selects its horizon's columns with a codegen'd conditional, and one partial+final hash-aggregate pair rolls up every (H, slK, tpR) cell including the exit-reason counts. Sweeping more horizons widens the window stage; it never adds a scan.",
    "add_slices" -> "The reference's four sequential pandas groupbys (side, range bucket, hour, side-by-bucket) as ONE grouping-sets aggregation: forward-return windows ride the (symbol, ts) sort, the slice dimensions expand via a single Expand node, and one partial+final hash-aggregate pair computes every slice — four reports, one shuffle on the slice key (PlanAuditSpec pins the Expand + single aggregation exchange).",
    "backtest_dual_engine" -> "The full router risk model as one plan: ATR/efficiency-ratio windows and the ichimoku signal chain share the (symbol, ts) sort; per-engine configs (stop, target, time stop, break-even) are codegen'd conditional projections — routing adds columns, not operators; the position lifecycle (entries, armed stops, mode flips, cooldown) is a per-symbol SeqScan state machine above ONE keyed sort — sequential where the semantics are sequential, parallel across symbols, the exact shape a keyed stream processor gives. Trade emission is a narrow filter; no per-trade joins, no driver loops.",
    "contamination" -> "Train/test leak check at lake scale: both sides reduce to content fingerprints map-side (native canonical-hash expression directly above each scan), the train side pre-aggregates to one row per fingerprint, and the match is a single fingerprint equi-join — shuffle carries hashes and ids, never document text.",
    "ccnet_buckets" -> "The CCNet bucketing step: the LM-score subtree feeds both the tercile-cut aggregate (two exact-percentile scalars collapsing to ONE broadcast row) and the verdict projection; like dsir_sample, the cut side's scoring exchanges are served from the verdict side's shuffle files at runtime (ReusedExchange — PlanAuditSpec pins the same property on the DSIR twin). The two-phase shape (score, cut, label) is inherent to any global-quantile split; no stage scans the corpus more than the scoring pass itself.",
    "dsir_sample" -> "DSIR selection end to end: the weight frame feeds both the exact-percentile threshold aggregate and the verdict projection; the threshold side collapses to ONE scalar row that broadcasts back over the weight frame (BroadcastNestedLoopJoin over a 1-row relation — the weight side never shuffles for it). Where the two consumers share the scoring subtree, AQE exchange reuse serves the second reader from the first's shuffle files.",
    "dedup_rate_curve" -> "The pre-dedup threshold sweep: gram explode map-side, ONE df aggregation whose [minDf, maxDf] band bounds the blocking join (at most C(maxDf,2) pairs per gram — all-pairs structurally impossible), one (id1, id2) aggregation computing shared-gram counts, and the exact Jaccard + threshold grid as a broadcast literal join (the sweep-grid pattern: the pair side never shuffles per threshold, and adding thresholds adds rows to a literal, never a pass).",
    "importance_weight" -> "The DSIR scoring pass: tokens explode map-side, ONE vocabulary-keyed aggregation carries BOTH corpus counts (raw + target — no second scan for the target distribution), the corpus totals ride a broadcast 1-row cross join, and per-doc scoring is an equi-join on the token key feeding one final doc-keyed aggregate. Every exchange carries (id, token, count) rows — O(tokens), never text, nothing pairwise, no window (PlanAuditSpec pins no-Window/no-Cartesian).",
    "semantic_dedup" -> "SemDeDup as two stages in one plan: cell assignment is the fused NearestCentroid codegen loop (map-only, the codebook is a literal reference object — zero shuffle for any k), and the duplicate check is a self-equi-join ON THE CELL KEY, so pairwise cosine work is confined to O(sum c_i^2) within cells — corpus-pairwise comparison is structurally impossible (PlanAuditSpec pins no-Cartesian).",
    "router_profile" -> "The reference inspector's per-column value_counts as ONE plan: every profiled column explodes map-side into (column, value) pairs, a single partial+final hash-aggregate pair counts every bucket of every column (one exchange for the whole dump — never a per-column union of scans), and the in-column fractions come from a window over the tiny aggregated frame. Adding profiled columns widens the explode; it never adds a scan (PlanAuditSpec pins no-Union + one aggregation exchange).",
    "contamination_bloom" -> "Bloom decontamination's corpus pass: the benchmark-side filter was built upstream (one tree-aggregate over the SMALL side) and ships inside the native bloom_might_contain codegen expression, so the corpus side is gram-explode -> probe -> per-doc hash aggregate — NO join node anywhere, no corpus-gram exchange beyond the per-doc count's own shuffle. Compare contamination_ngram's equi-join plan: the exchange that carried O(corpus tokens) of hashes is gone (LlmSpec pins the no-Join property).",
    "shard_shuffle" -> "Reproducible training-order shuffle: the md5 sort key and shard id are map-side projections, the only exchange is the hash partition on shard, and the position is a per-shard window — nShards is the parallel unit and the window buffer is one shard's keys. No global sort node anywhere; orderBy(rand()) would give a range exchange AND non-reproducibility across retries.",
    "curation_report" -> "The per-source data card: quality flags and char/token metrics are one map-side projection block, duplicate election is ONE hash aggregate on the md5 fingerprint joined back on the same key (the exact-dedup shape — AQE broadcasts the keeper side at test scale, co-partitioned at lake scale), and the card is a |sources|-row partial+final aggregate. Text never enters an exchange.",
    "vocab_coverage" -> "Vocabulary-coverage audit: token frequencies are one O(tokens) hash aggregate, top-V is TakeOrderedAndProject (per-partition top-V, V rows merged — never a global sort), and the vocabulary rejoins BROADCAST so the per-doc OOV pass is map-side above the token explode. Raising V grows a broadcast list, not a shuffle.",
    "corpus_pipeline_v2" -> "The five-stage curation capstone as ONE plan: normalization is a stateless regex projection fused into the scans of both split sides; the Gopher gate is a codegen'd filter with no exchange of its own; decontamination pays ONE gram aggregation over the (small) benchmark and a left-anti on the corpus gram overlap; span dedup is the one-hash-agg first-occurrence election plus the per-doc rebuild; and the shard shuffle is a map-side md5 projection + one 4-way exchange + per-shard sorts. No stage materializes between stages; the two O(tokens) relations (benchmark grams, span hashes) are the whole shuffle budget.",
    "props_extract" -> "Semi-structured extraction: ONE schema-pruned JsonToStructs (codegen'd Jackson pass) per row computes the typed field AND the corrupt-record flag map-side, then a single partial+final hash-aggregate pair rolls up the per-type profile — the parse never repeats per metric and malformed rows are counted in the same pass that extracts values.",
    "corpus_pipeline_v3" -> "The seven-stage capstone = v2's linear per-doc prefix (normalize → Gopher → decontaminate → span-dedup, ONE plan — see corpus_pipeline_v2's dump for its shape) + an EXPLICIT stage boundary (eager localCheckpoint; the cross-doc suffix consumes the prefix repeatedly — the clustering stage iterates and `canon` fans out to selection and the final join — so materializing once is 2.0x on the bench median, and at lake scale it is the stage write every published pipeline performs between per-doc filtering and cross-doc dedup) + the near-dup clustering / DSIR-selection / shard-shuffle suffix, whose dumped plan below therefore starts from the checkpointed prefix scan.",
    "embed_pq" -> "Product quantization: codebooks are a bounded driver artifact (m·ksub·subDim doubles, the IVF-codebook pattern); encoding is ONE map-side projection — m·ksub literal sub-distance expressions per row, no shuffle, no UDF — and the report is the same single pass. The 4-byte-code index is what makes a 100 TB embedding store RAM-resident.",
    "ann_pq" -> "PQ ANN with ADC scoring: the code-only index decodes ONCE per candidate below the broadcast query join (decode inline in the cosine would rebuild it |Q| times), the coarse pass is the broadcast brute scan over reconstructions (right at small |Q|; the IVF cell probe hosts the same codes at corpus scale), and floats are touched only for the per-query shortlist via equi-join — the two-stage skeleton shared with the SQ8 ladder.",
    "bpe_pairs" -> "BPE pair statistics: the corpus appears in exactly one explode + hash aggregation (the word-frequency pass); the char split and adjacent-pair explode then run over the VOCABULARY-sized relation, and the final rank is a window over the alphabet²-sized pair aggregate — corpus bytes never reach the window. The shape every tokenizer-training iteration reuses.",
    "bpe_merges" -> "BPE merge training: the corpus-scale work is the same single word-count aggregation; the merge loop consumes the deterministic frequency-truncated dict (a bounded driver artifact, the published trainer shape — HF tokenizers/SentencePiece train exactly this way) so each of the 32 iterations costs microseconds, not a job. The fully-distributed Bpe.train twin (one pair-count agg + LIMIT-1 argmax + one fold pass per iteration, localCheckpoint-truncated) is the unbounded-vocabulary fallback, pinned equal in BpeSpec.",
    "repeated_ngram_trim" -> "ExactSubstr dedup at token grain as shuffle algebra: positional 10-grams hash map-side to 8 bytes and ONE hash aggregation nominates duplicated gram hashes; the nominated positions rejoin their docs (suspect docs ship their token array once), rebuild the gram STRINGS, and a string-keyed window count confirms exact duplication — the collision-proofing pass whose exchange is O(suspect positions), not O(corpus grams). Confirmed starts collect per doc (bounded by the doc's own length), fuse into maximal disjoint spans via one array aggregate, and the kept text rebuilds from the spans' complement intervals — O(tokens + spans) per row, linear even on a wall-to-wall self-repeat doc. No pairwise document comparison anywhere; text crosses an exchange only for the suspect subset.",
    "contamination_bloom_verified" -> "The 100 TB decontamination composition: the corpus-side Bloom probe (see contamination_bloom — map-only, no join) NOMINATES suspect test docs, then the exact 8-gram equi-join runs ONLY over the suspects — the filter has no false negatives, so the composition is provably bit-identical to the full equi-join (LlmSpec pins equality at fpp 0.2) while the verify exchange carries suspect grams instead of the corpus gram stream. The plan shows both stages: the probe's gram-explode -> bloom_might_contain -> per-doc aggregate, and the bounded equi-join above it.",
    "corpus_pipeline_v4" -> "The eight-stage capstone = v3's shape with the ExactSubstr stage inserted where the published pipelines run it (between exact and fuzzy dedup): the per-doc prefix (normalize → Gopher → decontaminate → span-dedup) materializes at the first stage boundary, the corpus-wide repeated-10-gram trim runs over the survivors and materializes at the second (its output fans out to the iterating clustering loop, the selection LM, and the final join), and the near-dup clustering / DSIR-selection / shard-shuffle suffix consumes the TRIMMED text. Two stage writes, exactly the checkpoints a lake pipeline performs anyway; the dumped plan therefore starts from the second checkpointed scan.",
    "neardup_incremental" -> "Incremental near-dup dedup against the accumulated index: batch signatures and band buckets are map-side codegen projections; the index contributes its k-long signature relation (buckets re-derived map-side — co-located once the lake stores the bucket relation bucketed on (band, bucket)) and its shingle-hash arrays, equi-joined only for candidate ids. Candidates come from the (band, bucket) equi-join, verification is exact hash-set Jaccard over 8-byte xxhash64 arrays, and the within-batch stage reuses the banded self-join + active-set components. Per-batch exchange volume is O(batch + candidates); historical TEXT appears nowhere in the plan — the index relations carry hashes only.")

  /** Non-contract plans worth auditing: the scale variants and internal
    * stages that the contract queries don't expose directly. */
  private def extras(spark: org.apache.spark.sql.SparkSession, dir: String) = Seq(
    ("dedup_clusters_edges",
      "The edge-verify stage of near-dup clustering: candidate generation " +
        "is ONE shuffle of the exploded posting stream into the capped " +
        "native BoundedPostingList aggregate (df in [2, maxDf] falls out " +
        "of the list size — at most C(maxDf,2) pairs per shingle, a hot " +
        "shingle costs 8*(maxDf+1) buffer bytes then drops; all-pairs " +
        "structurally impossible), pairs expand from the tiny sorted " +
        "lists, and exact-Jaccard verification joins are bounded by the " +
        "candidate count. Every exchange carries 8-byte xxhash64 shingle " +
        "hashes, never strings; the hashed shingle arrays are computed " +
        "once and shared by explode and both verify sides through one " +
        "reused exchange (no localCheckpoint, no blocks).", {
      import graft.sources.Tables
      graft.llm.Cluster.rareShingleEdges(
        Tables.documents(spark, dir).select(
          org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("text")))
    }))

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("plan-dump", "8")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of headline queries\n\n")
    sb.append(s"Generated by `graft.PlanDump` against $dir. These are the\n")
    sb.append("plan shapes the scale design in SURVEY.md §5 promises; the\n")
    sb.append("PlanAuditSpec asserts the load-bearing properties on every test run.\n")
    Commentary.keys.toSeq.sorted.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      sb.append(s"\n## $name\n\n${Commentary(name)}\n\n```\n")
      sb.append(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
      sb.append("```\n")
    }
    extras(spark, dir).foreach { case (name, commentary, df) =>
      sb.append(s"\n## $name (non-contract scale variant)\n\n$commentary\n\n```\n")
      sb.append(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
      sb.append("```\n")
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println(s"[plandump] wrote PLANS.md (${sb.length} chars)")
    spark.stop()
  }
}
