package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextAnalysis.tokens

/** Distribution-based data selection: the two standard "score every raw
  * document against a small high-quality target corpus" recipes used to
  * curate pretraining mixtures, upstream of the sampling operators in
  * [[Sampling]] (reference: the corpus-cleaning scripts stop at heuristic
  * gates; these add the model-based selection stage a lake-scale training
  * pipeline runs after them).
  *
  *  - [[importanceWeight]] — DSIR-style n-gram importance weights
  *    (log p_target/p_raw under smoothed unigram LMs; "Data Selection for
  *    Language Models via Importance Resampling", Xie et al. 2023).
  *  - [[lmScore]] — CCNet-style LM quality scoring (per-doc cross-entropy /
  *    perplexity under an add-alpha bigram LM trained on the target corpus;
  *    "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
  *    Data", Wenzek et al. 2020 — KenLM swapped for a counts-based bigram
  *    model so the whole pipeline stays inside the engine).
  *
  * Both are two hash aggregations plus one equi-join on the token key:
  * per-doc token/bigram counts reduce map-side (O(distinct-per-doc) rows,
  * never raw text, past the first exchange), the LM count tables are
  * vocabulary-sized (broadcastable at any corpus scale — a web-scale
  * unigram/bigram table is GBs while the corpus is TBs), and the final
  * per-doc reduction is a combinable sum. Nothing is pairwise in documents
  * and no driver-side state exists, so both scale linearly in corpus size.
  */
object Selection {

  private def tokenCounts(docs: DataFrame, idCol: String, textCol: String) =
    docs.select(col(idCol), explode(tokens(lower(col(textCol)))).as("_w"))
      .groupBy(col(idCol), col("_w")).agg(count(lit(1)).as("_c"))

  /** DSIR importance weights: for every document, the log likelihood ratio
    * `sum_tokens ln(p_target(w) / p_raw(w))` under add-`alpha` smoothed
    * unigram distributions, where the target distribution is estimated from
    * the `isTarget` subset and the raw distribution from ALL of `docs`.
    * High `log_weight` marks documents that look like the target corpus;
    * resampling by these weights is the DSIR selection step (the provided
    * [[Sampling.hashBucket]] membership applied to a weight-derived keep
    * fraction). Smoothing uses the joint observed vocabulary, so every raw
    * token has mass under both distributions.
    *
    * Output: (idCol, n_tokens, log_weight, avg_log_weight), one row per
    * input document, `avg_log_weight` length-normalized for ranking docs of
    * different sizes on one scale.
    */
  def importanceWeight(docs: DataFrame, isTarget: Column, alpha: Double = 1.0,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    val base = docs.withColumn("_tgt", isTarget.cast("boolean"))
    // every exchange downstream carries the 8-byte token hash, never the
    // token string (the contamination_ngram tactic; collision odds over a
    // vocabulary are ~|V|^2/2^65 — immaterial, and deterministic)
    val tok = base
      .select(col(idCol), col("_tgt"),
        explode(tokens(lower(col(textCol)))).as("_w"))
      .select(col(idCol), col("_tgt"), xxhash64(col("_w")).as("_wh"))
    // ONE corpus-grain pass: the (doc, token) aggregation is the only
    // consumer of the token explode, and the vocabulary LM derives from
    // ITS output (Σ per-doc counts ≡ raw occurrence counts; _tgt is
    // doc-constant so first() is exact). Both LM consumers and the final
    // join hang off the same (id, _wh) exchange, so the expensive
    // tokenize/explode/hash map stage runs once and is served from
    // shuffle files (ReusedExchange) — previously the lm and perDoc
    // branches each re-ran it (guide §2.3: aggregate before you shuffle,
    // share the pass).
    val perDoc = tok.groupBy(col(idCol), col("_wh"))
      .agg(count(lit(1)).as("_c"), first(col("_tgt")).as("_tgt"))
    // one vocabulary-sized aggregation carries BOTH corpus counts
    val lm = perDoc.groupBy(col("_wh")).agg(
      sum(col("_c")).as("_cr"),
      sum(when(col("_tgt"), col("_c")).otherwise(0L)).as("_ct"))
    val totals = lm.agg(
      sum(col("_cr")).as("_nr"), sum(col("_ct")).as("_nt"),
      count(lit(1)).as("_v"))
    perDoc.drop("_tgt").join(lm, "_wh")
      .crossJoin(broadcast(totals))
      .withColumn("_llr", col("_c") *
        (log((col("_ct") + lit(alpha)) / (col("_nt") + lit(alpha) * col("_v"))) -
         log((col("_cr") + lit(alpha)) / (col("_nr") + lit(alpha) * col("_v")))))
      .groupBy(col(idCol))
      .agg(sum(col("_c")).as("n_tokens"),
        round(sum(col("_llr")), 6).as("log_weight"),
        round(sum(col("_llr")) / sum(col("_c")), 6).as("avg_log_weight"))
  }

  /** DSIR selection end to end: importance weights → a corpus-wide keep
    * threshold at the `quantile`-th percentile of the length-normalized
    * weight → a per-document keep verdict. The deterministic counterpart
    * of the paper's Gumbel-top-k resampling step: `kept = 1` marks the
    * target-like fraction of the corpus, reproducibly across engines.
    *
    * The threshold is ONE percentile scalar broadcast back over the weight
    * frame. `useApprox = false` (default) is exact: it buffers the
    * corpus's weight column in a single aggregation buffer — fine to ~1e8
    * docs and what the cross-engine oracle compares. `useApprox = true`
    * swaps in `approx_percentile` (bounded sketch buffer, combinable
    * map-side) — the lake-scale setting, shifting the cut by at most the
    * sketch's rank error; same exact/sketch ladder as
    * [[graft.operators.Stats.robustScale]]. */
  def importanceSample(docs: DataFrame, isTarget: Column,
                       quantile: Double = 0.75, alpha: Double = 1.0,
                       idCol: String = "doc_id",
                       textCol: String = "text",
                       useApprox: Boolean = false,
                       approxAccuracy: Int = 10000): DataFrame = {
    val w = importanceWeight(docs, isTarget, alpha, idCol, textCol)
    val thr = w.agg(
      (if (useApprox)
         expr(s"approx_percentile(avg_log_weight, $quantile, $approxAccuracy)")
       else expr(s"percentile(avg_log_weight, $quantile)")).as("_thr"))
    w.crossJoin(broadcast(thr))
      .select(col(idCol), col("avg_log_weight"),
        (col("avg_log_weight") >= col("_thr")).cast("int").as("kept"))
  }

  /** CCNet's head/middle/tail corpus split: per-doc perplexity terciles
    * (head = most target-like third). The published pipeline trains KenLM
    * on Wikipedia and buckets Common Crawl by perplexity exactly this way;
    * here the scorer is [[lmScore]] and the cuts are two percentile
    * scalars broadcast back over the score frame (same two-phase shape and
    * the same exact/approx ladder as [[importanceSample]]: the default
    * exact cut buffers the ppl column in one aggregation buffer, fine to
    * ~1e8 docs; `useApprox = true` bounds the buffer with an
    * approx_percentile sketch for lake-scale corpora, moving each cut by
    * at most the sketch's rank error). */
  def ccnetBuckets(docs: DataFrame, isTarget: Column, alpha: Double = 0.1,
                   idCol: String = "doc_id",
                   textCol: String = "text",
                   useApprox: Boolean = false,
                   approxAccuracy: Int = 10000): DataFrame = {
    val s = lmScore(docs, isTarget, alpha, idCol, textCol)
    val cuts =
      if (useApprox) s.agg(
        expr(s"approx_percentile(ppl, 1.0D / 3, $approxAccuracy)").as("_c1"),
        expr(s"approx_percentile(ppl, 2.0D / 3, $approxAccuracy)").as("_c2"))
      else s.agg(
        expr("percentile(ppl, 1.0D / 3)").as("_c1"),
        expr("percentile(ppl, 2.0D / 3)").as("_c2"))
    s.crossJoin(broadcast(cuts))
      .select(col(idCol), col("ppl"),
        when(col("ppl") <= col("_c1"), "head")
          .when(col("ppl") <= col("_c2"), "middle")
          .otherwise("tail").as("bucket"))
  }

  /** The train-batch half of the serve-stream split: the per-token
    * log-likelihood-ratio weights of [[importanceWeight]]'s smoothed
    * unigram model, exported as a driver-side map, plus the OOV weight
    * (the smoothing floor a token unseen in BOTH corpora receives).
    * `scoreStateless(docs, exportModel(corpus, target))` reproduces
    * `importanceWeight(corpus ∪ docs-seen-in-corpus, ...)` scores exactly
    * for in-vocabulary text and degrades to the floor for new tokens —
    * the standard model-serving contract.
    *
    * Scale: the model is vocabulary-sized (the thing that stays GBs while
    * the corpus grows to TBs); at web-scale vocabularies ship it as a
    * broadcast join relation instead of a plan literal — the scoring
    * algebra is identical. */
  def exportModel(docs: DataFrame, isTarget: Column, alpha: Double = 1.0,
                  textCol: String = "text"): (Map[String, Double], Double) = {
    val base = docs.withColumn("_tgt", isTarget.cast("boolean"))
    val tok = base.select(col("_tgt"),
      explode(tokens(lower(col(textCol)))).as("_w"))
    val lm = tok.groupBy(col("_w")).agg(
      count(lit(1)).as("_cr"),
      sum(when(col("_tgt"), 1L).otherwise(0L)).as("_ct"))
    val rows = lm.collect()
    val nr = rows.map(_.getAs[Long]("_cr")).sum.toDouble
    val nt = rows.map(_.getAs[Long]("_ct")).sum.toDouble
    val v = rows.length.toDouble
    def llr(ct: Double, cr: Double): Double =
      math.log((ct + alpha) / (nt + alpha * v)) -
        math.log((cr + alpha) / (nr + alpha * v))
    (rows.map(r => r.getAs[String]("_w") ->
      llr(r.getAs[Long]("_ct").toDouble, r.getAs[Long]("_cr").toDouble)).toMap,
      llr(0.0, 0.0))
  }

  /** The serve half: score any document frame against an exported model as
    * a STATELESS projection — a literal token→weight map lookup summed
    * over the token stream, no aggregation, no state, so the same call
    * runs unchanged on a batch frame and on a `readStream` frame (append
    * mode, no watermark; StreamingSpec asserts batch ≡ stream). This is
    * how the selection stage runs inside a streaming ingest pipeline:
    * train the model on yesterday's lake, score today's stream. */
  def scoreStateless(docs: DataFrame, model: Map[String, Double],
                     oovWeight: Double, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    val toks = tokens(lower(col(textCol)))
    val m = typedLit(model)
    docs.select(col(idCol), size(toks).as("n_tokens"),
      round(aggregate(
          transform(toks, w => coalesce(element_at(m, w), lit(oovWeight))),
          lit(0.0), (acc, x) => acc + x), 6).as("log_weight"))
  }

  /** [[exportModel]]'s distributed twin: the same per-token LLR weights as
    * a (token, weight) RELATION plus the OOV floor, with only three scalar
    * totals ever touching the driver. This is the web-scale-vocabulary
    * serving artifact: a multi-GB vocabulary cannot live inside a plan as
    * a `typedLit` map (codegen'd into the plan, shipped with every task,
    * resident on the driver), but it can be a frame — persisted to the
    * lake, joined against any corpus, broadcast by AQE only when it
    * actually fits. */
  def exportModelRelation(docs: DataFrame, isTarget: Column,
                          alpha: Double = 1.0,
                          textCol: String = "text"): (DataFrame, Double) = {
    val base = docs.withColumn("_tgt", isTarget.cast("boolean"))
    // cache() the vocabulary-sized count table: the totals collect below
    // and the returned relation both read it, and without the pin each
    // would re-run the corpus-wide token aggregation (two full passes).
    // Vocabulary-sized is the premise of the whole serving design — this
    // is the one frame that stays small while the corpus grows; lineage is
    // retained, so an evicted block recomputes instead of failing.
    val lm = base.select(col("_tgt"),
        explode(tokens(lower(col(textCol)))).as("_w"))
      .groupBy(col("_w")).agg(
        count(lit(1)).as("_cr"),
        sum(when(col("_tgt"), 1L).otherwise(0L)).as("_ct"))
      .cache()
    val t = lm.agg(sum(col("_cr")), sum(col("_ct")), count(lit(1))).collect()(0)
    val (nr, nt, v) = (t.getLong(0).toDouble, t.getLong(1).toDouble,
      t.getLong(2).toDouble)
    def llr(ct: Column, cr: Column): Column =
      log((ct + lit(alpha)) / lit(nt + alpha * v)) -
        log((cr + lit(alpha)) / lit(nr + alpha * v))
    val rel = lm.select(col("_w").as("token"),
      llr(col("_ct").cast("double"), col("_cr").cast("double")).as("weight"))
    val oov = math.log(alpha / (nt + alpha * v)) -
      math.log(alpha / (nr + alpha * v))
    (rel, oov)
  }

  /** The serve half against a RELATION model (see [[exportModelRelation]]):
    * token explode → equi-join on the token → per-doc sum. Numerically
    * identical to [[scoreStateless]] on the same model (SelectionSpec
    * pins the parity), but the vocabulary stays a distributed relation:
    * Catalyst broadcasts it when it fits and shuffle-joins when it
    * doesn't, so the path works at any vocabulary size. In a streaming
    * ingest this runs per micro-batch under `foreachBatch` (each doc
    * arrives exactly once, so per-batch sums are the per-doc totals —
    * StreamingSpec asserts stream ≡ batch); the projection-shaped
    * [[scoreStateless]] remains the zero-shuffle choice for small models.
    */
  def scoreWithRelation(docs: DataFrame, model: DataFrame,
                        oovWeight: Double, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    // pre-aggregate to (doc, token, count) BEFORE the model join: the join
    // carries one row per DISTINCT token per doc (not per occurrence), and
    // the per-doc sum is Σ count*weight — the same float-accumulation
    // shape as [[importanceWeight]], so the relation path shares its
    // cross-engine oracle behavior (occurrence-wise w+w+w addition differs
    // from c*w in the last ulp and can flip a round(.,6) boundary)
    val tk = docs.select(col(idCol),
      explode_outer(tokens(lower(col(textCol)))).as("_w"))
    val counts = tk.groupBy(col(idCol), col("_w"))
      .agg(count(col("_w")).as("_c"))
    counts
      .join(model.select(col("token").as("_w"), col("weight").as("_mw")),
        Seq("_w"), "left")
      .groupBy(col(idCol))
      .agg(
        sum(col("_c")).cast("int").as("n_tokens"),
        round(sum(when(col("_w").isNull, lit(0.0))
          .otherwise(col("_c") * coalesce(col("_mw"), lit(oovWeight)))), 6)
          .as("log_weight"))
  }

  /** CCNet-style LM quality score: per-document cross-entropy (mean negative
    * log probability, nats) and perplexity of the token stream under an
    * add-`alpha` bigram LM trained on the `isTarget` subset of `docs`.
    * `P(w2|w1) = (c(w1 w2) + alpha) / (c(w1) + alpha * (V+1))` with `V` the
    * target unigram vocabulary (+1 OOV bucket), so unseen contexts and
    * continuations degrade gracefully to the uniform floor. Only bigram
    * transitions are scored (`n_bigrams = n_tokens - 1`); single-token
    * documents are dropped, matching CCNet's behavior of not scoring empty
    * streams. Low perplexity = target-like; CCNet's head/middle/tail split
    * is a quantile cut over `ppl` downstream ([[graft.operators.Stats]]).
    */
  def lmScore(docs: DataFrame, isTarget: Column, alpha: Double = 0.1,
              idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val base = docs.withColumn("_tgt", isTarget.cast("boolean"))
    val toks = tokens(lower(col(textCol)))
    // (doc, bigram-hash, context-hash) stream; slice keeps the zip
    // pairwise-aligned, and every exchange downstream carries the 8-byte
    // hashes, never the token strings (the contamination_ngram tactic)
    val bg = base.select(col(idCol), col("_tgt"),
        explode(zip_with(
          slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
          slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
          (a, b) => struct(a.as("_w1"), b.as("_w2")))).as("_bg"))
      .select(col(idCol), col("_tgt"),
        xxhash64(col("_bg._w1"), col("_bg._w2")).as("_bh"),
        xxhash64(col("_bg._w1")).as("_uh"))
    // ONE corpus-grain pass: the (doc, bigram) aggregation is the only
    // consumer of the bigram explode; both LM count tables derive from its
    // (much smaller, doc-distinct-grain) output — Σ per-doc counts ≡ raw
    // occurrence counts, _uh/_tgt are group-constant so first() is exact.
    // All three consumers hang off the same (id, _bh) exchange, so the
    // tokenize/zip/explode/hash map stage runs once and is served from
    // shuffle files (ReusedExchange) — previously bigramLm, unigramLm and
    // perDoc each re-ran it (guide §2.3/2.4: share the pass; three
    // corpus-grain explodes → one).
    val perDoc = bg.groupBy(col(idCol), col("_bh"))
      .agg(count(lit(1)).as("_c"), first(col("_uh")).as("_uh"),
        first(col("_tgt")).as("_tgt"))
    val bigramLm = perDoc.where(col("_tgt"))
      .groupBy(col("_bh")).agg(sum(col("_c")).as("_c2"))
    // context counts = bigram positions sharing the context token: the
    // same quantity as summing _c2 over the context, one agg either way
    val unigramLm = perDoc.where(col("_tgt"))
      .groupBy(col("_uh")).agg(sum(col("_c")).as("_c1"))
    // vocab = distinct target unigrams incl. the final token of each doc
    // (the bigram stream misses a doc's last token, so this stays its own
    // TARGET-subset pass — the target side is the small one by design)
    val vocab = base.where(col("_tgt"))
      .select(explode(tokens(lower(col(textCol)))).as("_w"))
      .agg(countDistinct(col("_w")).as("_v"))
    perDoc.drop("_tgt")
      .join(bigramLm, Seq("_bh"), "left")
      .join(unigramLm, Seq("_uh"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("_nll", -col("_c") *
        log((coalesce(col("_c2"), lit(0L)) + lit(alpha)) /
            (coalesce(col("_c1"), lit(0L)) + lit(alpha) * (col("_v") + lit(1)))))
      .groupBy(col(idCol))
      .agg(sum(col("_c")).as("n_bigrams"),
        round(sum(col("_nll")) / sum(col("_c")), 6).as("cross_entropy"),
        round(exp(sum(col("_nll")) / sum(col("_c"))), 6).as("ppl"))
  }

  /** DoReMi domain-weight learning ("DoReMi: Optimizing Data Mixtures
    * Speeds Up Language Model Pretraining", Xie et al. 2023) — the
    * exponentiated-gradient loop that turns per-domain EXCESS LOSS (how
    * much worse the proxy model does than the reference on each domain)
    * into the domain mixture the main run trains on. Domains where the
    * proxy lags get up-weighted multiplicatively; the uniform-smoothing
    * term keeps every domain alive.
    *
    * Per published update, with α⁰ uniform over the S domains and
    * `excess_k = mean over domain docs of max(proxyLoss − refLoss, 0)`:
    *
    *   α′ = α_t ⊙ exp(η·excess);  α_{t+1} = (1−c)·α′/Σα′ + c/S
    *
    * (the full DoReMi re-trains the proxy between steps; this is the
    * engine half — the weight update over a fixed loss snapshot, the part
    * a data pipeline owns. With a static snapshot the loop still matters:
    * the smoothing term makes the fixpoint a genuine T-step iteration,
    * not a closed-form softmax.)
    *
    * Scale: the corpus appears only in the one per-domain mean-excess hash
    * aggregation; the T update steps are chained projections over that
    * |domains|-row frame (each normalization a window sum over dozens of
    * rows), so `steps` is free of corpus cost by construction. */
  def doremiWeights(df: DataFrame, domainCol: String, proxyLoss: Column,
                    refLoss: Column, steps: Int = 5, eta: Double = 1.0,
                    smoothing: Double = 0.1): DataFrame = {
    require(steps >= 0, "doremiWeights: steps must be >= 0")
    require(smoothing >= 0 && smoothing < 1,
      s"doremiWeights: smoothing must be in [0,1), got $smoothing")
    val all = org.apache.spark.sql.expressions.Window.partitionBy()
    val base = df.groupBy(col(domainCol))
      .agg(avg(greatest(proxyLoss - refLoss, lit(0.0))).as("excess_loss"))
    var cur = base.withColumn("weight",
      lit(1.0) / count(lit(1)).over(all))
    for (_ <- 1 to steps) {
      // log-sum-exp shift: exp(eta·excess) overflows to Inf past
      // eta·excess ≈ 709, turning every weight into NaN via Inf/Inf;
      // subtracting the max excess first leaves the normalized weights
      // mathematically unchanged and keeps the exponent ≤ 0
      cur = cur
        .withColumn("_u", col("weight") * exp(lit(eta) *
          (col("excess_loss") - max(col("excess_loss")).over(all))))
        .withColumn("weight",
          lit(1.0 - smoothing) * col("_u") / sum(col("_u")).over(all) +
            lit(smoothing) / count(lit(1)).over(all))
        .drop("_u")
    }
    cur.select(col(domainCol),
      round(col("excess_loss"), 6).as("excess_loss"),
      round(col("weight"), 6).as("weight"))
  }
}
