package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus curation reporting — the "data card" aggregation a curation run
  * publishes alongside a training set: per source, how much text there is,
  * how duplicated it is, and what fraction survives the quality gates.
  * The numbers a mixture designer feeds back into
  * [[Sampling.mixture]]'s weights.
  */
object Curation {

  /** Per-source data card: doc/char/token volumes, exact-duplicate rate
    * (fraction of docs that are NOT the first occurrence of their
    * canonical fingerprint, corpus-wide — so cross-source copies count
    * against the copying source), and the Gopher-rule pass rate.
    *
    * One declarative plan: the per-doc metrics and rule flags are
    * map-side projections ([[TextAnalysis.gopherRules]]), duplicate
    * election is ONE hash aggregation on the md5 fingerprint plus an
    * equi-join back on the same key (the [[Dedup.exact]] shape), and the
    * card itself is a |sources|-row aggregation. Everything shuffles
    * O(docs) rows of (hash, id) — never text — and the final rollup is
    * map-side combined. */
  def dataCard(docs: DataFrame, sourceCol: String = "source",
               idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // null text counts as an EMPTY document (0 chars/tokens, fails every
    // gate, fingerprints with the empty-text group) — an audit must count
    // broken rows, not drop them: a null fingerprint would fall out of
    // the keeper equi-join and silently vanish from its source's card
    val coalesced = docs.withColumn(textCol, coalesce(col(textCol), lit("")))
    val withRules = TextAnalysis.gopherRules(coalesced, textCol)
      .withColumn("_fp", TextAnalysis.fingerprint(col(textCol)))
      .withColumn("_nc", length(col(textCol)).cast("long"))
    // keeper election via a window over the SAME frame (the exactSurvivors
    // shape) — an agg+self-join here would recompute the gopherRules + md5
    // projection once per side, two corpus scans for one report
    val wFp = org.apache.spark.sql.expressions.Window.partitionBy(col("_fp"))
    withRules
      .withColumn("_keep_id", min(col(idCol)).over(wFp))
      .withColumn("_is_dup", (col(idCol) =!= col("_keep_id")).cast("int"))
      .groupBy(col(sourceCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("_nc")).as("n_chars_total"),
        sum(col("n_words")).as("n_tokens_total"),
        round(avg(col("n_words")), 6).as("mean_tokens"),
        round(avg(col("_is_dup")), 6).as("dup_rate"),
        round(avg(col("pass_gopher")), 6).as("gopher_pass_rate"))
  }

  /** Pairwise source-divergence card: KL and Jensen-Shannon divergence
    * between the unigram token distributions of every source pair — the
    * classic corpus-comparison statistic (Kilgarriff 2001, "Comparing
    * corpora"), the quantitative half of mixture design: near-zero JS
    * pairs are redundant sources ([[Dedup.sourceOverlap]] is the doc-grain
    * complement), high-JS pairs are the diversity a temperature mixture
    * should preserve. Distributions are add-α smoothed over each PAIR's
    * union vocabulary (so both logs are finite and each smoothed
    * distribution sums to exactly 1 over the terms emitted — no
    * outside-vocabulary correction term). Emits per unordered pair:
    * union-vocab size, shared-vocab size, KL(a‖b), KL(b‖a), JS (base-2
    * bits, 6dp).
    *
    * Scale shape: ONE (source, token) count aggregation over the corpus
    * (8-byte-combinable, map-side partials), collapsed to token grain
    * with a ≤|sources| count map and PINNED (localCheckpoint) because two
    * consumers need it — the per-pair union-vocab sizes and the term sum;
    * the pair explosion is a broadcast of the |S|(|S|−1)/2-row pair list
    * against the token-grain relation (never corpus grain), and the
    * per-source totals / source list are bounded driver pulls like the
    * ANN codebooks. Token-grain blow-up is ≤ |pairs| — choose the
    * pair set, not the corpus, when |S| is large. */
  def sourceDivergence(docs: DataFrame, alpha: Double = 0.5,
                       sourceCol: String = "source",
                       textCol: String = "text"): DataFrame = {
    require(alpha > 0, "alpha must be > 0 (unsmoothed KL can be infinite)")
    val tok = docs.select(col(sourceCol).as("source"),
      explode(filter(TextAnalysis.tokens(lower(col(textCol))), t => t =!= ""))
        .as("token"))
    val ct = tok.groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("c"))
    // bounded driver pulls: the source list and per-source token totals
    // (|S| rows — the codebook posture, never corpus-grain)
    val totals = ct.groupBy(col("source")).agg(sum(col("c")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sources = totals.keys.toSeq.sorted
    require(sources.size >= 2, "sourceDivergence needs >= 2 sources")
    val pairs = for {
      i <- sources.indices; j <- (i + 1) until sources.size
    } yield (sources(i), sources(j))
    val spark = docs.sparkSession
    import spark.implicits._
    val pairsDf = pairs.toDF("src_a", "src_b")
    val totalMap = map(totals.toSeq.sortBy(_._1)
      .flatMap { case (s, n) => Seq(lit(s), lit(n)) }: _*)
    // token grain with the per-source count map; pinned once for its two
    // consumers (pair union-vocab sizes, then the term sum)
    val perTok = ct
      .groupBy(col("token"))
      .agg(map_from_entries(collect_list(struct(col("source"), col("c"))))
        .as("m"))
      .localCheckpoint()
    val pt = perTok.crossJoin(broadcast(pairsDf))
      .withColumn("c_a", coalesce(element_at(col("m"), col("src_a")), lit(0L)))
      .withColumn("c_b", coalesce(element_at(col("m"), col("src_b")), lit(0L)))
      .where(col("c_a") + col("c_b") > 0)
    val vab = pt.groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("v_union"),
        sum((col("c_a") > 0 && col("c_b") > 0).cast("long")).as("v_shared"))
    val terms = pt.join(broadcast(vab), Seq("src_a", "src_b"))
      .withColumn("_na", element_at(totalMap, col("src_a")))
      .withColumn("_nb", element_at(totalMap, col("src_b")))
      .withColumn("p_a", (col("c_a") + alpha) /
        (col("_na") + lit(alpha) * col("v_union")))
      .withColumn("p_b", (col("c_b") + alpha) /
        (col("_nb") + lit(alpha) * col("v_union")))
      .withColumn("p_m", (col("p_a") + col("p_b")) / 2)
    terms.groupBy(col("src_a"), col("src_b"))
      .agg(max(col("v_union")).as("v_union"),
        max(col("v_shared")).as("v_shared"),
        round(sum(col("p_a") * log2(col("p_a") / col("p_b"))), 6)
          .as("kl_ab"),
        round(sum(col("p_b") * log2(col("p_b") / col("p_a"))), 6)
          .as("kl_ba"),
        round(sum(col("p_a") * log2(col("p_a") / col("p_m")) / 2
          + col("p_b") * log2(col("p_b") / col("p_m")) / 2), 6)
          .as("js"))
  }
}
