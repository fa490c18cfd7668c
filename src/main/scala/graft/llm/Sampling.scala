package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling / dataset mixing — the pass that turns
  * a cleaned corpus into a training mix ("20% of stratum A, 5% of B, all
  * of C").
  *
  * Spark's `sampleBy`/`sample` draw per-row randoms, so a task retry, a
  * repartition, or a re-run yields a DIFFERENT sample — unacceptable for a
  * training set that must be reproducible and auditable. Here membership is
  * a pure function of the row key: an md5-derived bucket in [0, buckets),
  * kept iff bucket < frac·buckets. Same rows selected on every engine,
  * every run, every partitioning (md5 rather than xxhash64 precisely
  * because every language/engine agrees on it — the standard recipe for
  * reproducible split/sample decisions in data pipelines).
  *
  * Scale: map-only — no shuffle, no RNG state; the filter sits directly on
  * the scan, composes with partition pruning, and sampling 1% of 100 TB
  * reads the data once and writes 1 TB.
  */
object Sampling {

  /** Deterministic bucket in [0, buckets): first 8 md5 hex digits of the
    * stringified key, parsed base-16. */
  def hashBucket(key: Column, buckets: Int = 10000): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Per-stratum deterministic sample: keep a row iff its stratum has an
    * entry in `fracs` and its hash bucket falls below frac·buckets.
    * Strata absent from `fracs` are dropped (mix weights are explicit). */
  def stratified(df: DataFrame, keyCol: String, stratumCol: String,
                 fracs: Map[String, Double], buckets: Int = 10000): DataFrame = {
    val fracExpr = fracs.toSeq.sortBy(_._1)
      .foldLeft(lit(null).cast("double")) { case (acc, (k, f)) =>
        when(col(stratumCol) === k, lit(f)).otherwise(acc)
      }
    df.withColumn("_frac", fracExpr)
      .where(col("_frac").isNotNull &&
        hashBucket(col(keyCol), buckets) < col("_frac") * buckets)
      .drop("_frac")
  }

  /** Mixture-TARGETED sampling — the data-mixture curation pass that sits
    * one level above [[stratified]]: the caller states target source
    * WEIGHTS and a target corpus SIZE, and the per-source keep fraction is
    * derived from the observed counts, `keep_s = min(1, w_s·T / n_s)` —
    * capped at 1 where a source lacks the mass its weight asks for (the
    * standard availability compromise: an under-provisioned source
    * contributes everything it has and the achieved mixture shifts
    * accordingly, rather than failing or resampling with replacement).
    * Membership then reuses [[stratified]]'s md5-bucket rule, so the
    * sample stays deterministic across runs, engines and partitionings.
    * Sources absent from `weights` are dropped.
    *
    * Scale: one tiny per-source count aggregation (|sources| rows) joined
    * to the literal weights and broadcast back onto the scan; the filter
    * itself is map-side — the 100 TB corpus is read once, never shuffled.
    * The kept rows carry `keep_frac` so downstream audits can recompute
    * the mixture. */
  def mixture(df: DataFrame, keyCol: String, sourceCol: String,
              weights: Map[String, Double], targetRows: Long,
              buckets: Int = 10000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val wdf = weights.toSeq.sortBy(_._1).toDF(sourceCol, "_w")
    val fracs = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("n_avail"))
      .join(wdf, sourceCol)
      .withColumn("keep_frac",
        least(lit(1.0), col("_w") * targetRows / col("n_avail")))
      .select(col(sourceCol), col("n_avail"), col("keep_frac"))
    df.join(broadcast(fracs), sourceCol)
      .where(hashBucket(col(keyCol), buckets) < col("keep_frac") * buckets)
  }

  /** UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer and More
    * Effective Language Sampling for Large-Scale Multilingual Pretraining")
    * — the pass that COMPUTES the mixture [[mixture]] consumes: given the
    * observed per-source token mass, a total training BUDGET, and a
    * per-source EPOCH CAP, allocate the budget as uniformly as possible
    * across sources without repeating any source more than `epochCap`
    * times. Temperature sampling needs a hand-tuned exponent and still
    * over-epochs tail sources; UniMax's waterfill is parameter-free: tiny
    * sources are fully consumed at the cap, and what remains is split
    * EQUALLY among the sources that can absorb it.
    *
    * The published algorithm is a sequential loop (ascending-capacity
    * scan, re-computing the fair share as each source saturates). Here it
    * is the closed form over rank windows: with capacities `c_i = epochCap
    * · tokens_i` sorted ascending, source i saturates iff even granting
    * ALL remaining sources `c_i` each still fits the budget —
    * `c_i·(S−i+1) + Σ_{j<i} c_j ≤ B`. That predicate is monotone in i
    * (`f(i+1)−f(i) = (S−i)(c_{i+1}−c_i) ≥ 0`), so the saturated set is a
    * prefix; everyone past it receives the common watermark
    * `(B − Σ_saturated c) / (S − K)`, which the prefix-failure inequality
    * guarantees is below their capacity.
    *
    * Output: one row per source with its token mass, capacity, allocated
    * tokens, implied epochs (≤ epochCap by construction), and mixture
    * share `mix_frac` — the weights a [[mixture]] call then realizes.
    *
    * Scale: the corpus appears only in the one per-source token-sum hash
    * aggregation (map-side partials, |sources| output rows); the waterfill
    * windows run on that |sources|-row frame, so the single-partition
    * `Window.partitionBy()` is over dozens of rows, never data. */
  def unimaxAlloc(df: DataFrame, sourceCol: String, tokenCol: Column,
                  budget: Double, epochCap: Double = 4.0): DataFrame = {
    require(budget > 0, s"unimaxAlloc: budget must be positive, got $budget")
    require(epochCap > 0, s"unimaxAlloc: epochCap must be positive, got $epochCap")
    val perSrc = df.groupBy(col(sourceCol))
      // coalesce: a source whose every token count is null sums to null —
      // treat it as zero mass so the waterfill stays total
      .agg(coalesce(sum(tokenCol).cast("double"), lit(0.0)).as("n_tokens"))
      .withColumn("capacity", col("n_tokens") * epochCap)
    // nulls-first pinned explicitly: Spark's asc default is NULLS FIRST but
    // ANSI engines (the DuckDB oracle) default to NULLS LAST — a null
    // source group must rank identically on both sides or the saturation
    // prefix shifts
    val ord = Window.partitionBy()
      .orderBy(col("capacity").asc_nulls_first, col(sourceCol).asc_nulls_first)
    val all = Window.partitionBy()
    perSrc
      .withColumn("_i", row_number().over(ord))
      .withColumn("_cum_prev", coalesce(
        sum(col("capacity"))
          .over(ord.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0.0)))
      .withColumn("_s", count(lit(1)).over(all))
      .withColumn("_sat",
        col("capacity") * (col("_s") - col("_i") + 1) + col("_cum_prev")
          <= budget)
      .withColumn("_k",
        sum(when(col("_sat"), 1L).otherwise(0L)).over(all))
      .withColumn("_sat_budget",
        sum(when(col("_sat"), col("capacity")).otherwise(0.0)).over(all))
      .withColumn("alloc_tokens",
        when(col("_sat"), col("capacity"))
          .otherwise((lit(budget) - col("_sat_budget")) /
            (col("_s") - col("_k"))))
      .select(col(sourceCol), col("n_tokens"), col("capacity"),
        round(col("alloc_tokens"), 6).as("alloc_tokens"),
        // a zero-mass source saturates at capacity 0; its epochs are 0 by
        // convention, not 0/0 = NaN
        round(when(col("n_tokens") > 0,
            col("alloc_tokens") / col("n_tokens"))
          .otherwise(0.0), 6).as("epochs"),
        round(col("alloc_tokens") / sum(col("alloc_tokens")).over(all), 6)
          .as("mix_frac"))
  }

  /** Cluster-balanced sampling — the diversity-preserving cap that
    * SemDeDup/DCLM-style pipelines run AFTER clustering: at most
    * `perCellCap` members survive per cluster cell, so giant topic blobs
    * (boilerplate clusters, SEO farms) stop dominating the mix while
    * small-topic cells keep everything they have. `assigned` is any
    * (key, cell) relation — [[graft.llm.Similarity.kmeansAssign]] output
    * composes directly.
    *
    * Within a cell, survivors are chosen by md5(key) rank (key tiebreak),
    * NOT arrival order — the same determinism contract as [[stratified]]:
    * identical survivors on every run, engine, and partitioning, and the
    * md5 rank is an unbiased uniform draw within the cell.
    *
    * Scale: one hash exchange on the cell key + a per-cell window; cells
    * are the parallel unit (k cells ≫ cores for corpus-scale k). A
    * pathological hot cell serializes its own sort only — the same
    * hot-cell profile as the clustering that produced the assignment, and
    * the cap bounds what survives it. */
  def clusterBalancedSample(assigned: DataFrame, keyCol: String,
                            cellCol: String, perCellCap: Int): DataFrame = {
    require(perCellCap > 0, s"clusterBalancedSample: cap must be positive")
    val w = Window.partitionBy(col(cellCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    assigned.withColumn("cell_rank", row_number().over(w))
      .where(col("cell_rank") <= perCellCap)
  }

  /** Deterministic global training-order shuffle + shard assignment — the
    * last step before shard egress: a trained model must NOT see the corpus
    * in ingestion order (source- and time-correlated batches destabilize
    * training), and the shuffled order must be REPRODUCIBLE so a resumed or
    * re-run job reads the identical sequence. Spark's `orderBy(rand())`
    * fails both (per-row RNG differs across retries); here the sort key is
    * `md5(seed ‖ ':' ‖ key)` — a pure row function, so the same rows land
    * in the same shard at the same position on every run, engine, and
    * partitioning, and changing `seed` is a fresh epoch-level reshuffle.
    *
    * Output: (key, shard, pos_in_shard) — shard from the key's top 32 hash
    * bits mod `nShards`, position by ascending hash within the shard
    * (key-tiebreak for determinism hygiene).
    *
    * CONTRACT: `keyCol` must be UNIQUE and NON-NULL (it is a document id).
    * Duplicate keys collide on the sort key, making their relative
    * positions partition-arrival-dependent — the exact nondeterminism
    * this operator exists to remove — and null keys all hash identically
    * (concat_ws drops nulls). Nulls fail fast via a per-row guard; key
    * uniqueness is the caller's id-column invariant (a full-corpus
    * distinct check would cost an extra shuffle per epoch).
    *
    * Scale: one hash-shuffle into `nShards` partitions and a per-shard
    * sort — no global ordering anywhere. A training run sizes nShards ≫
    * cores (thousands of shards for 100 TB), so the per-shard window IS
    * the parallel unit; the row_number buffer is one shard's keys. The
    * dual of [[graft.llm.TextAnalysis.packShards]]' stable-hash sharding:
    * packShards preserves doc order within a shard for budget packing,
    * shardShuffle randomizes it for training-batch decorrelation. */
  def shardShuffle(df: DataFrame, keyCol: String, nShards: Int,
                   seed: String = "shuffle"): DataFrame = {
    // null keys would all share md5(seed:) and shuffle nondeterministically
    // — raise per-row instead of silently corrupting the training order
    val checkedKey = when(col(keyCol).isNull,
        raise_error(lit(s"shardShuffle: null $keyCol — keys must be " +
          "unique non-null ids")))
      .otherwise(col(keyCol).cast("string"))
    val skey = md5(concat_ws(":", lit(seed), checkedKey))
    val w = Window.partitionBy("shard").orderBy(col("_skey"), col(keyCol))
    df.withColumn("_skey", skey)
      .withColumn("shard",
        (conv(substring(col("_skey"), 1, 8), 16, 10).cast("long") % nShards)
          .cast("int"))
      .withColumn("pos_in_shard", row_number().over(w).cast("long"))
      .drop("_skey")
  }

  /** Temperature-scaled source sampling weights — the multilingual /
    * multi-domain mixture rule (mBERT/XLM-R/mT5 exponential smoothing:
    * sample source s with probability `p_s^α / Σ p_j^α` where `p_s` is the
    * source's raw mass share and `α ∈ (0, 1]` flattens the distribution;
    * α = 1 is proportional sampling, α → 0 is uniform). Emits the mixture
    * audit per source: raw mass, raw share, temperature share, the
    * up/down-sampling factor vs raw, and the expected token allocation at
    * `budget`. Complements [[unimaxAlloc]] (hard epoch caps) and
    * [[graft.llm.Selection.doremiWeights]] (learned weights) as the third
    * standard mixture recipe.
    *
    * Scale: one hash aggregation to |sources| rows, then |sources|-local
    * window math — the corpus is touched once. */
  def temperatureWeights(df: DataFrame, sourceCol: String, massCol: Column,
                         alpha: Double, budget: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"temperatureWeights: alpha in (0,1], got $alpha")
    require(budget > 0, s"temperatureWeights: budget must be positive, got $budget")
    val all = Window.partitionBy()
    df.groupBy(col(sourceCol))
      .agg(coalesce(sum(massCol).cast("double"), lit(0.0)).as("n_tokens"))
      .withColumn("p_raw", col("n_tokens") / sum(col("n_tokens")).over(all))
      .withColumn("_pa", pow(col("p_raw"), alpha))
      .withColumn("p_temp", col("_pa") / sum(col("_pa")).over(all))
      .select(col(sourceCol), col("n_tokens").cast("long").as("n_tokens"),
        round(col("p_raw"), 6).as("p_raw"),
        round(col("p_temp"), 6).as("p_temp"),
        // a zero-mass source has p_raw = 0 ⇒ factor undefined (null)
        round(when(col("p_raw") > 0, col("p_temp") / col("p_raw")), 6)
          .as("upsample_factor"),
        round(col("p_temp") * budget, 2).as("expected_tokens"))
  }

  /** Per-stratum top-fraction keep — the adaptive-threshold curation rule
    * (FineWeb-style: rather than one global quality cutoff, keep the best
    * `frac` of EACH source/dump, so a high-quality source isn't starved by
    * a low-quality one sharing the same absolute bar). Ranking is on
    * (`score` desc, id asc) so ties at the boundary resolve identically on
    * every engine; a stratum with n rows keeps `ceil(frac·n)` (at least
    * one survivor per non-empty stratum). Emits kept rows with their
    * in-stratum rank and the stratum size for the audit trail.
    *
    * Scale: one shuffle on the stratum key + per-stratum sort — with
    * strata in the thousands (dumps × domains) the window IS the parallel
    * unit. When a single stratum dwarfs memory, swap the exact rank for a
    * `percentile_approx(score, 1−frac)` threshold + broadcast join (the
    * [[graft.operators.Stats.robustScale]] useApprox pattern); the exact
    * path is the oracle-checkable contract. */
  def topFractionPerStratum(df: DataFrame, stratumCol: String,
                            score: Column, frac: Double,
                            idCol: String = "doc_id"): DataFrame = {
    require(frac > 0 && frac <= 1, s"topFractionPerStratum: frac in (0,1], got $frac")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(score.desc, col(idCol).asc)
    val n = Window.partitionBy(col(stratumCol))
    df.withColumn("stratum_rank", row_number().over(w).cast("long"))
      .withColumn("n_stratum", count(lit(1)).over(n))
      .where(col("stratum_rank") <= ceil(lit(frac) * col("n_stratum")))
  }

  /** Weighted sampling WITHOUT replacement, exact-k (Efraimidis & Spirakis
    * 2006, "Weighted random sampling with a reservoir"): draw u_i ∈ (0, 1]
    * per row and keep the k rows with the largest u_i^(1/w_i) —
    * equivalently the largest ln(u_i)/w_i, the numerically-stable form
    * used here — which selects each row with probability proportional to
    * its weight among the remaining rows, the exact semantics of
    * sequential weighted draws. The curation use: "give me exactly k
    * documents, preferring high quality/length" without the availability
    * cap of [[mixture]] or the per-stratum quotas of [[stratified]].
    *
    * Determinism: u_i derives from md5(seed:key) (52 mantissa bits →
    * (0, 1], zero excluded so ln is finite), and the NUMERATOR ln(u) is
    * rounded to 9dp BEFORE the weight division, ties broken by id. The
    * rounding lives in u-space (ln(u) spans [-36, 0] whatever the
    * weights), so its absolute 1e-9 grid is always far below the key's
    * own spread and the division by w — IEEE-exact and bit-identical
    * across engines — preserves full relative resolution at ANY weight
    * scale. (The previous 6dp round of the QUOTIENT compressed large-
    * weight keys into a handful of grid values, letting the id tiebreak
    * — not the weights — decide elections: systematic low-id bias, the
    * round-14 ADVICE item.) The last-ulp ln() drift between libm
    * implementations cannot flip an election except at an exact 9dp
    * tie, where the id tiebreak decides.
    *
    * Scale: map-only key derivation + ONE distributed top-k (TakeOrdered:
    * per-partition heaps, never a global sort); non-positive weights
    * raise rather than silently skewing the draw. */
  def weightedSample(df: DataFrame, keyCol: String, weight: Column, k: Int,
                     seed: String = "ws"): DataFrame = {
    require(k > 0, "k must be positive")
    val checkedW = when(weight.isNull || weight <= 0,
        raise_error(lit("weightedSample: weights must be positive non-null")))
      .otherwise(weight.cast("double"))
    // 13 hex digits = 52 bits; +1 maps 0 → 2^-52, keeping u in (0, 1]
    val u = (conv(substring(md5(concat_ws(":", lit(seed),
        col(keyCol).cast("string"))), 1, 13), 16, 10).cast("double") + 1.0) /
      math.pow(2.0, 52)
    df.withColumn("sample_key", round(log(u), 9) / checkedW)
      .orderBy(col("sample_key").desc, col(keyCol).asc)
      .limit(k)
  }
}
