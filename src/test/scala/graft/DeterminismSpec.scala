package graft

import org.apache.spark.sql.functions.col

/** Cross-partitioning determinism snapshots for the contract keys that run
  * rows-only in the driver's correctness gate (the `no_oracle` rows).
  *
  * For the five algorithmically deterministic ones — fixed hash seeds,
  * bounded deterministic codebook samples, and explicit tie-breaks — the
  * SAME query executed under a different `spark.sql.shuffle.partitions`
  * AND a different parquet input-split size must produce bit-identical
  * sorted output. Partitioning-invariance is the determinism evidence
  * standing in for a DuckDB oracle: any hidden dependence on partition
  * count, split packing, or merge order would break these snapshots.
  *
  * The other five rows-only keys legitimately cannot promise bit-identical
  * output across partitionings and are documented here instead of pinned:
  *  - `ml_filter`, `ml_regime_month`, `ml_regime_week` — LBFGS/GBT fits
  *    aggregate gradients tree-wise, so a different partition count changes
  *    the floating-point summation order (non-associativity) and the fitted
  *    coefficients can differ in the last ulps; their deterministic halves
  *    are already hash-checked as `ml_filter_frame` / `regime_frame` /
  *    `regime_frame_week`.
  *  - `quality_classifier`, `quality_serve` — the LR fit shares the LBFGS
  *    float-order caveat above; the deterministic training frame is
  *    oracle-hashed as `quality_labels`, and serving parity with the fit
  *    is pinned to 1e-9 in QualityClassifierSpec.
  *  - `keep_frac_sweep_sketch`, `robust_scale_approx` — approx_percentile
  *    is a mergeable sketch whose merge order follows partitioning by
  *    design, so a quantile boundary may shift to a neighboring value;
  *    their exact twins `keep_frac_sweep` / `robust_scale` are oracle-
  *    hashed.
  */
class DeterminismSpec extends SparkTestBase {

  private val deterministicKeys =
    Seq("minhash_lsh", "simhash", "embed_neardup", "ann_lsh", "ann_ivf",
      // round-9 continuation: seeded Bloom/CMS sketches, the hash-derived
      // JL matrix, and explicit tie-broken re-ranks are all partitioning-
      // independent by construction
      "contamination_bloom", "ngram_freq_sketch", "ann_topk_compressed",
      "ann_ivf_compressed",
      // round 10: min-id/min_by elections and min-label components are
      // partitioning-independent; jaccard verify is exact hash-set algebra
      "neardup_incremental",
      // PQ: codebooks train on the deterministic lowest-id sample and
      // encode/ADC rank with explicit (score, id) tie-breaks; BPE merges:
      // the argmax pair tie-breaks (count desc, left asc, right asc) and
      // the word-count relation is partitioning-independent
      "embed_pq", "ann_pq", "bpe_merges",
      // round 12: the slot signature is a min over seeded xxhash64 values
      // — a commutative/associative reduction, partitioning-independent —
      // and the HLL registers in the incremental state are per-bucket
      // maxima, equally order-independent
      "source_overlap_sketch", "source_overlap_incremental",
      // round 15: IVFADC composes the two codebooks above — both driver
      // artifacts off the lowest-id sample — with (score, id) tie-breaks
      "ann_ivf_pq")

  /** Execute a contract key and collect its rows under a deterministic
    * total order (all columns, left to right). */
  private def snapshot(key: String): Seq[Seq[Any]] = {
    val df = SparkEntry.queries(key)(spark, sfDir)
    rowsOf(df.orderBy(df.columns.toIndexedSeq.map(col): _*))
  }

  for (key <- deterministicKeys)
    test(s"$key: bit-identical under different shuffle partitioning and input splits") {
      val conf = spark.conf
      val p0 = conf.get("spark.sql.shuffle.partitions")
      val m0 = conf.get("spark.sql.files.maxPartitionBytes", "134217728")
      val o0 = conf.get("spark.sql.files.openCostInBytes", "4194304")
      val base = snapshot(key)
      assert(base.nonEmpty, s"$key returned no rows at $sfDir")
      try {
        // a prime shuffle width plus tiny splits: every exchange hashes to
        // different partitions and the parquet scan packs different splits
        conf.set("spark.sql.shuffle.partitions", "13")
        conf.set("spark.sql.files.maxPartitionBytes", "32768")
        conf.set("spark.sql.files.openCostInBytes", "0")
        val alt = snapshot(key)
        assert(alt == base,
          s"$key diverged across partitionings: " +
            s"base=${base.size} rows, alt=${alt.size} rows; " +
            s"firstDiff=${base.zip(alt).find { case (a, b) => a != b }}")
      } finally {
        conf.set("spark.sql.shuffle.partitions", p0)
        conf.set("spark.sql.files.maxPartitionBytes", m0)
        conf.set("spark.sql.files.openCostInBytes", o0)
      }
    }
}
