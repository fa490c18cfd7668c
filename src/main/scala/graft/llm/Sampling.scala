package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
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
}
