package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.{Cluster, Dedup, Sampling, Selection, TextAnalysis}
import graft.sources.Tables

/** Dev-only stage-level timing probe for the capstone-family hot path
  * (round-17 optimization work): times each library stage on the same
  * inputs the capstones feed it, consumed via the noop sink, medians of
  * `reps`. NOT part of the shipped surface.
  *
  * Usage: runMain graft.OptProbe <sfDir> <reps> [stage,stage,...]
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").map(_.trim).toSet) else None
    val spark = GraftSession.local("opt-probe")
    spark.sparkContext.setLogLevel("WARN")

    def docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"),
      col("source"))

    // the v3 per-doc prefix (normalize -> gopher gate -> decontaminate)
    def prefix: DataFrame = {
      val d = docs
      val norm = d.withColumn("text", TextAnalysis.normalize(col("text")))
      val benchmark = norm.where(col("doc_id") % 10 === 0).select("doc_id", "text")
      val corpus = norm.where(col("doc_id") % 10 =!= 0)
      val gated = TextAnalysis.gopherRules(corpus)
        .where(col("pass_gopher") === 1).select("doc_id", "text", "source")
      val contaminated =
        Dedup.contaminationNgram(benchmark, gated.select("doc_id", "text"), n = 8)
          .where(col("share_frac") >= 0.3)
          .select(col("test_id").as("doc_id"))
      gated.join(contaminated, Seq("doc_id"), "left_anti")
    }

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val stages: Seq[(String, () => Unit)] = Seq(
      // A/B: the v3 prefix with `norm` stage-pinned once (normalize regex
      // runs 1x instead of 2x, at the cost of one materialization job)
      "prefix_pin_norm" -> (() => {
        val d = docs
        val norm = SparkEntry.stageBoundary(
          d.withColumn("text", TextAnalysis.normalize(col("text"))))
        val benchmark = norm.where(col("doc_id") % 10 === 0).select("doc_id", "text")
        val corpus = norm.where(col("doc_id") % 10 =!= 0)
        val gated = TextAnalysis.gopherRules(corpus)
          .where(col("pass_gopher") === 1).select("doc_id", "text", "source")
        val contaminated =
          Dedup.contaminationNgram(benchmark, gated.select("doc_id", "text"), n = 8)
            .where(col("share_frac") >= 0.3)
            .select(col("test_id").as("doc_id"))
        noop(gated.join(contaminated, Seq("doc_id"), "left_anti"))
      }),
      "norm_gopher" -> (() => noop(
        TextAnalysis.gopherRules(
          docs.withColumn("text", TextAnalysis.normalize(col("text"))))
          .where(col("pass_gopher") === 1).select("doc_id", "text"))),
      "prefix_full" -> (() => noop(prefix)),
      "span_dedup" -> (() => {
        val clean = SparkEntry.stageBoundary(prefix)
        noop(Dedup.spanDedup(clean.select("doc_id", "text"))
          .where(col("kept_text") =!= ""))
      }),
      "ngram_trim" -> (() => {
        val clean = SparkEntry.stageBoundary(prefix.select("doc_id", "text"))
        noop(Dedup.repeatedNgramTrim(clean, n = 10, minCount = 2))
      }),
      // HOF-twin A/B for the fused native gram-hash pass (same JVM)
      "ngram_trim_hof" -> (() => {
        val clean = SparkEntry.stageBoundary(prefix.select("doc_id", "text"))
        noop(Dedup.repeatedNgramTrimHashed(clean, 10, 2, "doc_id", "text",
          Some(g => org.apache.spark.sql.functions.xxhash64(g))))
      }),
      // long-doc twins: 16x self-concatenated text (≈2-3k tokens/doc) —
      // the per-position constant dominates here, not the fixed job cost
      "trim_long" -> (() => {
        val long = docs.select(col("doc_id"),
          concat_ws(" ", (0 until 16).map(_ => col("text")): _*).as("text"))
        noop(Dedup.repeatedNgramTrim(long, n = 10, minCount = 2))
      }),
      "trim_long_hof" -> (() => {
        val long = docs.select(col("doc_id"),
          concat_ws(" ", (0 until 16).map(_ => col("text")): _*).as("text"))
        noop(Dedup.repeatedNgramTrimHashed(long, 10, 2, "doc_id", "text",
          Some(g => org.apache.spark.sql.functions.xxhash64(g))))
      }),
      // trim WITHOUT the prefix pin cost: raw documents in, noop out
      "trim_raw" -> (() => noop(
        Dedup.repeatedNgramTrim(docs.select(col("doc_id"), col("text")),
          n = 10, minCount = 2))),
      "trim_raw_hof" -> (() => noop(
        Dedup.repeatedNgramTrimHashed(docs.select(col("doc_id"), col("text")),
          10, 2, "doc_id", "text",
          Some(g => org.apache.spark.sql.functions.xxhash64(g))))),
      "edges" -> (() => noop(
        Cluster.rareShingleEdges(docs.select(col("doc_id"), col("text"))))),
      "components" -> (() => {
        val e = Cluster.rareShingleEdges(docs.select(col("doc_id"), col("text")))
          .select("id1", "id2").localCheckpoint(true)
        val t0 = System.nanoTime()
        noop(Cluster.activeComponents(e))
        println(f"[probe]   components-only ${(System.nanoTime() - t0) / 1e9}%.3f")
      }),
      "neardup_clusters" -> (() => noop(
        Cluster.nearDupClusters(docs.select(col("doc_id"), col("text"))))),
      "importance_sample" -> (() => noop(
        Selection.importanceSample(docs,
          isTarget = col("source").isin("src0", "src1"), quantile = 0.5))),
      "lm_score" -> (() => noop(
        Selection.lmScore(docs, isTarget = col("source").isin("src0", "src1"),
          alpha = 0.1))),
      "shard_shuffle" -> (() => noop(
        Sampling.shardShuffle(docs, "doc_id", nShards = 4, seed = "v3"))),
      "full_v3" -> (() => noop(
        SparkEntry.queries("corpus_pipeline_v3")(spark, sfDir))),
      "full_v5" -> (() => noop(
        SparkEntry.queries("corpus_pipeline_v5")(spark, sfDir))),
      "full_ccnet" -> (() => noop(
        SparkEntry.queries("ccnet_pipeline")(spark, sfDir))),
      "full_neardup_inc" -> (() => noop(
        SparkEntry.queries("neardup_incremental")(spark, sfDir))),
      "full_perceptual_inc" -> (() => noop(
        SparkEntry.queries("perceptual_incremental")(spark, sfDir)))
    )

    val selected = stages.filter { case (n, _) => only.forall(_.contains(n)) }
    // warm-up pass
    selected.foreach { case (_, f) =>
      try f() catch { case e: Throwable => println(s"[probe] warm-up failed: $e") }
      GraftSession.releaseCache(spark)
    }
    selected.foreach { case (name, f) =>
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        f()
        val dt = (System.nanoTime() - t0) / 1e9
        GraftSession.releaseCache(spark)
        dt
      }.sorted
      val med = ts(ts.size / 2)
      println(f"[probe] $name%-22s median=$med%.3f  runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
