package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-dup clustering: candidate edges by rare-shingle blocking, then
  * connected components, then canonical-survivor selection — the step
  * between pair detection ([[MinHashLsh]], [[Dedup]]) and an actually
  * deduplicated corpus (a near-dup RELATION is not a PARTITION until its
  * transitive closure is taken).
  *
  * Candidate generation is an inverted-index self-join bounded by document
  * frequency: only shingles appearing in 2..maxDf documents join, so each
  * shingle contributes at most C(maxDf,2) pairs and the all-pairs cross
  * product is structurally impossible — the prefix/rare-token filtering
  * idea of the string-similarity-join literature (see PAPERS.md, ICDE 2022
  * compressed-index similarity joins). At 100 TB the DF table is itself a
  * one-shuffle aggregate and hot (stop-word-like) shingles are dropped by
  * the DF cap rather than salted.
  *
  * Components run as iterative min-label propagation ("hash-to-min"): each
  * round every vertex adopts the smallest label among itself and its
  * neighbors — two shuffles per round, rounds bounded by component
  * diameter (near-dup clusters are shallow; GraphFrames' connected
  * components uses the same large-star/small-star family). The driver sees
  * only a per-round changed-row COUNT, never data.
  */
object Cluster {

  /** Candidate near-dup edges (id1 < id2): documents sharing at least
    * `minCommon` rare shingles (document frequency in [2, maxDf]) whose
    * exact shingle Jaccard then clears `minJaccard`.
    *
    * The verify stage is what makes the edge set trustworthy: blocking
    * alone admits coincidental rare-shingle collisions (and on a
    * small-vocabulary corpus those chain clusters into one giant
    * component); verifying candidates with the exact similarity — a join
    * bounded by the candidate count, never all-pairs — is the standard
    * LSH-candidate → verify contract. Longer shingles (default n=5)
    * keep the blocking discriminative even when individual tokens repeat
    * across the corpus. */
  def rareShingleEdges(docs: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text", n: Int = 5,
                       maxDf: Int = 5, minCommon: Int = 2,
                       minJaccard: Double = 0.5): DataFrame = {
    // materialized once: per-doc shingle arrays feed the explode AND both
    // verify-join branches (native-expression work, no subexpression
    // sharing across join branches)
    val shArr = docs
      .select(col(idCol).as("_id"), Dedup.shingles(col(textCol), n).as("_sharr"))
      .localCheckpoint(true)
    val sh = shArr.select(col("_id"), explode(col("_sharr")).as("_sh"))
    val rare = sh.groupBy("_sh")
      .agg(count(lit(1)).as("_df"))
      .where(col("_df") >= 2 && col("_df") <= maxDf)
      .select("_sh")
    val r = sh.join(rare, "_sh")
    val cand = r.select(col("_sh"), col("_id").as("_ida"))
      .join(r.select(col("_sh"), col("_id").as("_idb")), "_sh")
      .where(col("_ida") < col("_idb"))
      .groupBy(col("_ida").as("id1"), col("_idb").as("id2"))
      .agg(count(lit(1)).as("n_common"))
      .where(col("n_common") >= minCommon)
    cand
      .join(shArr.select(col("_id").as("id1"), col("_sharr").as("_a")), "id1")
      .join(shArr.select(col("_id").as("id2"), col("_sharr").as("_b")), "id2")
      .withColumn("jaccard",
        size(array_intersect(col("_a"), col("_b"))).cast("double") /
          when(size(array_distinct(concat(col("_a"), col("_b")))) =!= 0,
            size(array_distinct(concat(col("_a"), col("_b"))))).cast("double"))
      .where(col("jaccard") >= minJaccard)
      .select("id1", "id2", "n_common", "jaccard")
  }

  /** Connected components over undirected edges: returns (id, cluster_id)
    * with cluster_id = the component's minimum vertex id. `maxIter` bounds
    * the propagation rounds (diameter of the largest component). */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
                          maxIter: Int = 20): DataFrame = {
    // localCheckpoint (eager) truncates lineage each round: the naive
    // labels-referenced-twice recurrence doubles the logical plan per
    // iteration (2^k nodes by round k — an OOM on the DRIVER long before
    // executors see load). Checkpointing pins each round's result as a new
    // leaf, so plan size stays O(1) per round — mandatory for any iterative
    // DataFrame algorithm at scale.
    val sym = edges.select(col("id1").as("_src"), col("id2").as("_dst"))
      .unionByName(edges.select(col("id2").as("_src"), col("id1").as("_dst")))
      .localCheckpoint(true)
    var labels = vertices.select(col("id"), col("id").as("cluster_id"))
      .localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val nbrMin = sym.join(labels, col("_src") === col("id"))
        .groupBy(col("_dst"))
        .agg(min(col("cluster_id")).as("_nbr"))
      val next = labels.join(nbrMin, col("id") === col("_dst"), "left")
        .select(col("id"), col("cluster_id").as("_old"),
          least(col("cluster_id"), coalesce(col("_nbr"), col("cluster_id")))
            .as("cluster_id"))
        .localCheckpoint(true)
      changed = next.where(col("cluster_id") =!= col("_old")).count()
      labels = next.select("id", "cluster_id")
      iter += 1
    }
    labels
  }

  /** Full near-dup clustering pass: blocking edges → components → cluster
    * sizes and canonical flag (survivor = min doc_id per cluster). */
  def nearDupClusters(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text", n: Int = 5,
                      maxDf: Int = 5, minCommon: Int = 2,
                      minJaccard: Double = 0.5): DataFrame = {
    val edges =
      rareShingleEdges(docs, idCol, textCol, n, maxDf, minCommon, minJaccard)
    val cc = connectedComponents(
      docs.select(col(idCol).as("id")), edges.select("id1", "id2"))
    val sizes = cc.groupBy(col("cluster_id").as("_cid"))
      .agg(count(lit(1)).as("cluster_size"))
    cc.join(sizes, col("cluster_id") === col("_cid"))
      .select(col("id").as(idCol), col("cluster_id"), col("cluster_size"),
        (col("id") === col("cluster_id")).cast("int").as("is_canonical"))
  }
}
