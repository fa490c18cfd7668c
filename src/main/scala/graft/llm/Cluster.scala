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
  * Components run as iterative min-label propagation ("hash-to-min") with a
  * POINTER-JUMPING step each round: every vertex first adopts the smallest
  * label among itself and its neighbors, then re-adopts its label's own
  * label (label ← label(label)). The jump keeps halving the remaining
  * label-chain depth, so rounds are O(log diameter) instead of O(diameter)
  * — a million-long chain converges in ~20 rounds, which is what makes a
  * fixed `maxIter` safe for real graphs (the same convergence class as
  * large-star/small-star). The driver sees only a per-round changed-row
  * COUNT, never data, and superseded rounds' checkpoint blocks are released
  * as the loop advances.
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
    // per-doc shingle arrays feed the explode AND both verify-join
    // branches. No materialization needed: the explicit repartition pins a
    // shuffle exchange that is canonically identical under all three
    // consumers, so exchange/stage reuse computes the shingles ONCE and
    // serves every reader from shuffle files. This replaces an eager
    // `localCheckpoint` — no job at construction time, no block-manager
    // residue, and fault-tolerant: an executor loss re-derives from the
    // parquet scan instead of killing the run (localCheckpoint's
    // non-replicated executor-local blocks could not promise that at
    // 1000-executor scale).
    val shArr = docs
      .select(col(idCol).as("_id"), Dedup.shingles(col(textCol), n).as("_sharr"))
      .repartition(col("_id"))
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
    * with cluster_id = the component's minimum vertex id.
    *
    * Each round: (1) min-label propagation — adopt the smallest label among
    * self and neighbors; (2) from the third round on, pointer jumping —
    * adopt the adopted label's own label (labels are always vertex ids, so
    * the lookup is a self-join). Jumping halves the remaining label-chain
    * depth, giving O(log diameter) rounds; `maxIter = 20` therefore covers
    * components up to ~2^17 in effective chain depth. The first two rounds
    * skip the jump: real near-dup graphs are shallow (clusters of 2-5
    * docs converge in two plain rounds), so the extra self-join would be
    * pure overhead on the common path — the jump engages exactly when
    * depth is demonstrated (the loop is still running). If the loop exits
    * unconverged, this THROWS rather than silently returning partial
    * labels — wrong cluster_ids poison every downstream dedup decision.
    *
    * Checkpointing (eager) truncates lineage each round: the naive
    * labels-referenced-twice recurrence doubles the logical plan per
    * iteration (2^k nodes by round k — an OOM on the DRIVER long before
    * executors see load). Pinning each round's result as a new leaf keeps
    * plan size O(1) per round — mandatory for iterative DataFrame
    * algorithms. `reliable = false` (default) uses `localCheckpoint`:
    * fastest, but blocks are non-replicated executor-local, so an executor
    * loss mid-propagation fails the job and it must be retried from the
    * start — acceptable for minutes-long runs. Set `reliable = true` (with
    * `spark.sparkContext.setCheckpointDir(...)`) to write rounds to
    * checkpoint-dir storage and survive executor loss — the right trade on
    * a long 1000-executor run. Superseded rounds are released eagerly
    * either way (blocks unpersisted / files left to the checkpoint dir's
    * lifecycle). */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
                          maxIter: Int = 20,
                          reliable: Boolean = false): DataFrame = {
    val spark = vertices.sparkSession
    if (reliable) require(spark.sparkContext.getCheckpointDir.isDefined,
      "reliable=true requires spark.sparkContext.setCheckpointDir(...)")
    def pin(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(eager = true) else df.localCheckpoint(true)
    def release(df: DataFrame): Unit =
      if (!reliable) org.apache.spark.sql.GraftBridge.releasePinned(df)

    // the symmetrized edge list is re-read every round — cache() (lineage
    // retained, so losing a block means recompute, not job failure)
    val sym = edges.select(col("id1").as("_src"), col("id2").as("_dst"))
      .unionByName(edges.select(col("id2").as("_src"), col("id1").as("_dst")))
      .cache()
    var labels = pin(vertices.select(col("id"), col("id").as("cluster_id")))
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val nbrMin = sym.join(labels, col("_src") === col("id"))
        .groupBy(col("_dst"))
        .agg(min(col("cluster_id")).as("_nbr"))
      // (1) min-label propagation over neighbors
      val prop = pin(labels.join(nbrMin, col("id") === col("_dst"), "left")
        .select(col("id"), col("cluster_id").as("_old"),
          least(col("cluster_id"), coalesce(col("_nbr"), col("cluster_id")))
            .as("_mid")))
      // (2) pointer jumping from round 3 on: label ← label(label); every
      // label is a vertex id present in prop, so the left lookup always
      // matches (coalesce is belt-and-braces)
      val next =
        if (iter < 2) prop
        else {
          val lut = prop.select(col("id").as("_lid"), col("_mid").as("_lmid"))
          val jumped = pin(prop.join(lut, col("_mid") === col("_lid"), "left")
            .select(col("id"), col("_old"),
              coalesce(col("_lmid"), col("_mid")).as("_mid")))
          release(prop)
          jumped
        }
      changed = next.where(col("_mid") =!= col("_old")).count()
      release(labels)
      labels = next.select(col("id"), col("_mid").as("cluster_id"))
      iter += 1
    }
    sym.unpersist(blocking = false)
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          s"($changed labels still changing); raise maxIter")
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
