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
}
