package graft.llm

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units") — the tokenizer
  * step a pretraining pipeline runs between corpus curation and shard
  * packing. The published algorithm operates on a word-FREQUENCY table,
  * not the corpus: the single corpus-scale pass is [[wordCounts]] (one
  * explode + hash aggregation), after which every merge iteration runs
  * over the vocabulary-sized (word, cnt, syms) relation — still a
  * distributed frame (a web corpus has 10^8+ distinct words), but one
  * whose size never grows with corpus bytes.
  *
  * Scale: per merge iteration the plan is ONE pair-count hash aggregation
  * (map-side partial, vocabulary-keyed) + a LIMIT-1 driver pull of the
  * argmax pair (a single row — the merge decision IS driver state, like
  * every published BPE trainer) + one map-side fold rewriting the symbol
  * arrays. Lineage is truncated per iteration with an eager
  * localCheckpoint (the MLlib iterative-algorithm pattern; a cluster
  * deployment points `spark.checkpoint.dir` at reliable storage and uses
  * `checkpoint` for executor-loss tolerance). Nothing corpus-sized moves
  * after the first pass.
  */
object Bpe {

  /** End-of-word marker symbol (distinguishes word-final merges — "st" at
    * a word end is a different unit than "st" mid-word). */
  val EndOfWord = "</w>"

  /** The one corpus-scale pass: case-folded whitespace words to a
    * (word, cnt) frequency relation. */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(TextAnalysis.tokens(lower(trim(col(textCol)))))
        .as("word"))
      .where(col("word") =!= "")
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** Initial symbol split: each word becomes its characters plus the
    * [[EndOfWord]] marker, e.g. "low" -> [l, o, w, </w>]. */
  def initialSymbols(words: DataFrame, wordCol: String = "word"): DataFrame = {
    val w = col(wordCol)
    val chars = transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1)))
    words.withColumn("syms", concat(chars, array(lit(EndOfWord))))
  }

  /** Adjacent-pair frequencies over the symbol relation, weighted by word
    * count — the statistic each BPE iteration maximizes. One hash
    * aggregation; the pair explode is map-side. */
  def pairCounts(symWords: DataFrame): DataFrame = {
    val syms = col("syms")
    val pairs = when(size(syms) >= 2,
      transform(slice(syms, lit(1), size(syms) - 1),
        (s, i) => struct(s.as("l"), element_at(syms, i + 2).as("r"))))
      .otherwise(array().cast("array<struct<l:string,r:string>>"))
    symWords
      .select(col("cnt"), explode(pairs).as("p"))
      .groupBy(col("p.l").as("left_sym"), col("p.r").as("right_sym"))
      .agg(sum(col("cnt")).as("pair_count"))
  }

  /** The top-`k` initial adjacent-pair statistics with a deterministic
    * (count desc, left asc, right asc) rank — the first-iteration view a
    * tokenizer-training audit inspects, and the oracle-checkable exact
    * half of the trainer. */
  def pairStats(docs: DataFrame, k: Int = 100,
                textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("pair_count").desc,
      col("left_sym").asc, col("right_sym").asc)
    pairCounts(initialSymbols(wordCounts(docs, textCol)))
      .withColumn("pair_rank", row_number().over(w))
      .where(col("pair_rank") <= k)
      .select(col("pair_rank"), col("left_sym"), col("right_sym"),
        col("pair_count"))
  }

  /** One greedy left-to-right merge pass over a symbol array: every
    * non-overlapping adjacent (left, right) occurrence becomes the fused
    * symbol, exactly the in-iteration replace of the published algorithm
    * ("a a a" under merge (a,a) -> [aa, a] — the fused symbol does not
    * re-pair with the next token in the same pass). A pure `aggregate`
    * HOF fold: state = (emitted prefix, pending symbol). */
  def applyMerge(syms: Column, left: String, right: String): Column = {
    val merged = left + right
    val empty = array().cast("array<string>")
    val flush = (st: Column) =>
      when(st.getField("prev").isNull, st.getField("out"))
        .otherwise(concat(st.getField("out"), array(st.getField("prev"))))
    aggregate(
      syms,
      struct(empty.as("out"), lit(null).cast("string").as("prev")),
      (st, t) =>
        when(st.getField("prev") === lit(left) && t === lit(right),
          struct(concat(st.getField("out"), array(lit(merged))).as("out"),
            lit(null).cast("string").as("prev")))
          .otherwise(struct(flush(st).as("out"), t.as("prev"))),
      flush)
  }

  /** Learned merge table of `numMerges` rows: (merge_rank, left_sym,
    * right_sym, pair_count), rank in learning order. Ties break
    * deterministically (count desc, left asc, right asc) so training is
    * engine- and partitioning-stable. Stops early if no pair remains.
    * The returned table is the tokenizer artifact — KBs at any corpus
    * size (one row per merge). */
  def train(docs: DataFrame, numMerges: Int,
            textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    finalState(docs, numMerges, textCol) match { case (merges, vocab) =>
      vocab.unpersist()
      spark.createDataFrame(merges.toSeq)
        .toDF("merge_rank", "left_sym", "right_sym", "pair_count")
    }
  }

  /** [[train]] plus the post-training symbol relation (word, cnt, syms) —
    * the trainer's working state, exposed so tests can pin
    * encode-≡-training equivalence. Caller unpersists the frame. */
  private[graft] def finalState(docs: DataFrame, numMerges: Int,
                              textCol: String = "text")
      : (ArrayBuffer[(Int, String, String, Long)], DataFrame) = {
    var vocab = initialSymbols(wordCounts(docs, textCol))
      .localCheckpoint(true)
    val merges = ArrayBuffer.empty[(Int, String, String, Long)]
    var done = false
    var rank = 1
    while (rank <= numMerges && !done) {
      val top = pairCounts(vocab)
        .orderBy(col("pair_count").desc, col("left_sym").asc,
          col("right_sym").asc)
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += ((rank, l, r, c))
        val next = vocab.withColumn("syms", applyMerge(col("syms"), l, r))
          .localCheckpoint(true)
        vocab.unpersist()
        vocab = next
        rank += 1
      }
    }
    (merges, vocab)
  }

  /** [[train]] with the merge loop DRIVER-SIDE over the top-`maxWords`
    * word-frequency dict — the shape every published tokenizer trainer
    * (Sennrich's reference code, HuggingFace tokenizers, SentencePiece)
    * actually runs: the corpus-scale pass stays distributed (one explode +
    * hash aggregation), the loop operates on a BOUNDED artifact
    * (frequency-truncated vocabulary; truncation deterministic at
    * cnt desc, word asc — the tail it drops carries vanishing pair mass).
    * Merge iterations then cost microseconds instead of a Spark job each,
    * which matters when numMerges is the production 30k-50k. Identical to
    * [[train]] whenever the vocabulary fits `maxWords` (pinned in
    * BpeSpec); use [[train]] if the truncated tail must participate. */
  def trainBounded(docs: DataFrame, numMerges: Int, maxWords: Int = 1000000,
                   textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val dict = wordCounts(docs, textCol)
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var vocab: Map[Vector[String], Long] = dict
      .groupBy { case (w, _) =>
        w.map(_.toString).toVector :+ EndOfWord }
      .map { case (syms, ws) => syms -> ws.map(_._2).sum }
    val merges = ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + c
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        merges += ((rank, l, r, c))
        vocab = vocab.toSeq.map { case (syms, nW) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              out += l + r; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.result(), nW)
        }.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
        rank += 1
      }
    }
    spark.createDataFrame(merges.toSeq)
      .toDF("merge_rank", "left_sym", "right_sym", "pair_count")
  }

  /** Serving path: segment words with a LEARNED merge list — the fold
    * chain applies each merge in learning order (the exact published
    * encode rule). `merges` is the driver-local tokenizer artifact (KBs);
    * the per-row cost is |merges| interpreted array folds — fine for the
    * short symbol arrays words produce. Returns `wordCol` plus a `pieces`
    * array column. */
  def encode(words: DataFrame, merges: Seq[(String, String)],
             wordCol: String = "word"): DataFrame = {
    val seg = merges.foldLeft(
      concat(transform(sequence(lit(1), length(col(wordCol))),
        i => col(wordCol).substr(i, lit(1))), array(lit(EndOfWord)))) {
      case (syms, (l, r)) => applyMerge(syms, l, r)
    }
    words.withColumn("pieces", seg)
  }
}
