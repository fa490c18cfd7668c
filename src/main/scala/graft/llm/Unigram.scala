package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed unigram-LM tokenizer training (Kudo 2018, "Subword
  * Regularization" — the SentencePiece `--model_type=unigram` algorithm),
  * completing the tokenizer-training family beside [[Bpe]]: seed a piece
  * vocabulary from corpus substrings, run EM over the word-frequency
  * relation (hard/Viterbi EM — the E-step segments each distinct word
  * under the current piece probabilities, the M-step re-estimates them
  * from the segmentation counts), then prune to the target size keeping
  * single characters for coverage.
  *
  * Scale posture — the [[Bpe.trainBounded]] contract: the ONLY
  * corpus-scale pass is [[Bpe.wordCounts]] (one explode + hash
  * aggregation); seed-candidate counting is a second aggregation over the
  * VOCABULARY-sized word relation (substring explode is map-side, the
  * piece key is bounded by maxPieceLen × word bytes); the EM loop runs
  * driver-side over the frequency-truncated top-`maxWords` dict exactly
  * like every published trainer (SentencePiece itself EMs an in-memory
  * word-frequency table after one corpus pass). Nothing corpus-sized
  * moves after the first aggregation.
  *
  * Determinism: EM counts are Long sums of word frequencies (order-free),
  * probabilities derive from counts, and the Viterbi tie-break is fixed
  * (equal-cost paths prefer the longest piece, i.e. the smallest split
  * point), so training is bit-stable across partitionings and JVMs —
  * UnigramSpec pins it against an independent reference implementation.
  */
object Unigram {

  /** Seed-candidate piece frequencies: every substring of length
    * 1..`maxPieceLen` of every corpus word, weighted by word frequency ×
    * occurrence count — the suffix-substring seeding step (the published
    * trainer seeds from the suffix array; counting bounded-length
    * substrings is the same statistic computed relationally). Two
    * map-side explodes over the word relation + ONE hash aggregation on
    * the piece key. */
  def seedCandidates(docs: DataFrame, maxPieceLen: Int = 4,
                     textCol: String = "text"): DataFrame = {
    val wc = Bpe.wordCounts(docs, textCol)
    wc.select(col("word"), col("cnt"),
        explode(sequence(lit(0), length(col("word")) - 1)).as("i"))
      .select(col("cnt"), explode(transform(
        sequence(lit(1), least(lit(maxPieceLen), length(col("word")) - col("i"))),
        l => col("word").substr(col("i") + 1, l))).as("piece"))
      .groupBy(col("piece"))
      .agg(sum(col("cnt")).as("freq"))
  }

  /** The top-`k` seed candidates with a deterministic (freq desc, piece
    * asc) rank — the oracle-checkable exact half of the trainer, the
    * [[Bpe.pairStats]] counterpart. */
  def seedStats(docs: DataFrame, k: Int = 100, maxPieceLen: Int = 4,
                textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("freq").desc, col("piece").asc)
    seedCandidates(docs, maxPieceLen, textCol)
      .withColumn("seed_rank", row_number().over(w))
      .where(col("seed_rank") <= k)
      .select(col("seed_rank"), col("piece"), col("freq"))
  }

  /** Driver-side Viterbi segmentation of one word under piece costs
    * (-log p). Single-character costs floor at `unkCost` whether the
    * char is known or not (so a zero-probability char — -log 0 = ∞
    * inside the EM loop — can never make a word unsegmentable, and
    * unseen text always encodes); equal-cost paths keep the smallest
    * split point (longest piece). Shared by the EM loop and the spec's
    * encode-≡-training pin. */
  private[graft] def viterbiSegment(word: String,
                                    costs: collection.Map[String, Double],
                                    maxPieceLen: Int,
                                    unkCost: Double): Vector[String] = {
    val n = word.length
    if (n == 0) return Vector.empty
    val best = Array.fill(n + 1)(Double.PositiveInfinity)
    val back = Array.fill(n + 1)(-1)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        val piece = word.substring(j, i)
        val c =
          if (i - j == 1)
            math.min(costs.getOrElse(piece, unkCost), unkCost)
          else costs.getOrElse(piece, Double.PositiveInfinity)
        val cand = best(j) + c
        if (cand < best(i)) { best(i) = cand; back(i) = j }
        j += 1
      }
      i += 1
    }
    val out = List.newBuilder[String]
    val rev = List.newBuilder[(Int, Int)]
    var pos = n
    while (pos > 0) { val j = back(pos); rev += ((j, pos)); pos = j }
    rev.result().reverse.foreach { case (a, b) => out += word.substring(a, b) }
    out.result().toVector
  }

  /** Cost of an unknown single character: a fixed -ln(1e-10) floor, far
    * above any trained piece so known pieces always win, finite so
    * segmentation never fails on unseen text. */
  val UnkCost: Double = -math.log(1e-10)

  /** Train the unigram vocabulary. Returns one row per kept piece:
    * (rank, piece, logprob, em_count, is_char) with rank by
    * (em_count desc, piece asc), logprob the 0.1-smoothed final
    * log-probability, and every single character of the dict kept
    * regardless of count (the published coverage rule).
    *
    * `emIters` Viterbi-EM rounds over the bounded word dict; `seedSize`
    * caps the seed by (freq desc, piece asc); `vocabSize` is the final
    * size cap (chars always kept, the remainder filled by count). */
  def trainBounded(docs: DataFrame, vocabSize: Int = 200, emIters: Int = 2,
                   seedSize: Int = 1000, maxPieceLen: Int = 4,
                   maxWords: Int = 1000000,
                   textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val dict: Array[(String, Long)] = Bpe.wordCounts(docs, textCol)
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))

    // seed: substring frequencies over the dict (the distributed
    // seedCandidates statistic recomputed on the bounded pull so the EM
    // loop and the seed share one truncation), top seedSize ∪ all chars
    val candCounts = collection.mutable.Map.empty[String, Long]
    for ((w, c) <- dict; i <- 0 until w.length;
         l <- 1 to math.min(maxPieceLen, w.length - i))
      candCounts(w.substring(i, i + l)) =
        candCounts.getOrElse(w.substring(i, i + l), 0L) + c
    val chars: Set[String] =
      dict.iterator.flatMap(_._1.map(_.toString)).toSet
    val seed: Vector[(String, Long)] = {
      val ranked = candCounts.toVector.sortBy { case (p, f) => (-f, p) }
      val top = ranked.take(seedSize)
      val topSet = top.iterator.map(_._1).toSet
      top ++ ranked.filter { case (p, _) =>
        !topSet(p) && chars(p) }
    }

    // Viterbi (hard) EM: E-step segments each word under the current
    // probabilities, M-step re-estimates from Long segmentation counts
    var counts: Map[String, Long] = seed.toMap
    var iter = 0
    while (iter < emIters) {
      val total = counts.valuesIterator.sum.toDouble
      val costs: Map[String, Double] =
        counts.iterator.map { case (p, c) =>
          p -> -math.log(c / total) }.toMap
      val next = collection.mutable.Map.empty[String, Long]
      for ((w, c) <- dict;
           piece <- viterbiSegment(w, costs, maxPieceLen, UnkCost))
        next(piece) = next.getOrElse(piece, 0L) + c
      // chars stay in the model at count 0 even when longer pieces
      // absorb all their mass — the coverage floor
      counts = next.toMap ++
        chars.filterNot(next.contains).map(_ -> 0L)
      iter += 1
    }

    // prune: all chars + the best non-char pieces up to vocabSize
    val (charRows, restRows) = counts.toVector.partition(p => chars(p._1))
    val kept = (charRows ++ restRows.sortBy { case (p, c) => (-c, p) }
      .take(math.max(vocabSize - charRows.size, 0)))
      .sortBy { case (p, c) => (-c, p) }
    val total = kept.iterator.map(_._2).sum.toDouble
    val alpha = 0.1
    val rows = kept.zipWithIndex.map { case ((p, c), i) =>
      (i + 1, p, math.log((c + alpha) / (total + alpha * kept.size)),
        c, chars(p)) }
    spark.createDataFrame(rows)
      .toDF("rank", "piece", "logprob", "em_count", "is_char")
  }

  /** Serving path: Viterbi-segment a word column under a LEARNED
    * (piece → logprob) table, entirely in native column algebra (two
    * `aggregate` passes — forward costs, then path reconstruction — over
    * a broadcast map literal; the [[Selection.exportModel]] typedLit
    * posture, with the relation-join twin the natural web-scale
    * variant). Reproduces [[viterbiSegment]] bit-for-bit: identical
    * double expressions on both passes make the reconstruction's
    * equality test exact, and ties keep the smallest split point.
    * Unknown single characters cost [[UnkCost]]; returns `wordCol` plus
    * a `pieces` array column. */
  def encode(words: DataFrame, pieces: Map[String, Double],
             maxPieceLen: Int = 4,
             wordCol: String = "word"): DataFrame = {
    val costMap = typedLit(pieces.map { case (p, lp) => p -> -lp })
    val w = col(wordCol)
    val n = length(w)
    val INF = lit(Double.PositiveInfinity)
    def pieceCost(j: Column, i: Column): Column = {
      val c = element_at(costMap, w.substr(j + 1, i - j))
      when(i - j === 1, least(coalesce(c, lit(UnkCost)), lit(UnkCost)))
        .otherwise(coalesce(c, INF))
    }
    val best = aggregate(
      sequence(lit(1), greatest(n, lit(1))),
      array(lit(0.0)),
      (acc, i) => concat(acc, array(array_min(transform(
        sequence(greatest(i - maxPieceLen, lit(0)), i - 1),
        j => element_at(acc, j + 1) + pieceCost(j, i))))))
    val seg = aggregate(
      sequence(lit(1), greatest(n, lit(1))),
      struct(n.as("pos"), array().cast("array<string>").as("ps")),
      (acc, _) => {
        val pos = acc.getField("pos")
        val cands = transform(
          sequence(greatest(pos - maxPieceLen, lit(0)), pos - 1),
          j => struct((element_at(best, j + 1) + pieceCost(j, pos)).as("c"),
            j.as("j")))
        val jSel = array_min(transform(
          filter(cands, s => s.getField("c") === element_at(best, pos + 1)),
          s => s.getField("j")))
        when(pos <= 0, acc).otherwise(struct(
          jSel.as("pos"),
          concat(array(w.substr(jSel + 1, pos - jSel)),
            acc.getField("ps")).as("ps")))
      })
    words.withColumn("pieces",
      when(n < 1, array().cast("array<string>"))
        .otherwise(seg.getField("ps")))
  }
}
