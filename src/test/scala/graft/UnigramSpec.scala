package graft

import org.apache.spark.sql.functions._

import graft.llm.{Bpe, Unigram}
import graft.sources.Tables

/** Unigram-LM tokenizer training (Kudo 2018 / SentencePiece): the bounded
  * trainer against an independent reference implementation, the
  * encode-≡-training equivalence of the native-column Viterbi, and
  * determinism across partitionings. The [[BpeSpec]] pattern. */
class UnigramSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs =
    Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))

  /** Independent reference unigram trainer: memoized recursive Viterbi
    * (vs the iterative array DP in the implementation), explicit
    * fold-based seed counting. Same published semantics: substring seed
    * (freq desc, piece asc, top seedSize ∪ chars), hard-EM, chars kept
    * at count 0, prune to vocabSize, 0.1-smoothed logprobs. */
  private def referenceUnigram(words: Seq[(String, Long)], vocabSize: Int,
                               emIters: Int, seedSize: Int, maxLen: Int)
      : Seq[(Int, String, Double, Long, Boolean)] = {
    val cand = words.foldLeft(Map.empty[String, Long]) { case (m0, (w, c)) =>
      (for (i <- 0 until w.length; l <- 1 to math.min(maxLen, w.length - i))
        yield w.substring(i, i + l))
        .foldLeft(m0)((m, p) => m.updated(p, m.getOrElse(p, 0L) + c))
    }
    val chars = words.flatMap(_._1.map(_.toString)).toSet
    val ranked = cand.toSeq.sortBy { case (p, f) => (-f, p) }
    val topSet = ranked.take(seedSize).map(_._1).toSet
    var counts: Map[String, Long] =
      (ranked.take(seedSize) ++
        ranked.filter(x => chars(x._1) && !topSet(x._1))).toMap

    def segment(w: String, costs: Map[String, Double]): Seq[String] = {
      val memo = collection.mutable.Map.empty[Int, (Double, Seq[String])]
      def go(upto: Int): (Double, Seq[String]) = {
        if (upto == 0) (0.0, Nil)
        else memo.get(upto) match {
          case Some(v) => v
          case None =>
            // iterate j ascending and keep strictly-better, so ties keep
            // the smallest split point, like the implementation
            var bestC = Double.PositiveInfinity
            var bestS: Seq[String] = Nil
            for (j <- math.max(0, upto - maxLen) until upto) {
              val piece = w.substring(j, upto)
              val pc =
                if (upto - j == 1)
                  math.min(costs.getOrElse(piece, Unigram.UnkCost),
                    Unigram.UnkCost)
                else costs.getOrElse(piece, Double.PositiveInfinity)
              val (cj, sj) = go(j)
              if (cj + pc < bestC) { bestC = cj + pc; bestS = sj :+ piece }
            }
            val v = (bestC, bestS)
            memo(upto) = v
            v
        }
      }
      go(w.length)._2
    }

    for (_ <- 0 until emIters) {
      val total = counts.values.sum.toDouble
      val costs = counts.map { case (p, c) => p -> -math.log(c / total) }
      val used = words.foldLeft(Map.empty[String, Long]) {
        case (m0, (w, c)) =>
          segment(w, costs).foldLeft(m0)((m, p) =>
            m.updated(p, m.getOrElse(p, 0L) + c))
      }
      counts = used ++ chars.filterNot(used.contains).map(_ -> 0L).toMap
    }
    val (cs, rest) = counts.toSeq.partition(x => chars(x._1))
    val kept = (cs ++ rest.sortBy { case (p, c) => (-c, p) }
      .take(math.max(vocabSize - cs.size, 0)))
      .sortBy { case (p, c) => (-c, p) }
    val total = kept.map(_._2).sum.toDouble
    kept.zipWithIndex.map { case ((p, c), i) =>
      (i + 1, p, math.log((c + 0.1) / (total + 0.1 * kept.size)), c,
        chars(p))
    }
  }

  test("trainBounded matches the independent reference on the corpus") {
    val words = Bpe.wordCounts(docs).as[(String, Long)].collect().toSeq
    val expected = referenceUnigram(words, vocabSize = 80, emIters = 2,
      seedSize = 400, maxLen = 4)
    val got = Unigram.trainBounded(docs, vocabSize = 80, emIters = 2,
        seedSize = 400, maxPieceLen = 4)
      .orderBy("rank")
      .as[(Int, String, Double, Long, Boolean)].collect().toSeq
    assert(got.size == expected.size)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._4 == e._4 && g._5 == e._5,
        s"\ngot:      $g\nexpected: $e")
      assert(math.abs(g._3 - e._3) < 1e-12, s"logprob drift: $g vs $e")
    }
  }

  test("hand corpus: whole frequent words become pieces, EM sharpens") {
    // "abab" dominates; the seed contains "abab", "aba", "ab", ... and
    // EM's Viterbi picks the longest piece, so the trained vocabulary
    // keeps "abab" with the full word mass and chars at 0
    val d = (1 to 40).map(i => (i.toLong, "abab"))
      .toDF("doc_id", "text")
    val v = Unigram.trainBounded(d, vocabSize = 6, emIters = 2,
        seedSize = 10, maxPieceLen = 4)
      .orderBy("rank")
      .as[(Int, String, Double, Long, Boolean)].collect()
    assert(v.head._2 == "abab" && v.head._4 == 40L)
    val charRows = v.filter(_._5)
    assert(charRows.map(_._2).toSet == Set("a", "b"))
    assert(charRows.forall(_._4 == 0L), "chars keep a coverage floor row")
    // the kept vocabulary is chars + the dominant piece only
    assert(v.forall(r => r._2 == "abab" || r._5))
  }

  test("seedStats equals a hand count on a tiny corpus") {
    val d = Seq((1L, "aa ab"), (2L, "aa")).toDF("doc_id", "text")
    // words: aa(2), ab(1); substrings maxLen 2:
    // aa: a,a,aa ; ab: a,b,ab  => a: 2*2+1*2? no — per word occurrences:
    // "aa" has a@0,a@1,aa@0 -> a:2,aa:1 per copy (freq 2) => a:4, aa:2
    // "ab" has a,b,ab (freq 1)                            => a:1, b:1, ab:1
    val got = Unigram.seedStats(d, k = 10, maxPieceLen = 2)
      .as[(Int, String, Long)].collect().toSeq
    assert(got == Seq((1, "a", 5L), (2, "aa", 2L), (3, "ab", 1L),
      (4, "b", 1L)))
  }

  test("encode reproduces the driver Viterbi under the trained model, " +
      "including unseen characters") {
    val model = Unigram.trainBounded(docs, vocabSize = 80, emIters = 2,
        seedSize = 400, maxPieceLen = 4)
      .select("piece", "logprob")
      .as[(String, Double)].collect().toMap
    val costs = model.map { case (p, lp) => p -> -lp }
    val words = Bpe.wordCounts(docs).select("word").as[String]
      .collect().toSeq :+ "zzqqxx7"   // unseen chars take the unk floor
    val got = Unigram.encode(words.toDF("word"), model, maxPieceLen = 4)
      .as[(String, Seq[String])].collect().toMap
    words.foreach { w =>
      val exp = Unigram.viterbiSegment(w, costs, 4, Unigram.UnkCost)
      assert(got(w) == exp, s"word '$w': ${got(w)} vs $exp")
      assert(got(w).mkString("") == w, s"segmentation must cover '$w'")
    }
  }

  test("encode handles the empty word and training is deterministic " +
      "across partitionings") {
    val e = Unigram.encode(Seq("", "ab").toDF("word"),
      Map("ab" -> -0.5), maxPieceLen = 2)
      .as[(String, Seq[String])].collect().toMap
    assert(e("") == Seq.empty && e("ab") == Seq("ab"))

    val a = Unigram.trainBounded(docs, vocabSize = 40, emIters = 1,
        seedSize = 200).orderBy("rank")
      .as[(Int, String, Double, Long, Boolean)].collect().toSeq
    val b = Unigram.trainBounded(docs.repartition(17), vocabSize = 40,
        emIters = 1, seedSize = 200).orderBy("rank")
      .as[(Int, String, Double, Long, Boolean)].collect().toSeq
    assert(a == b)
  }
}
