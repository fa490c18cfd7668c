package graft

import org.apache.spark.sql.functions._

import graft.llm.Bpe
import graft.sources.Tables

/** BPE tokenizer training: the distributed trainer against an independent
  * driver-side reference implementation of the published algorithm
  * (Sennrich et al. 2016), plus encode-≡-training and determinism. */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs =
    Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))

  /** Pure-Scala reference BPE: word-frequency dict, per-iteration argmax
    * pair (count desc, left asc, right asc), greedy left-to-right
    * non-overlapping replace. Independent of the Spark implementation. */
  private def referenceBpe(words: Map[String, Long], numMerges: Int)
      : Seq[(Int, String, String, Long)] = {
    var vocab: Map[Vector[String], Long] = words.toSeq
      .groupBy { case (w, _) => w.map(_.toString).toVector :+ Bpe.EndOfWord }
      .map { case (syms, ws) => syms -> ws.map(_._2).sum }
    val out = Seq.newBuilder[(Int, String, String, Long)]
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
        out += ((rank, l, r, c))
        vocab = vocab.toSeq.map { case (syms, n) =>
          val merged = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              merged += l + r; i += 2
            } else { merged += syms(i); i += 1 }
          }
          (merged.result(), n)
        }.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
        rank += 1
      }
    }
    out.result()
  }

  test("train matches the driver-side reference algorithm on the corpus") {
    val words = Bpe.wordCounts(docs).as[(String, Long)].collect().toMap
    val expected = referenceBpe(words, numMerges = 10)
    val got = Bpe.train(docs, numMerges = 10)
      .orderBy("merge_rank")
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == expected, s"\ngot:      $got\nexpected: $expected")
  }

  test("train on the classic hand corpus learns the expected first merges") {
    // Sennrich-style toy: "newest" dominates, so the first merges fuse
    // its frequent suffix pairs; hand-checkable counts
    val d = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val m = Bpe.train(d, numMerges = 3)
      .orderBy("merge_rank")
      .as[(Int, String, String, Long)].collect().toSeq
    // est appears in newest(6) + widest(3): s+t=9, then es+t... first pair
    // by count: (e,s) 9, (s,t) 9, (t,</w>) 9 — tie breaks left asc: (e,s)
    assert(m(0) == ((1, "e", "s", 9L)), m.toString)
    assert(m(1) == ((2, "es", "t", 9L)), m.toString)
    assert(m(2) == ((3, "est", "</w>", 9L)), m.toString)
  }

  test("pairStats equals pairCounts of the initial symbols, ranked") {
    val stats = Bpe.pairStats(docs, k = 50).collect()
    assert(stats.length == 50)
    // ranks are 1..k with counts non-increasing
    val byRank = stats.sortBy(_.getInt(0))
    assert(byRank.map(_.getInt(0)).toSeq == (1 to 50))
    val cnts = byRank.map(_.getLong(3)).toSeq
    assert(cnts == cnts.sorted(Ordering[Long].reverse))
  }

  test("encode with the learned merges reproduces the training vocabulary") {
    val (merges, vocab) = Bpe.finalState(docs, numMerges = 8)
    try {
      val enc = Bpe.encode(vocab.select("word", "cnt"),
        merges.toSeq.map { case (_, l, r, _) => (l, r) })
      val diff = enc.withColumnRenamed("pieces", "enc_syms")
        .join(vocab.select(col("word"), col("syms")), "word")
        .where(not(col("enc_syms") === col("syms")))
      assert(diff.count() == 0)
    } finally vocab.unpersist()
  }

  test("greedy merge is non-overlapping: 'aaaa' under (a,a) -> [aa,aa]") {
    val d = Seq((1L, "aaaa b aaa")).toDF("doc_id", "text")
    val syms = Bpe.initialSymbols(Bpe.wordCounts(d))
      .withColumn("syms", Bpe.applyMerge(col("syms"), "a", "a"))
      .orderBy("word")
      .select("syms").as[Seq[String]].collect().toSeq
    assert(syms == Seq(
      Seq("aa", "a", "</w>"),       // aaa
      Seq("aa", "aa", "</w>"),      // aaaa
      Seq("b", "</w>")))            // b
  }

  test("trainBounded (the bounded-dict contract path) equals the " +
      "distributed loop when the vocabulary fits") {
    val a = Bpe.train(docs, numMerges = 10)
      .orderBy("merge_rank").collect().toSeq
    val b = Bpe.trainBounded(docs, numMerges = 10, maxWords = 1000000)
      .orderBy("merge_rank").collect().toSeq
    assert(a == b)
  }

  test("training is deterministic across partitionings") {
    val a = Bpe.train(docs.repartition(13), numMerges = 6)
      .orderBy("merge_rank").collect().toSeq
    val b = Bpe.train(docs.coalesce(1), numMerges = 6)
      .orderBy("merge_rank").collect().toSeq
    assert(a == b)
  }
}
