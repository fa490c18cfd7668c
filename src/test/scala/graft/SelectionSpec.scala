package graft

import org.apache.spark.sql.functions._

import graft.llm.Selection

/** Distribution-based data selection ([[graft.llm.Selection]]): DSIR
  * importance weights and the bigram-LM quality score, each checked against
  * an independent in-test reimplementation of the closed-form math on a
  * corpus small enough to reason about, plus the edge cases (single-token
  * docs, unseen contexts, target/raw separation direction). */
class SelectionSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "good clean text good", true),   // target
    (2L, "good text", true),              // target
    (3L, "spam junk spam junk", false),   // raw-only tokens
    (4L, "good clean", false),            // target-like raw doc
    (5L, "solo", false))                  // 1 token: no bigrams
    .toDF("doc_id", "text", "tgt")

  // closed-form reference: unigram counts with add-1 smoothing
  private def expectedImportance(): Map[Long, (Long, Double, Double)] = {
    val all = Seq(1L -> "good clean text good", 2L -> "good text",
      3L -> "spam junk spam junk", 4L -> "good clean", 5L -> "solo")
    val tgtIds = Set(1L, 2L)
    val rawToks = all.flatMap(_._2.split("\\s+"))
    val tgtToks = all.filter(d => tgtIds(d._1)).flatMap(_._2.split("\\s+"))
    val cr = rawToks.groupBy(identity).map { case (k, v) => k -> v.size }
    val ct = tgtToks.groupBy(identity).map { case (k, v) => k -> v.size }
    val (nr, nt, v) = (rawToks.size, tgtToks.size, cr.size)
    all.map { case (id, t) =>
      val toks = t.split("\\s+").toSeq
      val lw = toks.map { w =>
        math.log((ct.getOrElse(w, 0) + 1.0) / (nt + v)) -
          math.log((cr(w) + 1.0) / (nr + v))
      }.sum
      id -> ((toks.size.toLong,
        math.rint(lw * 1e6) / 1e6, math.rint(lw / toks.size * 1e6) / 1e6))
    }.toMap
  }

  test("importanceWeight matches the closed-form log-likelihood ratio") {
    val out = Selection.importanceWeight(docs, isTarget = col("tgt"))
      .orderBy("doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("log_weight"),
          r.getAs[Double]("avg_log_weight")))).toMap
    assert(out == expectedImportance())
  }

  test("importanceWeight separates target-like from raw-only documents") {
    val out = Selection.importanceWeight(docs, isTarget = col("tgt"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("avg_log_weight")).toMap
    assert(out(4L) > 0.0, "target-vocabulary doc should score positive")
    assert(out(3L) < 0.0, "raw-only-vocabulary doc should score negative")
    assert(out(4L) > out(3L) && out(1L) > out(3L))
  }

  test("importanceSample keeps exactly the docs at/above the quantile cut") {
    val weights = expectedImportance().map { case (id, (_, _, avg)) => id -> avg }
    // exact interpolated percentile over the 5 avg weights, like Spark's
    // percentile() and DuckDB's quantile_cont
    val sorted = weights.values.toSeq.sorted
    val pos = 0.75 * (sorted.size - 1)
    val (lo, g) = (pos.toInt, pos - pos.toInt)
    val thr = sorted(lo) * (1 - g) + sorted(lo + 1) * g
    val out = Selection.importanceSample(docs, isTarget = col("tgt"),
        quantile = 0.75)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("avg_log_weight"), r.getAs[Int]("kept")))).toMap
    assert(out.keySet == weights.keySet)
    weights.foreach { case (id, avg) =>
      assert(out(id) == ((avg, if (avg >= thr) 1 else 0)), s"doc $id")
    }
    // sanity: the cut keeps a strict, non-empty subset on this corpus
    val kept = out.values.count(_._2 == 1)
    assert(kept > 0 && kept < weights.size)
  }

  test("exportModel + scoreStateless reproduces importanceWeight in-vocabulary") {
    val (model, oov) = Selection.exportModel(docs, isTarget = col("tgt"))
    val scored = Selection.scoreStateless(docs, model, oov)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_tokens").toLong, r.getAs[Double]("log_weight")))).toMap
    val direct = Selection.importanceWeight(docs, isTarget = col("tgt"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("log_weight")))).toMap
    assert(scored == direct)
    // OOV floor: a doc of never-seen tokens scores n_tokens * oovWeight
    val fresh = Seq((99L, "zzz yyy xxx")).toDF("doc_id", "text")
    val f = Selection.scoreStateless(fresh, model, oov).collect()(0)
    assert(math.abs(f.getAs[Double]("log_weight") -
      math.rint(3 * oov * 1e6) / 1e6) < 1e-9)
  }

  // closed-form reference: add-alpha bigram LM trained on docs 1-2
  private def expectedLm(alpha: Double): Map[Long, (Long, Double)] = {
    val tgt = Seq("good clean text good", "good text")
    val bg = tgt.flatMap(t => t.split("\\s+").toSeq.sliding(2).map(p => (p(0), p(1))))
    val c2 = bg.groupBy(identity).map { case (k, v) => k -> v.size }
    val c1 = bg.groupBy(_._1).map { case (k, v) => k -> v.size }
    val v = tgt.flatMap(_.split("\\s+")).distinct.size
    val all = Seq(1L -> "good clean text good", 2L -> "good text",
      3L -> "spam junk spam junk", 4L -> "good clean")
    all.map { case (id, t) =>
      val pairs = t.split("\\s+").toSeq.sliding(2).map(p => (p(0), p(1))).toSeq
      val nll = pairs.map { p =>
        -math.log((c2.getOrElse(p, 0) + alpha) /
          (c1.getOrElse(p._1, 0) + alpha * (v + 1)))
      }.sum
      id -> ((pairs.size.toLong, math.rint(nll / pairs.size * 1e6) / 1e6))
    }.toMap
  }

  test("lmScore matches the closed-form bigram cross-entropy") {
    val out = Selection.lmScore(docs, isTarget = col("tgt"), alpha = 0.1)
      .orderBy("doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Double]("cross_entropy"))))
    assert(out.toMap == expectedLm(0.1))
    assert(!out.map(_._1).contains(5L), "single-token doc has no bigrams")
    val ce = out.toMap.map { case (k, v) => k -> v._2 }
    assert(ce(1L) < ce(3L), "target doc must have lower cross-entropy than junk")
  }

  test("ccnetBuckets cuts perplexity terciles with head = target-like") {
    val ppl = expectedLm(0.1).map { case (id, (_, ce)) => id -> math.exp(ce) }
    val sorted = ppl.values.toSeq.sorted
    // interpolated terciles over 4 values land exactly on the 2nd and 3rd
    val (c1, c2) = (sorted(1), sorted(2))
    val out = Selection.ccnetBuckets(docs, isTarget = col("tgt"), alpha = 0.1)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("bucket")).toMap
    ppl.foreach { case (id, p) =>
      val want = if (p <= c1 + 1e-9) "head"
        else if (p <= c2 + 1e-9) "middle" else "tail"
      assert(out(id) == want, s"doc $id ppl $p")
    }
    assert(out(1L) == "head" && out(3L) == "tail") // target doc vs junk doc
  }

  // a bigger deterministic corpus so rank-error bounds are meaningful:
  // 400 docs, ids 0..399, weight order follows the good/junk mix
  private def bigDocs = {
    val rows = (0L until 400L).map { i =>
      val good = "good clean text"
      val junk = "spam junk noise"
      val mix = (0 until 6).map(j =>
        if (((i * 7 + j * 3) % 11) < (i % 11)) junk else good).mkString(" ")
      // the per-doc token u<i> spreads weights/ppl across distinct values
      // so the tercile/quantile cuts don't land inside one giant tie
      (i, s"$mix u$i", i % 7 == 0)
    }
    rows.toDF("doc_id", "text", "tgt")
  }

  test("importanceSample useApprox tracks the exact cut within rank error") {
    val exact = Selection.importanceSample(bigDocs, isTarget = col("tgt"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("avg_log_weight"), r.getAs[Int]("kept")))).toMap
    val approx = Selection.importanceSample(bigDocs, isTarget = col("tgt"),
        useApprox = true)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("avg_log_weight"), r.getAs[Int]("kept")))).toMap
    assert(approx.keySet == exact.keySet)
    // weights identical (the ladder only changes the threshold)
    exact.foreach { case (id, (w, _)) => assert(approx(id)._1 == w, s"doc $id") }
    // both verdicts are upward-closed in the weight: no doc with a higher
    // weight than a kept doc can be dropped
    Seq(exact, approx).foreach { m =>
      val keptMin = m.values.collect { case (w, 1) => w }.min
      m.values.foreach { case (w, k) =>
        assert(k == 1 || w < keptMin, "threshold rule must be upward-closed")
      }
    }
    // accuracy 10000 on 400 rows bounds rank error below one row; the only
    // admissible drift is interpolation-vs-element at the cut itself, i.e.
    // at most the tie mass of one weight value
    val dExact = exact.values.count(_._2 == 1)
    val dApprox = approx.values.count(_._2 == 1)
    val maxTie = exact.values.groupBy(_._1).values.map(_.size).max
    assert(math.abs(dExact - dApprox) <= maxTie,
      s"exact kept $dExact vs approx kept $dApprox (maxTie $maxTie)")
  }

  test("ccnetBuckets useApprox keeps the tercile partition monotone") {
    val exact = Selection.ccnetBuckets(bigDocs, isTarget = col("tgt"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("ppl"),
        r.getAs[String]("bucket")))
    val approx = Selection.ccnetBuckets(bigDocs, isTarget = col("tgt"),
        useApprox = true)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("ppl"),
        r.getAs[String]("bucket")))
    assert(approx.map(_._1).toSet == exact.map(_._1).toSet)
    // the partition must be monotone in ppl for BOTH ladders: every head
    // ppl <= every middle ppl <= every tail ppl
    Seq(exact, approx).foreach { rows =>
      def of(b: String) = rows.filter(_._3 == b).map(_._2)
      val (h, m, t) = (of("head"), of("middle"), of("tail"))
      assert(h.nonEmpty && m.nonEmpty && t.nonEmpty)
      assert(h.max <= m.min && m.max <= t.min, "tercile partition not monotone")
    }
    // rank error below one row => bucket counts drift by at most the tie
    // mass at each cut
    val ce = exact.groupBy(_._3).view.mapValues(_.size).toMap
    val ca = approx.groupBy(_._3).view.mapValues(_.size).toMap
    val maxTie = exact.groupBy(_._2).values.map(_.size).max
    Seq("head", "middle", "tail").foreach { b =>
      assert(math.abs(ce(b) - ca(b)) <= maxTie, s"$b: $ce vs $ca")
    }
  }

  test("exportModelRelation + scoreWithRelation matches the typedLit path") {
    val (model, oov) = Selection.exportModel(docs, isTarget = col("tgt"))
    val (rel, oovR) = Selection.exportModelRelation(docs, isTarget = col("tgt"))
    assert(math.abs(oov - oovR) < 1e-12)
    // the relation holds exactly the exported vocabulary with equal weights
    val relMap = rel.collect().map(r =>
      r.getAs[String]("token") -> r.getAs[Double]("weight")).toMap
    assert(relMap.keySet == model.keySet)
    model.foreach { case (w, x) => assert(math.abs(relMap(w) - x) < 1e-12, w) }
    // serving parity, including an all-OOV doc
    val serveDocs = docs.select("doc_id", "text")
      .unionByName(Seq((99L, "zzz yyy xxx")).toDF("doc_id", "text"))
    val a = Selection.scoreStateless(serveDocs, model, oov)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_tokens"), r.getAs[Double]("log_weight")))).toMap
    val b = Selection.scoreWithRelation(serveDocs, rel, oovR)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_tokens"), r.getAs[Double]("log_weight")))).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (id, (n, lw)) =>
      assert(b(id)._1 == n, s"doc $id n_tokens")
      assert(math.abs(b(id)._2 - lw) <= 1.1e-6, s"doc $id: $lw vs ${b(id)._2}")
    }
  }

  test("lmScore ppl is exp(cross_entropy) and floors unseen contexts") {
    val out = Selection.lmScore(docs, isTarget = col("tgt"), alpha = 0.1)
      .collect()
    out.foreach { r =>
      val (ce, ppl) = (r.getAs[Double]("cross_entropy"), r.getAs[Double]("ppl"))
      assert(math.abs(ppl - math.exp(ce)) < 1e-3)
    }
    // doc 3's bigrams are all unseen: every transition gets the uniform
    // floor alpha/(alpha*(V+1)) = 1/(V+1), V=3 target unigrams -> ppl = 4
    val ppl3 = out.find(_.getAs[Long]("doc_id") == 3L).get.getAs[Double]("ppl")
    assert(math.abs(ppl3 - 4.0) < 1e-6)
  }
}
