package graft

import org.apache.spark.sql.SparkSession

/** Dev-only config A/B probe (not part of the shipped library): times a
  * key subset under two session configs IN ONE JVM (paired measurement —
  * the verify recipe's rule that solo runs carry unshared JIT warm-up).
  *
  * Usage: runMain graft.PerfLab <sfDir> <reps> <key,key,...>
  *
  * Variant A = GraftSession.configure as shipped. Variant B = A +
  * `spark.sql.adaptive.coalescePartitions.parallelismFirst=false` (the
  * Spark-docs-recommended production setting: post-shuffle partitions
  * coalesce to the advisory SIZE rather than stopping at default
  * parallelism — at bench scale that's 1-2 tasks instead of 32 per
  * exchange; at cluster scale 64 MB partitions either way). A JVM-warmup
  * pass on the first key runs before either variant; variants run
  * interleaved per rep so neither collects all the page-cache/JIT luck. */
object PerfLab {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val keys = args(2).split(",").toSeq

    def timeKey(s: SparkSession, key: String): Double = {
      val t0 = System.nanoTime()
      // noop-format write, not count(): count() lets Catalyst prune the
      // final projections and eliminate the trailing orderBy sort, so the
      // A/B would time a REDUCED plan rather than the contract query the
      // gates execute (the verify harness materializes every output
      // column to parquet; noop is the same consumption shape minus IO)
      SparkEntry.queries(key)(s, sfDir)
        .write.format("noop").mode("overwrite").save()
      GraftSession.releaseCache(s)
      (System.nanoTime() - t0) / 1e9
    }

    // parallelismFirst is a runtime SQL conf, so both variants run inside
    // ONE context via s.conf.set — shared JIT/page-cache state, honest A/B
    val s = GraftSession.local("perflab")
    // warm-up: run every key once (JIT + codegen cache + page cache)
    keys.foreach(k => timeKey(s, k))

    val results = scala.collection.mutable.Map[(String, String), List[Double]]()
    (1 to reps).foreach { _ =>
      Seq("pfirst=true" -> "true", "pfirst=false" -> "false").foreach {
        case (label, v) =>
          s.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", v)
          keys.foreach { k =>
            val t = timeKey(s, k)
            results((label, k)) = t :: results.getOrElse((label, k), Nil)
          }
      }
    }
    def median(xs: List[Double]): Double = {
      val v = xs.sorted
      if (v.size % 2 == 1) v(v.size / 2)
      else (v(v.size / 2 - 1) + v(v.size / 2)) / 2
    }
    println("key,pfirst_true_median,pfirst_false_median,delta_pct")
    keys.foreach { k =>
      val a = median(results(("pfirst=true", k)))
      val b = median(results(("pfirst=false", k)))
      println(f"$k,$a%.3f,$b%.3f,${(b - a) / a * 100}%.1f")
    }
    val ta = keys.map(k => median(results(("pfirst=true", k)))).sum
    val tb = keys.map(k => median(results(("pfirst=false", k)))).sum
    println(f"TOTAL,$ta%.3f,$tb%.3f,${(tb - ta) / ta * 100}%.1f")
    s.stop()
  }
}
