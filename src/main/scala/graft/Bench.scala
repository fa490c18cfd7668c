package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // reps > 1 => run each query `reps` times and report the MEDIAN, so a
    // contended measurement window can't fabricate per-query regressions
    // (driver-side bench noise produced 10-40x outliers on unmodified
    // trivial queries in past rounds)
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "1").toInt.max(1)
    val spark = GraftSession.configure(
        SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen/IO warm-up so the first timed query isn't charged for it
    try {
      spark.range(1000000L).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/events.parquet").limit(10).count()
    } catch { case _: Throwable => }
    // NaN = the run crashed; a time-to-failure must not pose as a timing
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      val dt = (System.nanoTime() - t0) / 1e9
      // block-manager hygiene between queries: one query's cached /
      // checkpointed blocks must not build memory pressure for the next
      try { GraftSession.releaseCache(spark) } catch { case _: Throwable => }
      if (ok) dt else Double.NaN
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val ts = Seq.fill(reps)(timeOnce(fn))
      // any crashed rep surfaces as -1 (JSON has no NaN); true median for
      // even reps is the mean of the two middle elements
      val med =
        if (ts.exists(_.isNaN)) -1.0
        else {
          val s = ts.sorted
          if (s.size % 2 == 1) s(s.size / 2)
          else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
        }
      name -> med
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","reps":$reps}""")
    spark.stop()
  }
}
