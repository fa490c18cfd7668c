package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.ExplainMode

/** Dev-only: dump `.explain("formatted")` for a list of contract keys into
  * a directory — the per-round optimization evidence files
  * (`plans/rNN/<key>_{before,after}.txt`).
  *
  * Usage: runMain graft.OptPlans <outDir> <suffix> <key,key,...> [sfDir]
  * e.g.   runMain graft.OptPlans plans/r17 before corpus_pipeline_v5,ccnet_pipeline
  */
object OptPlans {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val keys = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val dir = if (args.length > 3) args(3) else "/root/testdata/sf0.001"
    Files.createDirectories(outDir)
    val spark = GraftSession.local("opt-plans", "8")
    keys.foreach { k =>
      val df = SparkEntry.queries(k)(spark, dir)
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.writeString(outDir.resolve(s"${k}_$suffix.txt"), txt)
      println(s"[optplans] wrote ${k}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
