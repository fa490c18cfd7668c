package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.TaskContext
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Cluster

/** In-JVM task-failure budget for fault injection: the first `budget` task
  * attempts that ask throw; retries (attemptNumber > 0) never throw. A
  * plain singleton is safe here because local-mode executors share the
  * test JVM. */
object FaultInjector {
  val injected = new AtomicInteger(0)
  private val budget = new AtomicInteger(0)
  def arm(n: Int): Unit = { budget.set(n); injected.set(0) }
  def maybeFail(): Unit =
    if (TaskContext.get() != null && TaskContext.get().attemptNumber() == 0 &&
        budget.getAndDecrement() > 0) {
      injected.incrementAndGet()
      throw new RuntimeException("injected task failure (FaultInjector)")
    } else budget.getAndUpdate(b => math.max(b, 0))
}

/** Demonstrates (not just argues) the fault-tolerance claim of the
  * pointer-jumping connected-components `reliable = true` mode: with task
  * retries enabled, injected first-attempt task failures in the edge scan
  * are retried and the checkpointed run completes with exactly the labels
  * of a clean run.
  *
  * Needs its own SparkSession because local-mode retry count comes from
  * the master string (`local[4, 2]` = 2 attempts per task); the shared
  * test session's `local[4]` fails the job on the first task failure.
  * Suites run sequentially in the forked test JVM, so stopping the shared
  * session here is safe — the next suite's getOrCreate builds a fresh
  * one. */
class FaultToleranceSpec extends AnyFunSuite {

  test("reliable CC survives injected task failures with identical labels") {
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.stop())
    val spark = GraftSession.configure(
        SparkSession.builder().appName("graft-fault").master("local[4, 2]"), "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      import spark.implicits._
      val ckptDir = Files.createTempDirectory(
        Paths.get("target"), "ckpt-cc").toString
      spark.sparkContext.setCheckpointDir(ckptDir)

      // 100 chains of 10 vertices: expected cluster label = block min
      val n = 1000
      val vertices = spark.range(n).select(col("id"))
      val edges = spark.range(n - 1).where(col("id") % 10 =!= 9)
        .select(col("id").as("id1"), (col("id") + 1).as("id2"))
      val expected = (0L until n).map(i => i -> (i / 10) * 10).toMap

      def labelsOf(e: org.apache.spark.sql.DataFrame): Map[Long, Long] =
        Cluster.connectedComponents(vertices, e, reliable = true)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

      val clean = labelsOf(edges)
      assert(clean == expected, "clean run disagrees with ground truth")

      // flaky edge scan: the first 3 first-attempt tasks that touch it
      // throw; local[4, 2] gives each task one retry, so the job survives
      FaultInjector.arm(3)
      val flaky = edges.as[(Long, Long)]
        .mapPartitions { it => FaultInjector.maybeFail(); it }
        .toDF("id1", "id2")
      val faulted = labelsOf(flaky)
      assert(FaultInjector.injected.get() >= 1,
        "no task failure was actually injected — the test proved nothing")
      assert(faulted == clean,
        "labels diverged between the clean and the fault-retried run")

      // the reliable path really went through the checkpoint dir
      val wrote = Files.walk(Paths.get(ckptDir)).count() > 1
      assert(wrote, s"no reliable checkpoint files under $ckptDir")
    } finally spark.stop()
  }
}
