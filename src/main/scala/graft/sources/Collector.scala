package graft.sources

import scala.annotation.tailrec

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The collector loop: the reference's REST poll-and-stage ingestion
  * (/root/reference/src/bfdl/collectors/klines_m1.py:31-210) re-expressed
  * with the network fetch behind a pluggable interface.
  *
  * Semantics matched one-for-one: resume from a per-symbol checkpoint
  * (`next_start_time_ms`), page forward by `startTime` with a fixed page
  * limit, never collect the trailing `safeLagMinutes` (unstable candles),
  * clip at an optional end timestamp, append each page as month-partition
  * staging parts, advance the checkpoint to max(open_time_ms)+1 after every
  * page, stop on up-to-date / end-reached / empty-page.
  *
  * What is deliberately different, and why:
  *  - The HTTP GET itself is a `Fetch` function value. The actual
  *    `/fapi/v1/klines` call is environment-specific and untestable in this
  *    sandbox, so — like the multimodal codec stubs — the I/O edge is
  *    injectable while ALL control flow (pagination, retry/backoff,
  *    checkpointing, staging layout) is real and tested against
  *    deterministic fakes.
  *  - Staging files need no timestamp+nonce anti-overwrite trick
  *    (klines_m1.py:136-146): Spark's parquet writer names part files
  *    uniquely per task attempt, so concurrent appends never collide.
  *  - Pages land via the distributed writer into the same
  *    symbol=/year=/month= layout the batch operators read
  *    ([[Lake.writePartitioned]]); many small page-files are expected and
  *    [[Lake.compact]] is the existing remedy, exactly like the
  *    reference's compact_months pass.
  */
object Collector {

  /** One kline in the reference's raw schema (klines_m1.py:109-129). */
  final case class Kline(openTimeMs: Long, open: Double, high: Double,
                         low: Double, close: Double, volumeBase: Double,
                         volumeQuote: Double, nTrades: Long,
                         takerBuyBase: Double, takerBuyQuote: Double)

  /** Fetch contract: (symbol, startTimeMs, limit) → up to `limit` klines
    * with openTimeMs >= startTimeMs, ascending; empty when nothing new.
    * Implementations wrap the REST endpoint; tests use fakes. */
  type Fetch = (String, Option[Long], Int) => Seq[Kline]

  /** Bounded retry with exponential backoff around a fetch — the transient
    * -failure handling a long-running poll needs (the reference's
    * raise_for_status + operator restart, made explicit). `sleep` is
    * injectable so tests run instantly. */
  def withRetry(fetch: Fetch, maxRetries: Int = 3, baseBackoffMs: Long = 200L,
                sleep: Long => Unit = Thread.sleep): Fetch =
    (symbol, startMs, limit) => {
      @tailrec def attempt(n: Int): Seq[Kline] =
        try fetch(symbol, startMs, limit)
        catch {
          case e: Exception if n < maxRetries =>
            sleep(baseBackoffMs << n) // 1x, 2x, 4x, ...
            attempt(n + 1)
          case e: Exception =>
            throw new RuntimeException(
              s"fetch failed after ${maxRetries + 1} attempts for $symbol " +
                s"startMs=$startMs", e)
        }
      attempt(0)
    }

  final case class CollectReport(symbol: String, pages: Int, rows: Long,
                                 nextStartTimeMs: Option[Long],
                                 stopReason: String)

  private val CheckpointTf = "collector_m1"

  /** Run the collector loop for one symbol until a stop condition.
    * Returns what happened; the staged rows live under
    * `root/symbol=…/year=…/month=…` and the resume point under the lake's
    * checkpoint file. `nowMs` is a parameter (not a clock read) so runs are
    * deterministic and testable. */
  def collect(spark: SparkSession, fetch: Fetch, symbol: String, root: String,
              nowMs: Long, startMs: Option[Long] = None,
              endMs: Option[Long] = None, safeLagMinutes: Int = 2,
              limit: Int = 1500, maxPages: Int = 10000): CollectReport = {
    val safeEndMs = nowMs - safeLagMinutes * 60000L
    var startTime: Option[Long] =
      Checkpoint.read(root, CheckpointTf).get(symbol).orElse(startMs)
    var pages = 0
    var rows = 0L
    var stop: Option[String] = None
    while (stop.isEmpty && pages < maxPages) {
      if (startTime.exists(_ > safeEndMs)) stop = Some("up_to_date")
      else if (endMs.exists(e => startTime.exists(_ > e))) stop = Some("end_reached")
      else {
        val page = fetch(symbol, startTime, limit)
        val kept = endMs.map(e => page.filter(_.openTimeMs <= e)).getOrElse(page)
        if (page.isEmpty) stop = Some("no_new_data")
        else if (kept.isEmpty) stop = Some("end_reached")
        else {
          writeStaging(spark, kept, symbol, root)
          pages += 1
          rows += kept.size
          val next = kept.map(_.openTimeMs).max + 1
          startTime = Some(next)
          Checkpoint.write(root, CheckpointTf,
            Checkpoint.read(root, CheckpointTf) + (symbol -> next))
          if (kept.size < page.size) stop = Some("end_reached")
        }
      }
    }
    CollectReport(symbol, pages, rows, startTime,
      stop.getOrElse("max_pages"))
  }

  /** One page → month-partitioned staging parts in the reference's raw
    * kline schema (plus the lake's partition columns). A page is at most
    * `limit` rows (a REST response), so the local-relation parallelize is
    * the honest shape — the DISTRIBUTED side is the lake it appends into
    * and every operator that reads it back. */
  private def writeStaging(spark: SparkSession, page: Seq[Kline],
                           symbol: String, root: String): Unit = {
    import spark.implicits._
    val df = page.toDF()
      .select(
        timestamp_millis(col("openTimeMs")).as("ts"),
        col("open"), col("high"), col("low"), col("close"),
        col("volumeBase").as("volume_base"),
        col("volumeQuote").as("volume_quote"),
        col("nTrades").as("n_trades"),
        col("takerBuyBase").as("taker_buy_base"),
        col("takerBuyQuote").as("taker_buy_quote"),
        col("openTimeMs").as("open_time_ms"),
        (col("openTimeMs") + 59999L).as("close_time_ms"),
        lit("binance").as("exchange"),
        lit("um_futures").as("market"),
        lit(symbol).as("symbol"))
    Lake.writePartitioned(df, root, tsMsCol = "open_time_ms")
  }
}
