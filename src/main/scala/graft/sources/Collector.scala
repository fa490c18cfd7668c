package graft.sources

import scala.annotation.tailrec

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
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

  /** One settled funding event — the record the reference's (0-byte in this
    * snapshot) funding_events.py collector would stage: settlement
    * timestamp, realized rate, mark price at settlement. Shaped to feed
    * [[graft.operators.Funding.accrueOntoBars]] directly
    * (`funding_time_ms` is the pay timestamp, `rate` the per-period rate). */
  final case class FundingEvent(fundingTimeMs: Long, fundingRate: Double,
                                markPrice: Double)

  /** One open-interest snapshot — the record shape for the reference's
    * open_interest_snapshots.py collector (also 0-byte in the snapshot):
    * poll timestamp, outstanding contracts, and their notional value. */
  final case class OpenInterestSnap(timestampMs: Long, sumOpenInterest: Double,
                                    sumOpenInterestValue: Double)

  /** One premium-index m1 kline — the record the reference's
    * premium_index_m1.py collector (0-byte in the snapshot; shape follows
    * its sibling klines_m1.py pattern) would stage: the per-minute OHLC of
    * the perp-vs-index premium, the series funding rates derive from
    * ([[graft.operators.Funding.ratesFromPremiumIndex]]). No volume
    * fields — the premium index is a computed price, not a traded one. */
  final case class PremiumIndexKline(openTimeMs: Long, open: Double,
                                     high: Double, low: Double, close: Double)

  /** Fetch contract: (symbol, startTimeMs, limit) → up to `limit` klines
    * with openTimeMs >= startTimeMs, ascending; empty when nothing new.
    * Implementations wrap the REST endpoint; tests use fakes. */
  type Fetch = (String, Option[Long], Int) => Seq[Kline]

  /** The same fetch contract for an arbitrary record type: ascending by the
    * shape's event time, at most `limit` records at or after the requested
    * start. */
  type FetchOf[R] = (String, Option[Long], Int) => Seq[R]

  /** What makes a record type collectable: where its resume point lives,
    * which column partitions the staged lake, how to read its event time,
    * and how a fetched page becomes a DataFrame in the staged schema. The
    * poll loop itself — resume, paging, safe-lag, end-clip, append,
    * checkpoint advance, stop conditions — is shape-independent, so every
    * shape inherits the loop the kline CollectorSpec cases pin down. */
  final case class RecordShape[R](
      checkpointPrefix: String,
      legacyCheckpoint: Option[String],
      tsMsCol: String,
      timeMs: R => Long,
      toDf: (SparkSession, Seq[R], String) => DataFrame)

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

  /** Concurrent per-symbol collector threads serialize their lake writes
    * here: Hadoop's FileOutputCommitter stages every job under the SAME
    * `root/_temporary` dir, and one job's commit-cleanup deletes another
    * in-flight job's pending task files — concurrent appends to one output
    * path are not safe with vanilla parquet. The collector is one-driver by
    * design (the reference runs one poll loop per process,
    * klines_m1.py:175-210), so a JVM-wide lock is the correct scope; the
    * REST fetch — the actual bottleneck — stays fully concurrent.
    * Cross-PROCESS writers need a transactional table format with a commit
    * protocol (Delta/Iceberg), out of scope here. Also guards the
    * session-wide partitionOverwriteMode flip in [[mergeWriteMonths]]. */
  private val writeLock = new Object

  /** Run the collector loop for one symbol until a stop condition.
    * Returns what happened; the staged rows live under
    * `root/symbol=…/year=…/month=…` and the resume point under the lake's
    * checkpoint file. `nowMs` is a parameter (not a clock read) so runs are
    * deterministic and testable.
    *
    * Staging is AT-LEAST-ONCE: a crash between a page's append and its
    * checkpoint advance replays that page on resume (the reference's
    * timestamp+nonce staging parts have the same window,
    * klines_m1.py:136-146). Exactly-once comes from the canonical dedup
    * downstream — [[Lake.compact]] with
    * `dedupKeys = Seq("symbol", "open_time_ms")`, mirroring the
    * reference's drop_duplicates-on-compact (aggregate_tf.py:205). */
  def collect(spark: SparkSession, fetch: Fetch, symbol: String, root: String,
              nowMs: Long, startMs: Option[Long] = None,
              endMs: Option[Long] = None, safeLagMinutes: Int = 2,
              limit: Int = 1500, maxPages: Int = 10000,
              intervalMs: Long = 60000L): CollectReport =
    collectRecords(spark, fetch, klineShape(intervalMs), symbol, root, nowMs,
      startMs, endMs, safeLagMinutes, limit, maxPages)

  /** The shape-independent poll loop behind [[collect]]: resume from the
    * shape's per-symbol checkpoint (with one-time legacy-namespace
    * migration), page forward, clip at safe-lag/end, append each page as
    * month-partitioned staging, advance the checkpoint past the page's max
    * event time. Same at-least-once contract as [[collect]] — exactly-once
    * comes from [[Lake.compact]] dedup on (symbol, shape.tsMsCol). */
  def collectRecords[R](spark: SparkSession, fetch: FetchOf[R],
                        shape: RecordShape[R], symbol: String, root: String,
                        nowMs: Long, startMs: Option[Long] = None,
                        endMs: Option[Long] = None, safeLagMinutes: Int = 2,
                        limit: Int = 1500,
                        maxPages: Int = 10000): CollectReport = {
    val ckptTf = s"${shape.checkpointPrefix}_$symbol"
    val safeEndMs = nowMs - safeLagMinutes * 60000L
    var startTime: Option[Long] =
      Checkpoint.read(root, ckptTf).get(symbol)
        .orElse {
          // One-time migration from a pre-per-symbol shared namespace:
          // a lake written by an older collector holds its resume point in
          // the shared file; ignoring it would refetch the full history and
          // duplicate staging until the next compact.
          val legacy = shape.legacyCheckpoint
            .flatMap(ns => Checkpoint.read(root, ns).get(symbol))
          legacy.foreach(v =>
            Checkpoint.write(root, ckptTf, Map(symbol -> v)))
          legacy
        }
        .orElse(startMs)
    var pages = 0
    var rows = 0L
    var stop: Option[String] = None
    while (stop.isEmpty && pages < maxPages) {
      if (startTime.exists(_ > safeEndMs)) stop = Some("up_to_date")
      else if (endMs.exists(e => startTime.exists(_ > e))) stop = Some("end_reached")
      else {
        val page = fetch(symbol, startTime, limit)
        val kept = endMs.map(e => page.filter(shape.timeMs(_) <= e)).getOrElse(page)
        if (page.isEmpty) stop = Some("no_new_data")
        else if (kept.isEmpty) stop = Some("end_reached")
        else {
          val df = shape.toDf(spark, kept, symbol)
          // Append, never overwrite: staging accumulates pages exactly like
          // the reference's per-month append files (klines_m1.py:136-146).
          writeLock.synchronized {
            Lake.writePartitioned(df, root, tsMsCol = shape.tsMsCol,
              mode = SaveMode.Append)
          }
          pages += 1
          rows += kept.size
          val next = kept.map(shape.timeMs).max + 1
          startTime = Some(next)
          Checkpoint.write(root, ckptTf, Map(symbol -> next))
          if (kept.size < page.size) stop = Some("end_reached")
        }
      }
    }
    CollectReport(symbol, pages, rows, startTime,
      stop.getOrElse("max_pages"))
  }

  /** The m1-kline shape [[collect]] specializes: the reference collector's
    * own record type, checkpoint namespace, and staged schema. */
  def klineShape(intervalMs: Long = 60000L): RecordShape[Kline] =
    RecordShape[Kline]("collector_m1", Some("collector_m1"), "open_time_ms",
      _.openTimeMs, (s, page, sym) => pageToDf(s, page, sym, intervalMs))

  /** Funding-event collector shape: stages settled funding as
    * `(ts, rate, mark_price, funding_time_ms)` month partitions. The
    * reference's funding_events.py is 0 bytes in this snapshot, so the shape
    * matches the schema [[graft.operators.Funding]] consumes instead. */
  val fundingShape: RecordShape[FundingEvent] =
    RecordShape[FundingEvent]("collector_funding", None, "funding_time_ms",
      _.fundingTimeMs, (spark, page, sym) => {
        import spark.implicits._
        page.toDF().select(
          timestamp_millis(col("fundingTimeMs")).as("ts"),
          col("fundingRate").as("rate"),
          col("markPrice").as("mark_price"),
          col("fundingTimeMs").as("funding_time_ms"),
          lit("binance").as("exchange"),
          lit("um_futures").as("market"),
          lit(sym).as("symbol"))
      })

  /** Premium-index m1 collector shape (premium_index_m1.py, 0 bytes in the
    * snapshot — shape inferred from the klines_m1.py sibling pattern):
    * stages per-minute premium-index OHLC month partitions, open-time
    * keyed exactly like klines so safe-lag/resume behave identically. The
    * staged lake feeds [[graft.operators.Funding.ratesFromPremiumIndex]]
    * (settlement-window mean premium → periodic funding rate). */
  def premiumIndexShape(intervalMs: Long = 60000L): RecordShape[PremiumIndexKline] =
    RecordShape[PremiumIndexKline]("collector_premium_index", None,
      "open_time_ms", _.openTimeMs, (spark, page, sym) => {
        import spark.implicits._
        page.toDF().select(
          timestamp_millis(col("openTimeMs")).as("ts"),
          col("open"), col("high"), col("low"), col("close"),
          col("openTimeMs").as("open_time_ms"),
          (col("openTimeMs") + lit(intervalMs - 1)).as("close_time_ms"),
          lit("binance").as("exchange"),
          lit("um_futures").as("market"),
          lit(sym).as("symbol"))
      })

  /** Open-interest snapshot collector shape (open_interest_snapshots.py,
    * 0 bytes in the snapshot): poll-time keyed, so safe-lag applies the
    * same way as klines. */
  val openInterestShape: RecordShape[OpenInterestSnap] =
    RecordShape[OpenInterestSnap]("collector_oi", None, "snap_time_ms",
      _.timestampMs, (spark, page, sym) => {
        import spark.implicits._
        page.toDF().select(
          timestamp_millis(col("timestampMs")).as("ts"),
          col("sumOpenInterest").as("open_interest"),
          col("sumOpenInterestValue").as("open_interest_value"),
          col("timestampMs").as("snap_time_ms"),
          lit("binance").as("exchange"),
          lit("um_futures").as("market"),
          lit(sym).as("symbol"))
      })

  /** Repair an explicit [startMs, endMs] range: page through it in
    * limit-sized chunks, then merge-write the fetched rows into the lake —
    * incoming wins on (symbol, open_time_ms) collision, untouched months
    * untouched on disk (dynamic partition overwrite rewrites only the
    * months the repair landed in, the distributed equivalent of the
    * reference's per-month merged part-000 rewrite).
    *
    * Matches backfill_range.py:104-160: chunk advance is by time
    * (`chunkEnd + 1`), never by fetched max, so empty source segments —
    * exchange outages — are paged past instead of stalling the loop; the
    * resume checkpoint is NOT consulted or advanced (a repair must reach
    * ranges the checkpoint has already moved beyond).
    *
    * Driver memory is bounded: fetched rows merge-write into the lake
    * every `flushRows` (each flush rewrites only its own months), so a
    * multi-year repair never accumulates the whole range in the driver.
    * A maxPages-capped run reports `max_pages` with `nextStartTimeMs` at
    * the first unrepaired chunk, so the caller can resume — it is NOT
    * reported as complete. */
  def backfillRange(spark: SparkSession, fetch: Fetch, symbol: String,
                    root: String, startMs: Long, endMs: Long,
                    limit: Int = 1500, intervalMs: Long = 60000L,
                    maxPages: Int = 10000,
                    flushRows: Int = 1000000): CollectReport = {
    val stepMs = limit.toLong * intervalMs
    var cur = startMs
    var pages = 0
    var rows = 0L
    val buf = scala.collection.mutable.ArrayBuffer.empty[Kline]
    def flush(): Unit = if (buf.nonEmpty) {
      mergeWriteMonths(spark, buf.toSeq, symbol, root, intervalMs)
      rows += buf.size
      buf.clear()
    }
    while (cur <= endMs && pages < maxPages) {
      val chunkEnd = math.min(cur + stepMs - 1, endMs)
      val page = fetch(symbol, Some(cur), limit)
      val kept = page.filter(k => k.openTimeMs >= cur && k.openTimeMs <= chunkEnd)
      pages += 1
      buf ++= kept
      if (buf.size >= flushRows) flush()
      // stepMs assumes at most `limit` rows per chunk. If a FULL page still
      // hasn't reached chunkEnd, the source is denser than intervalMs (or
      // the caller passed the wrong interval) — keep paging INSIDE the
      // chunk from the last fetched row instead of silently skipping its
      // tail and reporting end_reached. Fetch contract (openTimeMs >= cur)
      // guarantees maxFetched >= cur, so the loop always advances.
      val maxFetched =
        if (page.isEmpty) Long.MinValue else page.map(_.openTimeMs).max
      cur =
        if (page.size >= limit && maxFetched < chunkEnd) maxFetched + 1
        else chunkEnd + 1
    }
    flush()
    val done = cur > endMs
    CollectReport(symbol, pages, rows,
      Some(if (done) endMs + 1 else cur),
      if (done) "end_reached" else "max_pages")
  }

  /** Merge one batch of fetched klines into the lake: incoming wins on
    * (symbol, open_time_ms); ONLY the months the batch lands in are read
    * (partition-pruned) and rewritten (dynamic partition overwrite) —
    * untouched months are never touched on disk, the distributed
    * equivalent of the reference's per-month merged part-000 rewrite. */
  private def mergeWriteMonths(spark: SparkSession, klines: Seq[Kline],
                               symbol: String, root: String,
                               intervalMs: Long): Unit = {
    val incoming = pageToDf(spark, klines, symbol, intervalMs)
    // The affected-month set MUST come from the same year()/month()
    // expressions (hence the same session timezone) that
    // [[Lake.writePartitioned]] partitions by. A driver-side Calendar pinned
    // to UTC disagrees with a non-UTC session near month boundaries, and a
    // month the write lands in but the merge never read would then be
    // REPLACED by only the incoming rows — silent data loss. Bounded
    // collect: one row per distinct month in the batch.
    val affected = incoming
      .select(year(timestamp_millis(col("open_time_ms"))).as("y"),
        month(timestamp_millis(col("open_time_ms"))).as("m"))
      .distinct().collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet
    val merged =
      if (lakeExists(spark, root)) {
        val monthPred = affected.toSeq.map { case (y, m) =>
          col("year") === y && col("month") === m
        }.reduce(_ || _)
        val existing = Lake.read(spark, root)
          .where(col("symbol") === symbol && monthPred)
          .drop("year", "month")
        Lake.mergeUpsert(existing, incoming, Seq("symbol", "open_time_ms"))
      } else incoming
    writeLock.synchronized {
      val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try Lake.writePartitioned(merged, root, tsMsCol = "open_time_ms")
      finally prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }

  private def lakeExists(spark: SparkSession, root: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(p) && fs.listStatus(p).exists(s =>
      s.getPath.getName.startsWith("symbol="))
  }

  /** A fetched page in the lake's staged-kline schema (klines_m1.py:109-129
    * column names). A page is at most `limit` rows (a REST response), so the
    * local-relation parallelize is the honest shape — the DISTRIBUTED side
    * is the lake it appends into and every operator that reads it back. */
  private def pageToDf(spark: SparkSession, page: Seq[Kline],
                       symbol: String, intervalMs: Long): DataFrame = {
    import spark.implicits._
    page.toDF()
      .select(
        timestamp_millis(col("openTimeMs")).as("ts"),
        col("open"), col("high"), col("low"), col("close"),
        col("volumeBase").as("volume_base"),
        col("volumeQuote").as("volume_quote"),
        col("nTrades").as("n_trades"),
        col("takerBuyBase").as("taker_buy_base"),
        col("takerBuyQuote").as("taker_buy_quote"),
        col("openTimeMs").as("open_time_ms"),
        (col("openTimeMs") + (intervalMs - 1L)).as("close_time_ms"),
        lit("binance").as("exchange"),
        lit("um_futures").as("market"),
        lit(symbol).as("symbol"))
  }
}
