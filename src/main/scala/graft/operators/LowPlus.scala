package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Features

/** A half-open range-percentile interval [lo, hi) on the enrich percent
  * scale (0-100; the reference's 0-1 values × 100). Top-level (not nested
  * in the object) so the Spark encoder's generated code compiles — Janino
  * cannot instantiate private object-nested case classes. */
final case class Interval(lo: Double, hi: Double)

/** Encoder row for the broadcast LOW+ config table (top-level for codegen;
  * see [[Interval]]). */
final case class LowPlusCfgRow(config_id: String, allow_hours: Seq[Int],
                               dir_score_min: Double, bull_only: Boolean,
                               forbid_neutral: Boolean,
                               allow_iv: Seq[Interval],
                               block_iv: Seq[Interval])

/** LOW+ tradability enrichment: the reference's router override that allows
  * trading in LOW-volatility regimes when the range percentile is compressed
  * enough AND direction is ready.
  *
  * Reference: /root/reference/scripts/research/enrich_joined_low_plus.py:22-60
  * (`enrich`): low_plus flag, baseline market readiness (MID/HIGH vol),
  * direction readiness (non-neutral state + |score| >= min), baseline /
  * override / final tradability, the ADD delta, and the reason-code columns.
  * The direction score is the impulse-style signed score of
  * build_m15_direction_regime.py:383-410 (log-return impulse normalized by
  * rolling vol, quality-scaled by the efficiency ratio, tanh-squashed) in its
  * window-expressible form (no EWM smoothing — the gating consumes the sign
  * and magnitude, which the un-smoothed score already carries).
  *
  * Spark-first: the score and percentile ride the same per-symbol window
  * family as [[VolRegime]]; the gating itself is pure row-wise boolean
  * algebra — zero extra shuffles on top of the feature windows.
  */
object LowPlus {

  /** Adds dir_score / dir_state and the LOW+ gating columns to hour bars.
    *
    * @param th        LOW+ threshold on range_pctl (percent scale, 0-100)
    * @param dirAbsMin minimum |dir_score| for direction readiness
    */
  def enrich(bars: DataFrame, lookback: Int = 24, th: Double = 14.0,
             dirAbsMin: Double = 0.30, neutralBand: Double = 0.15,
             symbolCol: String = "symbol", tsCol: String = "bar_ts_ms"): DataFrame = {
    val w = Window.partitionBy(symbolCol).orderBy(tsCol)
    val lb = w.rowsBetween(-(lookback - 1), Window.currentRow)

    val withVol = VolRegime(bars, lookback = 48, pLow = 25.0, pHigh = 70.0)
    val withEr = Features.withEfficiencyRatio(withVol, lookback, symbolCol, tsCol)

    val ret1 = log(col("close") / lag(col("close"), 1).over(w))
    val retL = log(col("close") / lag(col("close"), lookback).over(w))
    val staged = withEr
      .withColumn("_ret1", ret1)
      .withColumn("_vol1",
        when(count(col("_ret1")).over(lb) === lookback,
          stddev_pop(col("_ret1")).over(lb)))
      .withColumn("_impulse",
        retL / (col("_vol1") * math.sqrt(lookback.toDouble) + lit(1e-9)))
      .withColumn("_raw", col("_impulse") * (lit(0.5) + lit(0.5) * col("er")))

    // tanh via Spark's builtin; the oracle uses the saturated exp identity
    val scored = staged.withColumn("dir_score", tanh(col("_raw")))
      .withColumn("dir_state",
        when(col("dir_score").isNull, "NEUTRAL")
          .when(col("dir_score") >= neutralBand, "BULL")
          .when(col("dir_score") <= -neutralBand, "BEAR")
          .otherwise("NEUTRAL"))

    scored
      .withColumn("low_plus",
        coalesce(col("range_pctl") <= th, lit(false)))
      .withColumn("market_ready_base",
        coalesce(col("vol_state").isin("MID", "HIGH"), lit(false)))
      .withColumn("dir_ready",
        col("dir_state") =!= "NEUTRAL" &&
          abs(coalesce(col("dir_score"), lit(0.0))) >= dirAbsMin)
      .withColumn("tradable_base", col("market_ready_base") && col("dir_ready"))
      .withColumn("tradable_override", col("low_plus") && col("dir_ready"))
      .withColumn("tradable_final", col("tradable_base") || col("tradable_override"))
      .withColumn("is_add", col("tradable_override") && !col("tradable_base"))
      .withColumn("override_reason",
        when(col("low_plus") && col("dir_ready"), "LOW_PLUS_AND_DIR_READY")
          .when(col("low_plus") && !col("dir_ready"), "LOW_PLUS_BUT_DIR_NOT_READY")
          .otherwise(""))
      .withColumn("block_reason_base",
        when(!col("dir_ready"), "DIR_NOT_READY")
          .when(col("dir_ready") && !col("market_ready_base"), "VOL_BLOCKED_BASE")
          .otherwise(""))
      .drop("_ret1", "_vol1", "_impulse", "_raw")
  }

  /** Call-site alias so `LowPlus.Interval(lo, hi)` keeps working with the
    * top-level [[graft.operators.Interval]]. */
  val Interval = graft.operators.Interval

  /** One LOW+ override policy (router_low_plus_sweep.py:20-33
    * `LowPlusConfig`): UTC-hour allow-set, signed direction-score floor
    * (the reference gates on `dir_score >= min`, bull-biased — NOT the
    * |score| readiness of [[enrich]]), side restriction, and allow/block
    * interval UNIONS over the range percentile. */
  final case class LowPlusConfig(
      configId: String,
      allowHoursUtc: Seq[Int] = Seq(2, 4, 11, 13, 17),
      dirScoreMin: Double = 0.299,
      bullOnly: Boolean = true,
      forbidNeutral: Boolean = true,
      allowRangePctl: Seq[Interval] = Seq(Interval(14.0, 20.0)),
      blockRangePctl: Seq[Interval] = Seq(Interval(20.0, 22.0)))

  /** Apply every config to every enriched bar in ONE pass
    * (router_low_plus_sweep.py:57-107 `apply_low_plus_override_filter`,
    * swept like the reference's config grid): the tiny config table is
    * broadcast-crossed against the bars (the [[Backtest.sweepTpR]] explode
    * pattern), interval membership is a codegen'd `exists` over the
    * config's interval array, and the first-failing-gate reason cascade
    * matches the reference's debug column. Adds `hour_utc`,
    * `low_plus_allow`, `market_ready_override`, `low_plus_block_reason`
    * per (bar, config). The hour is epoch arithmetic, not calendar
    * functions, so it is timezone-stable on any engine. */
  def applyConfigs(enriched: DataFrame, cfgs: Seq[LowPlusConfig],
                   tsMsCol: String = "bar_ts_ms"): DataFrame = {
    val spark = enriched.sparkSession
    import spark.implicits._
    val cfgDf = cfgs.map(c => LowPlusCfgRow(c.configId, c.allowHoursUtc,
      c.dirScoreMin, c.bullOnly, c.forbidNeutral, c.allowRangePctl,
      c.blockRangePctl)).toDF()

    def inAny(ivCol: Column, x: Column): Column =
      coalesce(exists(ivCol, iv =>
        x >= iv.getField("lo") && x < iv.getField("hi")), lit(false))

    val j = enriched
      .withColumn("hour_utc",
        ((col(tsMsCol) / 3600000L).cast("long") % 24).cast("int"))
      .crossJoin(broadcast(cfgDf))
    val gHour = array_contains(col("allow_hours"), col("hour_utc"))
    val gNeutral = !col("forbid_neutral") || (col("dir_state") =!= "NEUTRAL")
    val gSide = when(col("bull_only"), col("dir_state") === "BULL")
      .otherwise(col("dir_state").isin("BULL", "BEAR"))
    val gDir = coalesce(col("dir_score") >= col("dir_score_min"), lit(false))
    val gAllow = inAny(col("allow_iv"), col("range_pctl"))
    val gBlock = inAny(col("block_iv"), col("range_pctl"))
    j.withColumn("low_plus_allow",
        col("low_plus") && gHour && gNeutral && gSide && gDir &&
          gAllow && !gBlock)
      .withColumn("market_ready_override",
        col("market_ready_base") || col("low_plus_allow"))
      .withColumn("low_plus_block_reason",
        when(!col("low_plus"), "")
          .when(!gHour, "hour")
          .when(!gNeutral, "neutral")
          .when(!gSide, "side")
          .when(!gDir, "dir_score")
          .when(!gAllow, "range_not_allowed")
          .when(gBlock, "range_blocked")
          .otherwise(""))
      .drop("allow_hours", "dir_score_min", "bull_only", "forbid_neutral",
        "allow_iv", "block_iv")
  }

  /** ADD-set diagnostics (analyze_low_plus_debug.py:149-174,263-269): the
    * per-dimension value counts of the override-ADDED cohort (allowed by
    * the LOW+ policy but not base-ready) — by hour, side, vol state,
    * direction-score bin (0.1-wide) and range-percentile bucket (2-wide).
    * Bins are INTEGER indices, not formatted floats, so the buckets hash
    * identically on any engine.
    *
    * Spark-first: the reference runs five separate groupby-size passes; one
    * explode of a 5-element dimension array + ONE hash aggregation computes
    * all breakdowns in a single shuffle. */
  def addSetBreakdown(applied: DataFrame): DataFrame = {
    val add = applied.where(col("low_plus_allow") && !col("market_ready_base"))
    def b(c: Column): Column = coalesce(c.cast("string"), lit("NA"))
    val dims = array(
      struct(lit("hour").as("dim"), b(col("hour_utc")).as("bucket")),
      struct(lit("side").as("dim"), b(col("dir_state")).as("bucket")),
      struct(lit("vol").as("dim"), b(col("vol_state")).as("bucket")),
      struct(lit("dir_score_bin").as("dim"),
        b(floor(col("dir_score") * 10).cast("int")).as("bucket")),
      struct(lit("rp_bucket").as("dim"),
        b(floor(col("range_pctl") / 2.0).cast("int")).as("bucket")))
    add.select(col("config_id"), explode(dims).as("_d"))
      .groupBy(col("config_id"), col("_d.dim").as("dim"),
        col("_d.bucket").as("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** ADD-set slice report (_tmp_add_slices.py and its reports/ variants):
    * forward LOG returns at 4 and 8 bars over the override-only (`is_add`)
    * rows of an [[enrich]]ed frame, sliced by direction state, fixed
    * range-percentile bucket, UTC hour, and side×bucket — the reference's
    * FOUR sequential pandas groupbys as ONE grouping-sets aggregation
    * (single shuffle, one pass). Aggregates follow the reference's `agg`:
    * n, mean/win-rate of the 8-bar return, mean of the 4-bar return,
    * sample (ddof=1) std of the 8-bar return — null-skipping like the
    * `.dropna()` it wraps. Returns are computed on the FULL bar grid
    * before the ADD filter (the reference shifts over the whole frame). */
  def addSlices(enriched: DataFrame, symbolCol: String = "symbol",
                tsCol: String = "bar_ts_ms"): DataFrame = {
    val w = Window.partitionBy(symbolCol).orderBy(tsCol)
    val rp = col("range_pctl")
    val bucket = when(rp.isNull, "NA")
      .when(rp < 2.0, "[00,02)").when(rp < 4.0, "[02,04)")
      .when(rp < 6.0, "[04,06)").when(rp < 8.0, "[06,08)")
      .when(rp < 10.0, "[08,10)").when(rp < 12.0, "[10,12)")
      .otherwise(">=12")
    val add = enriched
      .withColumn("sret_4", log(lead(col("close"), 4).over(w) / col("close")))
      .withColumn("sret_8", log(lead(col("close"), 8).over(w) / col("close")))
      .where(col("is_add"))
      .withColumn("hour_utc",
        ((col(tsCol) / lit(3600000L)).cast("long") % 24).cast("int"))
      .withColumn("rp_bucket", bucket)
    add.groupingSets(
        Seq(Seq(col("dir_state")), Seq(col("rp_bucket")), Seq(col("hour_utc")),
          Seq(col("dir_state"), col("rp_bucket"))),
        col("dir_state"), col("rp_bucket"), col("hour_utc"))
      .agg(
        // grouping() disambiguates rollup rows from genuinely-NULL dims
        // (classic grouping-sets null conflation): 'ALL' only for the
        // rollup, 'NA' for a data NULL that slips past enrich(). It is
        // only resolvable inside the aggregate, hence the _g_* carriers.
        grouping(col("dir_state")).as("_g_dir"),
        grouping(col("rp_bucket")).as("_g_bucket"),
        grouping(col("hour_utc")).as("_g_hour"),
        count(lit(1)).as("n"),
        avg(col("sret_8")).as("mean_sret8"),
        avg(when(col("sret_8") > 0, 1.0).when(col("sret_8").isNotNull, 0.0))
          .as("wr_sret8"),
        avg(col("sret_4")).as("mean_sret4"),
        stddev_samp(col("sret_8")).as("std_sret8"))
      .select(
        when(col("_g_dir") === 1, "ALL")
          .otherwise(coalesce(col("dir_state"), lit("NA"))).as("slice_dir"),
        when(col("_g_bucket") === 1, "ALL")
          .otherwise(coalesce(col("rp_bucket"), lit("NA"))).as("slice_bucket"),
        when(col("_g_hour") === 1, "ALL")
          .otherwise(coalesce(col("hour_utc").cast("string"), lit("NA")))
          .as("slice_hour"),
        col("n"), col("mean_sret8"), col("wr_sret8"), col("mean_sret4"),
        col("std_sret8"))
  }

  /** Per-config rollup of [[applyConfigs]]: candidate / allowed / net-new
    * tradability counts plus the major block-reason split — the summary
    * frame the reference sweep writes per config. One hash aggregation
    * after the broadcast explode; scales with bars × configs. */
  def sweep(enriched: DataFrame, cfgs: Seq[LowPlusConfig],
            tsMsCol: String = "bar_ts_ms"): DataFrame = {
    def cnt(c: Column): Column = sum(c.cast("long"))
    applyConfigs(enriched, cfgs, tsMsCol)
      .groupBy(col("config_id"))
      .agg(
        count(lit(1)).as("n_bars"),
        cnt(col("low_plus")).as("n_low_plus"),
        cnt(col("low_plus_allow")).as("n_allow"),
        cnt(col("low_plus_allow") && !col("market_ready_base")).as("n_add"),
        cnt(col("market_ready_override")).as("n_ready_final"),
        cnt(col("low_plus_block_reason") === "hour").as("n_blocked_hour"),
        cnt(col("low_plus_block_reason")
          .isin("neutral", "side", "dir_score")).as("n_blocked_dir"),
        cnt(col("low_plus_block_reason")
          .isin("range_not_allowed", "range_blocked")).as("n_blocked_range"))
  }
}
