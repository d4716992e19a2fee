package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Product/event analytics over an event log — the accounting queries every
 * large-scale ingest pipeline runs on its own telemetry (and every product
 * team runs on user events): cohort retention, conversion attribution,
 * slowly-changing-dimension history compaction, and next-event transition
 * matrices.
 *
 * All four operators take the event-time column as LONG EPOCH NANOS (the
 * repo-wide events contract, see ParquetIO.tsToNanos) and do pure integer
 * arithmetic on it, so a DuckDB oracle replays every derived bucket
 * bit-for-bit via `epoch_ns(ts)`.
 *
 * Scale notes (100 TB): every per-user computation is a window partitioned
 * by the user key — one hash shuffle on user_id, per-user sorts bounded by
 * that user's event count (never a global sort). Retention reduces the log
 * to distinct (user, day) FIRST, so the cohort join and the final
 * count-distinct run on the collapsed activity relation, not the raw log.
 * A single pathological user (a bot with billions of events) is the one
 * skew risk; gate such keys with RobustStats/SkewJoin upstream.
 */
object EventAnalytics {

  private val DayNanos = 86400000000000L

  /**
   * Cohort retention matrix: users bucketed by their first-activity day
   * (the cohort), then for each (cohort_day, day_offset) the number of
   * distinct cohort members active that day. `n_users` at offset 0 is the
   * cohort size; the ratio downstream dashboards plot is n_users /
   * cohort-size, left to the caller so the matrix stays integer-exact.
   *
   * Plan: project to (user, day) → distinct (one shuffle, the log never
   * moves again) → min-day per user (map-side combinable agg) → equi-join
   * back on user → count-distinct per cell.
   */
  def retentionCohorts(events: DataFrame, userCol: String, tsNanosCol: String): DataFrame = {
    val activity = events
      .select(col(userCol).as("__ret_user"),
        expr(s"$tsNanosCol div $DayNanos").as("__ret_day"))
      .distinct()
    val cohorts = activity.groupBy(col("__ret_user"))
      .agg(min(col("__ret_day")).as("cohort_day"))
    activity.join(cohorts, "__ret_user")
      .groupBy(col("cohort_day"), (col("__ret_day") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("__ret_user")).as("n_users"))
  }

  /**
   * Last-touch conversion attribution: each conversion event is credited to
   * the user's most recent PRECEDING non-conversion event within
   * `windowNanos`; conversions with no touch in the window credit
   * `(none)`. Ties in event time break on `orderTieCol` (a unique id), so
   * the attribution is deterministic and oracle-replayable.
   *
   * The carry-forward is `last(..., ignoreNulls) OVER (user ORDER BY ts
   * ROWS UNBOUNDED PRECEDING TO 1 PRECEDING)` — one pass per user, no
   * self-join of the log against itself.
   */
  def lastTouchAttribution(
      events: DataFrame,
      userCol: String,
      tsNanosCol: String,
      typeCol: String,
      valueCol: String,
      convType: String,
      orderTieCol: String,
      windowNanos: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsNanosCol), col(orderTieCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col(typeCol) =!= convType, col(typeCol))
    val touchTs = when(col(typeCol) =!= convType, col(tsNanosCol))
    events
      .withColumn("__at_touch", last(touch, ignoreNulls = true).over(w))
      .withColumn("__at_touch_ts", last(touchTs, ignoreNulls = true).over(w))
      .filter(col(typeCol) === convType)
      .groupBy(coalesce(
        when(col(tsNanosCol) - col("__at_touch_ts") <= windowNanos, col("__at_touch")),
        lit("(none)")).as("touch_type"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(col(valueCol).cast("decimal(15,2)")).cast("double").as("total_value"))
  }

  /**
   * SCD type-2 history compaction: per user, consecutive runs of the same
   * `attrCol` value collapse into validity intervals `[valid_from_ns,
   * valid_to_ns)` with a version number and an is_current flag — the
   * change-capture shape a dimension table wants, built from a raw event
   * feed in two per-user window passes (detect change points, then seal
   * each interval with the next change's timestamp).
   */
  def scd2History(
      events: DataFrame,
      userCol: String,
      tsNanosCol: String,
      attrCol: String,
      orderTieCol: String): DataFrame = {
    val wAll = Window.partitionBy(col(userCol)).orderBy(col(tsNanosCol), col(orderTieCol))
    val changes = events
      .withColumn("__scd_prev", lag(col(attrCol), 1).over(wAll))
      // a lag'd constant distinguishes "first row" from "previous attr was
      // NULL", so a leading NULL attr still opens version 1
      .withColumn("__scd_first", lag(lit(1), 1).over(wAll).isNull)
      // NULL-safe inequality elsewhere: NULL -> NULL is NOT a change
      .filter(col("__scd_first") || !(col("__scd_prev") <=> col(attrCol)))
    val wChg = Window.partitionBy(col(userCol)).orderBy(col(tsNanosCol), col(orderTieCol))
    changes
      .select(col(userCol).as("user_id"),
        col(attrCol).as("attr_value"),
        col(tsNanosCol).as("valid_from_ns"),
        lead(col(tsNanosCol), 1).over(wChg).as("valid_to_ns"),
        row_number().over(wChg).as("version"))
      .withColumn("is_current", col("valid_to_ns").isNull)
  }

  /**
   * Next-event transition matrix (first-order Markov): counts and
   * probabilities of event_type → next event_type per user timeline. The
   * probability is one IEEE division of two exact counts, so both engines
   * produce the identical double. The normalizing window runs over the
   * |types|² aggregated matrix, not the log.
   */
  def transitionMatrix(
      events: DataFrame,
      userCol: String,
      tsNanosCol: String,
      typeCol: String,
      orderTieCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsNanosCol), col(orderTieCol))
    val counts = events
      .withColumn("__tm_next", lead(col(typeCol), 1).over(w))
      .filter(col("__tm_next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__tm_next").as("to_type"))
      .agg(count(lit(1)).as("n"))
    counts.withColumn("p",
      col("n").cast("double") / sum(col("n")).over(Window.partitionBy(col("from_type"))).cast("double"))
  }

  /**
   * Time-weighted average of `valueCol` per key: each observation holds
   * until the next one, so its weight is the nanosecond gap to the
   * successor (the finance TWAP / state-duration average — an unweighted
   * mean over-counts bursts of rapid updates). The last observation per
   * key carries no duration and drops out, the standard left-closed
   * convention.
   *
   * Values scale to exact integer cents and weights are exact nanos; the
   * (cents × nanos) products overflow a long (10^5 × 10^15), so the sums
   * accumulate in DECIMAL(38,0) — exact, order-independent — and
   * canonicalize to double through a STRING cast (the olsByGroup
   * discipline) for ONE final division. Bit-reproducible.
   *
   * One LEAD over the per-key window sort (per-key bounded), one hash
   * agg. Output: (key, n_segments, total_ns, twap) — twap in VALUE units.
   */
  def timeWeightedAverage(
      events: DataFrame,
      keyCol: String,
      tsNanosCol: String,
      valueCol: String,
      orderTieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsNanosCol), col(orderTieCol))
    val segs = events
      .withColumn("__twa_next", lead(col(tsNanosCol), 1).over(w))
      .filter(col("__twa_next").isNotNull)
      .withColumn("__twa_dur", col("__twa_next") - col(tsNanosCol))
      .withColumn("__twa_c", round(col(valueCol) * 100).cast("long"))
    segs.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_segments"),
        sum(col("__twa_dur")).as("total_ns"),
        sum(col("__twa_c").cast("decimal(38,0)") *
          col("__twa_dur").cast("decimal(38,0)")).as("__twa_num"))
      .filter(col("total_ns") > 0)
      .select(col(keyCol), col("n_segments"), col("total_ns"),
        (col("__twa_num").cast("string").cast("double") /
          col("total_ns").cast("double") / 100.0).as("twap"))
  }

  /**
   * Top event paths: the ordered sequence of each user's first
   * `maxEvents` event types joined with `>` — the "what journeys do
   * users actually take" rollup (the path-count precursor to funnel
   * design). The per-user order ties-break on `orderTieCol`, so every
   * path string is deterministic and engine-replayable; the path space
   * is bounded by |types|^maxEvents regardless of corpus size.
   *
   * One row_number + one ordered collect per user (both over the same
   * per-user window shuffle), then a map-side-combined path count.
   */
  def topPaths(
      events: DataFrame,
      userCol: String,
      tsNanosCol: String,
      typeCol: String,
      orderTieCol: String,
      maxEvents: Int): DataFrame = {
    require(maxEvents >= 1, s"maxEvents must be >= 1, got $maxEvents")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsNanosCol), col(orderTieCol))
    val paths = events
      .withColumn("__tp_rn", row_number().over(w))
      .filter(col("__tp_rn") <= maxEvents)
      .groupBy(col(userCol))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col(tsNanosCol).as("t"),
            col(orderTieCol).as("i"), col(typeCol).as("e")))),
          x => x.getField("e")), ">").as("path"))
    paths.groupBy(col("path")).agg(count(lit(1)).as("n_users"))
  }

  /**
   * Rolling 7-day (or any `windowDays`) distinct actives per day — the
   * WAU/MAU curve, which naive `COUNT(DISTINCT) OVER (RANGE ...)` can't
   * express and a per-day self-join recomputes wastefully. Each distinct
   * (day, user) activity row instead EXPLODES to the `windowDays` target
   * days it covers (bounded fan-out = the window length), and distinct
   * counting happens per target day — hash aggregations only, no join of
   * the log to itself. Target days beyond the observed range are clipped
   * by a semi join against the observed-day set.
   */
  def rollingDistinctUsers(
      events: DataFrame,
      userCol: String,
      tsNanosCol: String,
      windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val act = events
      .select(expr(s"$tsNanosCol div $DayNanos").as("__rd_day"),
        col(userCol).as("__rd_user"))
      .distinct()
    val days = act.select(col("__rd_day").as("day")).distinct()
    act
      .select(explode(sequence(col("__rd_day"),
        col("__rd_day") + (windowDays - 1))).as("day"), col("__rd_user"))
      .join(days, Seq("day"), "left_semi")
      .groupBy(col("day"))
      .agg(countDistinct(col("__rd_user")).as("n_users"))
  }

  /**
   * Burst / rate-limit detection: per user, the maximum event count in
   * any trailing `windowNanos` event-time window, flagged against
   * `threshold` — the abuse/bot gate an ingest pipeline runs before the
   * corpus ever sees a scraper's output. The sliding count is ONE
   * per-user RANGE-frame window (frames are bounded by that user's
   * events — never a global sort); ties in event time are handled by
   * the RANGE frame itself (same-timestamp events share a count).
   */
  def burstFlags(
      events: DataFrame,
      userCol: String,
      tsNanosCol: String,
      windowNanos: Long,
      threshold: Long): DataFrame = {
    require(windowNanos > 0, s"windowNanos must be positive, got $windowNanos")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsNanosCol))
      .rangeBetween(-(windowNanos - 1), 0)
    events.withColumn("__bf_c", count(lit(1)).over(w))
      .groupBy(col(userCol))
      .agg(count(lit(1)).as("n_events"), max(col("__bf_c")).as("max_in_window"))
      .withColumn("flagged", col("max_in_window") >= threshold)
  }

  /**
   * CUSUM change-point detection over per-type hourly volumes: the
   * classic "did the level shift, and when" monitor (Page 1954). For
   * each type with bucket counts x₁..x_B and total T, the scaled
   * cumulative sum `S_k = Σ_{i≤k} (B·x_i − T)` (×B keeps the mean
   * subtraction INTEGER) peaks in magnitude at the most likely change
   * point; a type with no level shift stays near zero. Output per type:
   * (n_buckets, total, cusum_peak = max|S_k|, peak_bucket = earliest
   * argmax) — all integer-exact, engine-replayable.
   *
   * Scale shape: the log collapses to (type, bucket) counts first (one
   * map-side-combined agg); the windows run over that matrix-sized
   * table (|types| × |buckets|), never the log — the q172 discipline.
   */
  def cusumChangePoint(
      events: DataFrame,
      tsNanosCol: String,
      typeCol: String,
      bucketNanos: Long): DataFrame = {
    require(bucketNanos > 0, s"bucketNanos must be positive, got $bucketNanos")
    val hourly = events
      .groupBy(col(typeCol).as("event_type"),
        expr(s"$tsNanosCol div $bucketNanos").as("bucket"))
      .agg(count(lit(1)).as("x"))
    val wTot = Window.partitionBy(col("event_type"))
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    val cum = hourly
      .withColumn("__b", count(lit(1)).over(wTot))
      .withColumn("__t", sum(col("x")).over(wTot))
      .withColumn("__s", sum(col("__b") * col("x") - col("__t")).over(wCum))
    cum.withColumn("__peak", max(abs(col("__s"))).over(wTot))
      .filter(abs(col("__s")) === col("__peak"))
      .groupBy(col("event_type"))
      .agg(first(col("__b")).as("n_buckets"), first(col("__t")).as("total"),
        first(col("__peak")).as("cusum_peak"),
        min(col("bucket")).as("peak_bucket"))
  }

  /**
   * Seasonal-naive forecast evaluation: per type, the MAE of the
   * "same bucket last season" baseline (`x̂_t = x_{t−season}`) over the
   * bucketed volume series — the sanity floor every real forecasting
   * model must beat, and a drift signal in its own right (a rising
   * naive-MAE means the seasonality itself broke). Integer volumes ⇒
   * the absolute-error sum is exact; MAE is ONE division. Windows run
   * over the |types| × |buckets| matrix only (the q172/q206 discipline).
   *
   * Output: (event_type, n_buckets, n_scored, mae_num, mae).
   */
  def seasonalNaiveError(
      events: DataFrame,
      tsNanosCol: String,
      typeCol: String,
      bucketNanos: Long,
      season: Int): DataFrame = {
    require(bucketNanos > 0, s"bucketNanos must be positive, got $bucketNanos")
    require(season >= 1, s"season must be >= 1, got $season")
    val hourly = events
      .groupBy(col(typeCol).as("event_type"),
        expr(s"$tsNanosCol div $bucketNanos").as("bucket"))
      .agg(count(lit(1)).as("x"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    // lag by ROW (the series is the observed bucket sequence; a fully
    // dense spine would make absent buckets zeros — caller's choice via
    // resample upstream)
    hourly.withColumn("__prev", lag(col("x"), season).over(w))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(when(col("__prev").isNotNull, 1L).otherwise(0L)).as("n_scored"),
        sum(when(col("__prev").isNotNull, abs(col("x") - col("__prev")))
          .otherwise(0L)).as("mae_num"))
      .withColumn("mae",
        when(col("n_scored") > 0,
          col("mae_num").cast("double") / col("n_scored").cast("double")))
  }

  /**
   * Wilson-score 95% confidence interval for a per-group conversion
   * rate: `successes / trials` with the interval that stays sane at
   * small n and extreme rates (the Wald interval collapses there) —
   * the uncertainty every conversion/CTR dashboard should carry. One
   * conditional aggregation; the bounds are a fixed IEEE tree over the
   * exact counts and a shared z literal — bit-reproducible.
   */
  def wilsonRate(
      df: DataFrame,
      groupCol: String,
      successCol: Column,
      z: Double = 1.959963984540054): DataFrame = {
    val agged = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_trials"),
        sum(when(successCol, 1L).otherwise(0L)).as("n_success"))
    val n = col("n_trials").cast("double")
    val p = col("n_success").cast("double") / n
    val z2 = lit(z) * lit(z)
    val denom = lit(1.0) + z2 / n
    val center = p + z2 / (lit(2.0) * n)
    val spread = lit(z) * sqrt(p * (lit(1.0) - p) / n + z2 / (lit(4.0) * n * n))
    agged
      .withColumn("rate", p)
      .withColumn("wilson_lo", (center - spread) / denom)
      .withColumn("wilson_hi", (center + spread) / denom)
  }

  /**
   * Consecutive event-type sequence mining (order-n patterns): counts of
   * every length-`n` run of CONSECUTIVE event types on a user's timeline —
   * the order-(n-1) generalization of [[transitionMatrix]], the standard
   * "what do users actually do" exploration and the feature extractor for
   * next-action models. Output columns `step_0..step_{n-1}`, the exact
   * occurrence count `n_occurrences`, and `share` = count / total patterns
   * (ONE division of exact longs — bit-reproducible).
   *
   * Plan shape: n-1 `lead`s over ONE per-user window sort (a single hash
   * shuffle on the user key; per-user sorts bounded by that user's
   * events), then a map-side-combined count agg over the |types|^n
   * pattern space — the normalizing total comes from a broadcast
   * single-row cross join, never a global window.
   */
  def sequencePatterns(
      events: DataFrame,
      userCol: String,
      tsNanosCol: String,
      typeCol: String,
      orderTieCol: String,
      n: Int = 3): DataFrame = {
    require(n >= 2, s"pattern length must be >= 2, got $n")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsNanosCol), col(orderTieCol))
    val steps = (0 until n).map { i =>
      (if (i == 0) col(typeCol) else lead(col(typeCol), i).over(w)).as(s"step_$i")
    }
    val runs = events.select(steps: _*)
      .filter((1 until n).map(i => col(s"step_$i").isNotNull).reduce(_ && _))
    val counts = runs.groupBy((0 until n).map(i => col(s"step_$i")): _*)
      .agg(count(lit(1)).as("n_occurrences"))
    val total = counts.agg(sum(col("n_occurrences")).as("__total"))
    counts.crossJoin(broadcast(total))
      .withColumn("share",
        col("n_occurrences").cast("double") / col("__total").cast("double"))
      .drop("__total")
  }

  /**
   * Autocorrelation of the hourly event-count series at calendar lags
   * 1..maxLag — the seasonality detector behind alerting and the
   * seasonal-naive forecast's lag choice. `r(L)` is the Pearson correlation
   * between count(hour t) and count(hour t−L) over every CALENDAR pair
   * where both hours have events (a missing hour forms no pair — lag means
   * wall-clock distance, not position in the observed sequence).
   *
   * Exact by construction: counts are integers, so all six sufficient
   * statistics per lag are DECIMAL(38,0)-exact sums, and r is one fixed
   * IEEE tree over their string-canonicalized doubles. The variance terms
   * convert to double BEFORE their product (the decimal product of two
   * n·ss−s² terms overflows 38 digits at petabyte counts).
   *
   * Plan shape (100 TB): the log collapses to its hourly-count relation in
   * one map-side-combinable shuffle (|hours| rows — ~9k/year); each lag is
   * a broadcast equi-join of that tiny relation against itself on the
   * shifted bucket key, never a global window sort.
   */
  def acfHourly(events: DataFrame, tsNanosCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val HourNanos = 3600000000000L
    def asD(c: Column): Column = c.cast("string").cast("double")
    val dec = "decimal(38,0)"
    val hourly = events
      .groupBy(expr(s"$tsNanosCol div $HourNanos").as("__hb"))
      .agg(count(lit(1)).as("__x"))
    val lags = hourly.sparkSession.range(1, maxLag + 1).select(col("id").as("lag"))
    val cur = hourly.crossJoin(broadcast(lags))
      .select(col("lag"), (col("__hb") - col("lag")).as("__key"), col("__x"))
    val prev = hourly.select(col("__hb").as("__key"), col("__x").as("__y"))
    val stats = cur.join(prev, "__key")
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__x").cast(dec)).as("__sx"),
        sum(col("__y").cast(dec)).as("__sy"),
        sum(col("__x").cast(dec) * col("__x").cast(dec)).as("__sxx"),
        sum(col("__y").cast(dec) * col("__y").cast(dec)).as("__syy"),
        sum(col("__x").cast(dec) * col("__y").cast(dec)).as("__sxy"))
    val n = col("n_pairs").cast(dec)
    val num = asD(n * col("__sxy") - col("__sx") * col("__sy"))
    val vx = asD(n * col("__sxx") - col("__sx") * col("__sx"))
    val vy = asD(n * col("__syy") - col("__sy") * col("__sy"))
    stats.select(col("lag"), col("n_pairs"),
      when(vx > 0.0 && vy > 0.0, num / sqrt(vx * vy)).as("acf"))
  }

  /**
   * Cohort lifetime-value curve: users bucketed by first-activity day over
   * the given revenue events, then per (cohort_day, age_days) the active
   * distinct users, period revenue, and RUNNING cumulative revenue — the
   * payback-curve table under every LTV dashboard, the revenue companion
   * to [[retentionCohorts]]. `revenueCol` must be integer-valued (cents,
   * floor-ed units) so every figure is exact and oracle-replayable.
   *
   * Plan: collapse to the (user, day, revenue) relation, one min-day agg,
   * equi-join back on the user key, cell aggregation, then a cumulative
   * window PARTITIONED by cohort (per-cohort frames bounded by the
   * observation horizon in days — never a global sort). Ages with zero
   * activity emit no row; the running sum is unaffected (they contribute
   * nothing).
   */
  def cohortLtv(
      events: DataFrame, userCol: String, tsNanosCol: String,
      revenueCol: Column): DataFrame = {
    val base = events.select(col(userCol).as("__u"),
      expr(s"$tsNanosCol div $DayNanos").as("__day"),
      revenueCol.cast("long").as("__rev"))
    val cohorts = base.groupBy(col("__u")).agg(min(col("__day")).as("cohort_day"))
    val cells = base.join(cohorts, "__u")
      .groupBy(col("cohort_day"), (col("__day") - col("cohort_day")).as("age_days"))
      .agg(countDistinct(col("__u")).as("n_active"), sum(col("__rev")).as("revenue"))
    val w = Window.partitionBy(col("cohort_day")).orderBy(col("age_days"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells.withColumn("cum_revenue", sum(col("revenue")).over(w))
  }

  /**
   * Data-driven multi-touch attribution via the Markov removal effect
   * (Anderl, Becker, von Wangenheim, Schumann — "Mapping the customer
   * journey", IJRM 2016; the model behind R's ChannelAttribution): build
   * the first-order Markov chain over user journeys (START → touches →
   * CONV/DROP, truncated at the first conversion), then score each channel
   * by how much the chain's conversion probability falls when every
   * transition into that channel is redirected to DROP. Fixes last-touch's
   * (q176) blindness to assist channels.
   *
   * Heavy work is fully distributed: one per-user window pass emits
   * transitions, one map-side-combined agg counts them. The transition
   * matrix — bounded by (|channel vocabulary| + 3)², independent of the
   * log size — is then collected and the absorbing-chain linear systems
   * (one per removal) solve on the driver with deterministic Gaussian
   * elimination (states in sorted order, partial pivot). That driver step
   * is O(|channels|⁴) on a ~dozens-sized vocabulary: legitimate at any
   * corpus scale. Deterministic but not SQL-replayable (the elimination's
   * pivot order is value-dependent, not one fixed expression tree) — the
   * gate rides the bit-replayable [[markovAttributionFixedPoint]] sibling
   * instead; this exact form keeps its closed-form chain specs.
   *
   * Self-transitions (repeated touches of one channel) are kept — they are
   * real journey mass; collapsing them is a caller-side projection.
   *
   * Output: one row per channel — n_out (outgoing journey transitions),
   * removal_effect (1 − p_removed/p), attribution_share (removal effects
   * normalized to 1), p_conv (the chain's base conversion probability,
   * repeated for readability). Channels with zero journey presence do not
   * appear; with no conversions at all, shares are NULL.
   */
  def markovAttribution(
      events: DataFrame, userCol: String, tsNanosCol: String,
      channelCol: String, convChannel: String, tieCol: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val counts = journeyTransitionCounts(
      events, userCol, tsNanosCol, channelCol, convChannel, tieCol)
    if (counts.isEmpty)
      return Seq.empty[(String, Long, Option[Double], Option[Double], Double)]
        .toDF("channel", "n_out", "removal_effect", "attribution_share", "p_conv")
    val outTotals = counts.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._3).sum }
    val transientStates = counts.map(_._1).distinct.sorted // START + channels
    val idx = transientStates.zipWithIndex.toMap
    // x_s = sum_t∈transient p(s→t)·x_t + p(s→CONV); removal redirects
    // edges INTO the removed channel to DROP (prob mass contributes 0)
    def solve(removed: Option[String]): Double = {
      val k = transientStates.length
      val a = Array.tabulate(k, k + 1)((i, j) => if (i == j) 1.0 else 0.0)
      for ((s, t, n) <- counts.sortBy(c => (c._1, c._2))
           if !removed.contains(s) && !removed.contains(t)) {
        val p = n.toDouble / outTotals(s).toDouble
        if (t == "CONV") a(idx(s))(k) += p
        else if (t != "DROP") a(idx(s))(idx(t)) -= p
      }
      for (col0 <- 0 until k) { // partial-pivot elimination, fixed order
        val piv = (col0 until k).maxBy(r => math.abs(a(r)(col0)))
        val tmp = a(col0); a(col0) = a(piv); a(piv) = tmp
        for (r <- col0 + 1 until k if a(r)(col0) != 0.0) {
          val f = a(r)(col0) / a(col0)(col0)
          for (c <- col0 to k) a(r)(c) -= f * a(col0)(c)
        }
      }
      val x = new Array[Double](k)
      for (r <- k - 1 to 0 by -1) {
        var s = a(r)(k)
        for (c <- r + 1 until k) s -= a(r)(c) * x(c)
        x(r) = s / a(r)(r)
      }
      x(idx("START"))
    }
    val p0 = solve(None)
    val channels = transientStates.filter(_.startsWith("c:"))
    val removals = channels.map(c => c -> (if (p0 > 0.0) 1.0 - solve(Some(c)) / p0 else 0.0))
    val totalRemoval = removals.map(_._2).sum
    val rows = removals.map { case (c, re) =>
      (c.stripPrefix("c:"), outTotals(c),
        if (p0 > 0.0) Some(re) else None,
        if (p0 > 0.0 && totalRemoval > 0.0) Some(re / totalRemoval) else None,
        p0)
    }
    rows.toSeq.toDF("channel", "n_out", "removal_effect", "attribution_share", "p_conv")
  }

  /** The distributed half of the Markov attribution shared by both
    * solvers: one per-user window pass emits journey transitions
    * (START → touches → CONV/DROP, truncated at the first conversion),
    * one map-side-combined agg counts them. The collected relation is
    * bounded by (|channel vocabulary| + 3)² — independent of log size. */
  private def journeyTransitionCounts(
      events: DataFrame, userCol: String, tsNanosCol: String,
      channelCol: String, convChannel: String,
      tieCol: String): Array[(String, String, Long)] = {
    val wU = Window.partitionBy(col("__u")).orderBy(col("__t"), col("__tie"))
    val mapSt = (c: Column) =>
      when(c === convChannel, "CONV").otherwise(concat(lit("c:"), c))
    val prefix = events
      .select(col(userCol).as("__u"), col(tsNanosCol).as("__t"),
        col(tieCol).as("__tie"), mapSt(col(channelCol)).as("__s"))
      .withColumn("__convbefore",
        coalesce(sum(when(col("__s") === "CONV", 1L).otherwise(0L))
          .over(wU.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("__convbefore") === 0L) // journey ends at first conversion
      .withColumn("__nx", lead(col("__s"), 1).over(wU))
      .withColumn("__rn", row_number().over(wU))
    val transitions = prefix.filter(col("__rn") === 1)
      .select(lit("START").as("src"), col("__s").as("dst"))
      .unionByName(prefix.filter(col("__s") =!= "CONV")
        .select(col("__s").as("src"), coalesce(col("__nx"), lit("DROP")).as("dst")))
    transitions.groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
  }

  /**
   * Fixed-point integer variant of [[markovAttribution]] — the SQL-
   * replayable gate form (the q152 PageRank discipline). Instead of
   * Gaussian elimination (whose partial-pivot order is data-dependent and
   * so not one fixed expression tree), the absorbing-chain conversion
   * probabilities iterate `iters` rounds of
   *
   *   x'_s = (Σ_{t transient, t ≠ removed} n_{s→t}·x_t + n_{s→CONV}·SCALE) // out_s
   *
   * from x = 0 — monotone non-decreasing (all coefficients ≥ 0), bounded
   * by SCALE, and PURE INTEGER floor arithmetic, so a DuckDB chained-CTE
   * replay of the same K rounds matches bit for bit (BigInt products here,
   * HUGEINT there; both exact). After k rounds x_START is exactly the
   * fixed-point-truncated probability mass of converting paths of length
   * ≤ k; with substochastic transition rows the iterates converge
   * geometrically and 40 rounds is far past the 1e-12 grid.
   *
   * Output (all BIGINT, ×1e12 fixed-point): channel, n_out, p_conv_fp
   * (the unremoved chain's conversion probability), removal_effect_fp
   * (= (p0−p_removed)·SCALE // p0), attribution_share_fp (removal effects
   * normalized to SCALE). Channels with zero journey presence do not
   * appear; with no conversions, effects/shares are NULL.
   */
  def markovAttributionFixedPoint(
      events: DataFrame, userCol: String, tsNanosCol: String,
      channelCol: String, convChannel: String, tieCol: String,
      iters: Int = 40): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val Scale = 1000000000000L
    val counts = journeyTransitionCounts(
      events, userCol, tsNanosCol, channelCol, convChannel, tieCol)
    if (counts.isEmpty)
      return Seq.empty[(String, Long, Long, Option[Long], Option[Long])]
        .toDF("channel", "n_out", "p_conv_fp", "removal_effect_fp", "attribution_share_fp")
    val outTotals = counts.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._3).sum }
    val transientStates = counts.map(_._1).distinct.sorted // START + channels
    // x_START after `iters` rounds under `removed` (None = full chain)
    def solve(removed: Option[String]): Long = {
      var x = transientStates.map(_ => BigInt(0))
      val byDst = counts.filter(c => c._2 != "CONV" && c._2 != "DROP" &&
        !removed.contains(c._2))
      val convIn = counts.filter(_._2 == "CONV").map(c => c._1 -> BigInt(c._3)).toMap
      for (_ <- 1 to iters) {
        val xm = transientStates.zip(x).toMap
        x = transientStates.map { s =>
          val flow = byDst.filter(_._1 == s)
            .map(c => BigInt(c._3) * xm(c._2)).foldLeft(BigInt(0))(_ + _)
          (flow + convIn.getOrElse(s, BigInt(0)) * Scale) / BigInt(outTotals(s))
        }
      }
      transientStates.zip(x).toMap.apply("START").toLong
    }
    val p0 = solve(None)
    val channels = transientStates.filter(_.startsWith("c:"))
    val removals = channels.map { c =>
      c -> (if (p0 > 0L) Some((BigInt(p0 - solve(Some(c))) * Scale / BigInt(p0)).toLong)
            else None)
    }
    val total = removals.flatMap(_._2).sum
    val rows = removals.map { case (c, re) =>
      (c.stripPrefix("c:"), outTotals(c), p0, re,
        re.flatMap(r => if (total > 0L) Some((BigInt(r) * Scale / BigInt(total)).toLong)
                        else None))
    }
    rows.toSeq.toDF("channel", "n_out", "p_conv_fp", "removal_effect_fp", "attribution_share_fp")
  }

  /**
   * Peak concurrent sessions per day — the capacity-planning number ("how
   * many users were on at once?") computed with the classic interval sweep:
   * sessionize each user's events with `gapNanos` inactivity splits, emit
   * +1/−1 boundaries at session start/end, and take the per-day maximum of
   * the running boundary sum. Starts order before ends at equal timestamps,
   * so touching sessions count as concurrent; the reported peak is the
   * concurrency AT BOUNDARY INSTANTS (the standard sweep output — a day's
   * carry-in is observed at its first boundary, and with a sub-day session
   * gap every day an active session touches has a boundary).
   *
   * Integer-exact end to end (counts only), so a DuckDB window replay
   * matches bit for bit.
   *
   * Plan shape (100 TB): NO global sweep. Sessionization is per-user
   * windows (one shuffle on the user key); the running sum decomposes as
   * hour-partitioned prefix sweeps (the irreducible per-hour sort, |hours|
   * parallel partitions) + an intra-day hour chain (≤24 rows/partition) +
   * a day-level carry computed by contribution expansion over the
   * |days|-bounded daily-totals relation — every window is partitioned
   * (the PlanSpec global-window guard holds).
   */
  def peakConcurrency(
      events: DataFrame,
      userCol: String,
      tsNanosCol: String,
      gapNanos: Long = 1800000000000L): DataFrame = {
    require(gapNanos > 0 && gapNanos < DayNanos,
      s"gapNanos must be in (0, one day) — the day densification relies on " +
        s"sessions never spanning a full silent day; got $gapNanos")
    val HourNanos = 3600000000000L
    val wU = Window.partitionBy(col("__u")).orderBy(col("__t"))
    val sess = events
      .select(col(userCol).as("__u"), col(tsNanosCol).as("__t"))
      .withColumn("__new",
        when(col("__t") - lag(col("__t"), 1).over(wU) <= gapNanos, 0L).otherwise(1L))
      .withColumn("__sid", sum(col("__new"))
        .over(wU.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("__u"), col("__sid"))
      .agg(min(col("__t")).as("__st"), max(col("__t")).as("__en"))
    val bounds = sess.select(col("__st").as("__t"), lit(1L).as("__d"))
      .unionByName(sess.select(col("__en").as("__t"), lit(-1L).as("__d")))
    val wH = Window.partitionBy(col("__hb"))
      .orderBy(col("__t").asc, col("__d").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hourly = bounds
      .withColumn("__hb", expr(s"__t div $HourNanos"))
      .withColumn("__run", sum(col("__d")).over(wH))
      .groupBy(col("__hb"))
      .agg(max(col("__run")).as("__maxp"), sum(col("__d")).as("__tot"))
      .withColumn("__day", expr("__hb div 24"))
    val wD = Window.partitionBy(col("__day")).orderBy(col("__hb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withinDay = hourly
      .withColumn("__dcar", coalesce(sum(col("__tot")).over(wD), lit(0L)))
    val dayTot = withinDay.groupBy(col("__day")).agg(sum(col("__tot")).as("__dtot"))
    val maxDay = dayTot.agg(max(col("__day")).as("__maxd"))
    val carries = dayTot.crossJoin(broadcast(maxDay))
      .filter(col("__day") < col("__maxd"))
      .select(explode(sequence(col("__day") + 1, col("__maxd"))).as("__day2"),
        col("__dtot"))
      .groupBy(col("__day2")).agg(sum(col("__dtot")).as("__daycar"))
    withinDay.join(carries, withinDay("__day") === carries("__day2"), "left")
      .select(withinDay("__day").as("day"),
        (coalesce(col("__daycar"), lit(0L)) + col("__dcar") + col("__maxp")).as("__peak"))
      .groupBy(col("day")).agg(max(col("__peak")).as("peak_concurrency"))
  }

  /**
   * Classical seasonal decomposition's SEASONAL PROFILE over the hourly
   * event-count series (the additive moving-average method: Hyndman &
   * Athanasopoulos, "Forecasting: Principles and Practice", §3.3): densify
   * the calendar grid (missing hours count 0), detrend with the standard
   * even-period centered moving average (half-weights at both ends:
   * trend_t = (x_{t−p/2} + 2·Σ_{|j|<p/2} x_{t+j} + x_{t+p/2}) / 2p), and
   * average the detrended values per season index `t mod p`. Output: one
   * row per season index with `n_obs` interior observations and the
   * `seasonal` deviation (count units).
   *
   * Exact by construction: counts are integers, so the detrended value is
   * the rational `dnum_t / 2p` with an INTEGER numerator
   * `2p·x_t − (2·S_t − x_{t−p/2} − x_{t+p/2})`, and each seasonal mean is
   * ONE division of exact DECIMAL sums — bit-reproducible in any engine.
   *
   * Plan shape (100 TB): the log collapses once to the |hours|-bounded
   * hourly relation; the grid, the (p+1)-way contribution expansion, and
   * the three equi-joins all run on that tiny relation — NO window over an
   * unbounded input anywhere (the PlanSpec global-window guard).
   */
  /**
   * OHLC time bars: per (series key, time bucket) the open / high / low /
   * close of the value column plus the event count — the downsampled bar
   * shape every monitoring and market-data pipeline stores instead of raw
   * ticks. `open`/`close` are the values of the FIRST/LAST event in the
   * bucket ordered by (ts, tieCol), so bars are deterministic under
   * event-time ties (tieCol must be unique, e.g. event_id).
   *
   * Bit-exact by construction: every output is a pass-through of one input
   * double (min_by/max_by/min/max) — no arithmetic happens, so any engine
   * reproduces the bars exactly.
   *
   * Plan shape (100 TB): one hash aggregation on (key, bucket) — all five
   * aggregates are map-side combinable (min_by/max_by combine by keeping
   * the smaller/larger ordering struct), so the shuffle carries one row per
   * bar, not per event. No windows, no sorts.
   */
  def ohlcBars(
      events: DataFrame,
      keyCol: String,
      tsNanosCol: String,
      valueCol: String,
      tieCol: String,
      bucketNanos: Long = 3600000000000L): DataFrame = {
    require(bucketNanos > 0, s"bucketNanos must be positive, got $bucketNanos")
    val ord = struct(col(tsNanosCol), col(tieCol))
    events
      .groupBy(col(keyCol).as("series_key"),
        expr(s"$tsNanosCol div $bucketNanos").as("bucket"))
      .agg(
        min_by(col(valueCol), ord).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), ord).as("close"),
        count(lit(1)).as("n_events"))
  }

  def seasonalProfile(
      events: DataFrame, tsNanosCol: String, period: Int = 24): DataFrame = {
    require(period >= 2 && period % 2 == 0,
      s"period must be an even number >= 2, got $period")
    val half = period / 2
    val HourNanos = 3600000000000L
    def asD(c: Column): Column = c.cast("string").cast("double")
    val dec = "decimal(38,0)"
    val hourly = events
      .groupBy(expr(s"$tsNanosCol div $HourNanos").as("__hb"))
      .agg(count(lit(1)).as("__x"))
    val grid = hourly.agg(min(col("__hb")).as("__lo"), max(col("__hb")).as("__hi"))
      .select(explode(sequence(col("__lo"), col("__hi"))).as("__hb"))
      .join(hourly, Seq("__hb"), "left")
      .select(col("__hb"), coalesce(col("__x"), lit(0L)).as("__x"))
    // S_t = Σ_{j=-half..half} x_{t+j} by contribution expansion; __cnt
    // = period+1 exactly on the interior where the centered MA is defined
    val s = grid
      .select(explode(sequence(lit(-half), lit(half))).as("__j"),
        col("__hb"), col("__x"))
      .groupBy((col("__hb") + col("__j")).as("__t"))
      .agg(sum(col("__x")).as("__s"), count(lit(1)).as("__cnt"))
    val xm = grid.select((col("__hb") + half).as("__t"), col("__x").as("__xm"))
    val xp = grid.select((col("__hb") - half).as("__t"), col("__x").as("__xp"))
    val dnum = lit(2L * period) * col("__x") -
      (lit(2L) * col("__s") - col("__xm") - col("__xp"))
    grid.select(col("__hb").as("__t"), col("__x"))
      .join(s, "__t").filter(col("__cnt") === (period + 1))
      .join(xm, "__t").join(xp, "__t")
      .groupBy((col("__t") % period).as("season_idx"))
      .agg(count(lit(1)).as("n_obs"), sum(dnum.cast(dec)).as("__dsum"))
      .select(col("season_idx"), col("n_obs"),
        (asD(col("__dsum")) /
          asD((lit(2L * period) * col("n_obs")).cast(dec))).as("seasonal"))
  }

  /**
   * Holt linear-trend exponential smoothing (Holt 1957 — the standard
   * level+trend forecaster for short operational horizons): per key, over
   * the series ordered by `idxCol`,
   * `l_t = a*y_t + (1-a)*(l + b)`; `b_t = g*(l_t - l) + (1-g)*b`,
   * initialized `l_0 = y_0`, `b_0 = y_1 - y_0`; the h-step forecast is
   * `l_n + h*b_n`. Output per key: n_obs, level, trend, forecast.
   *
   * Reproducibility: the recurrence is evaluated STRICTLY in series order
   * (sequential per key), so every double is a deterministic IEEE
   * evaluation any engine replays bit-for-bit (a recursive CTE in the
   * oracle) — no reordered float sums. Default a = g = 0.5 keeps every
   * intermediate a dyadic rational on integer inputs.
   *
   * Scale: one shuffle on the key; each key's series must fit one task
   * (operational series are date-grained — thousands of points, not
   * billions; the per-key sort is the same discipline as the window ops).
   * The smoothing itself is O(n) per key, embarrassingly parallel across
   * keys.
   */
  def holtForecast(
      df: DataFrame, keyCol: String, idxCol: String, valCol: String,
      alpha: Double = 0.5, gamma: Double = 0.5, horizon: Int = 7): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    require(gamma > 0 && gamma < 1, s"gamma must be in (0,1), got $gamma")
    require(horizon >= 1, s"horizon must be >= 1, got $horizon")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string"), col(idxCol).cast("long"),
        col(valCol).cast("double"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .mapGroups { (key, it) =>
        val series = it.toArray.sortBy(_._2).map(_._3)
        require(series.length >= 2,
          s"holtForecast: key '$key' has ${series.length} point(s); need >= 2")
        var l = series(0)
        var b = series(1) - series(0)
        var i = 1
        while (i < series.length) {
          val y = series(i)
          val l1 = alpha * y + (1 - alpha) * (l + b)
          b = gamma * (l1 - l) + (1 - gamma) * b
          l = l1
          i += 1
        }
        (key, series.length.toLong, l, b, l + horizon * b)
      }
      .toDF(keyCol, "n_obs", "level", "trend", "forecast")
  }

  /**
   * Rolling-origin backtest of [[holtForecast]]: fit on all but the last
   * `horizon` points (in `idxCol` order), forecast each held-out step,
   * and emit ONE ROW PER (key, step) with the actual, the forecast, the
   * absolute error, and the symmetric-APE term `2|f-a| / (|f|+|a|)` —
   * the standard forecast-accuracy protocol (Hyndman & Koehler 2006).
   * Per-point rows instead of a pre-averaged sMAPE keep every number a
   * fixed IEEE expression of the deterministic recurrence (an unordered
   * float mean would not replay bit-for-bit); averaging is one
   * `avg(smape_term)` away for consumers who want the scalar.
   *
   * Scale: identical grain to [[holtForecast]] — one shuffle on the key,
   * O(n) sequential per key, horizon rows out per key.
   */
  def holtBacktest(
      df: DataFrame, keyCol: String, idxCol: String, valCol: String,
      alpha: Double = 0.5, gamma: Double = 0.5, horizon: Int = 7): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    require(gamma > 0 && gamma < 1, s"gamma must be in (0,1), got $gamma")
    require(horizon >= 1, s"horizon must be >= 1, got $horizon")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string"), col(idxCol).cast("long"),
        col(valCol).cast("double"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (key, it) =>
        val pts = it.toArray.sortBy(_._2)
        val n = pts.length - horizon
        require(n >= 2,
          s"holtBacktest: key '$key' has ${pts.length} point(s); need >= ${horizon + 2}")
        val series = pts.map(_._3)
        var l = series(0)
        var b = series(1) - series(0)
        var i = 1
        while (i < n) {
          val y = series(i)
          val l1 = alpha * y + (1 - alpha) * (l + b)
          b = gamma * (l1 - l) + (1 - gamma) * b
          l = l1
          i += 1
        }
        (1 to horizon).iterator.map { h =>
          val f = l + h * b
          val a = series(n - 1 + h)
          val absErr = math.abs(f - a)
          val denom = math.abs(f) + math.abs(a)
          val smape = if (denom == 0.0) 0.0 else 2.0 * absErr / denom
          (key, h, pts(n - 1 + h)._2, a, f, absErr, smape)
        }
      }
      .toDF(keyCol, "step", "idx", "actual", "forecast", "abs_err", "smape_term")
  }
}
