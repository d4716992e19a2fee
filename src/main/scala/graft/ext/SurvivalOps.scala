package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Time-to-event (survival) analysis over an event log — the Kaplan-Meier
 * risk table behind churn/retention curves (Kaplan & Meier, "Nonparametric
 * estimation from incomplete observations", JASA 1958). Each user's
 * observed lifetime is the span from their first to their last active day;
 * users still active near the end of the observation window are CENSORED
 * (their true lifetime is only known to exceed the observed span) — the
 * distinction naive "average lifetime" aggregations get wrong.
 *
 * Output is the KM sufficient table: one row per observed duration t with
 * `n_risk` (users whose lifetime reached t), `n_events` (churned at t),
 * `n_censored` (right-censored at t), and the discrete hazard
 * `n_events / n_risk` (one exact-integer division, oracle-replayable).
 * The survival curve is the running product `Π (1 − hazard)` — left to the
 * caller/spec because a cumulative float product is summation-order
 * territory; every engine-side number here is integer-exact.
 *
 * Plan shape (100 TB): one map-side-combined per-user aggregate (the only
 * shuffle that sees the log), a broadcast one-row observation-end cross,
 * then everything runs on the duration relation whose cardinality is
 * bounded by the OBSERVATION WINDOW IN DAYS — never by the corpus. The
 * risk accumulation is a broadcast theta self-join of that tiny relation
 * (no global window, no single-partition sort of anything unbounded).
 */
object SurvivalOps {

  private val DayNanos = 86400000000000L

  /**
   * KM risk table from raw events. A user churns when their last active
   * day precedes `obs_end − churnGapDays` (the standard inactivity
   * definition); later last-activity is censoring.
   */
  def kmTable(
      events: DataFrame, userCol: String, tsNanosCol: String,
      churnGapDays: Long = 7L): DataFrame = {
    require(churnGapDays >= 0, s"churnGapDays must be >= 0, got $churnGapDays")
    val day = expr(s"$tsNanosCol div $DayNanos")
    val perUser = events.groupBy(col(userCol))
      .agg(min(day).as("__d0"), max(day).as("__d1"))
    val obsEnd = perUser.agg(max(col("__d1")).as("__obs_end"))
    val durations = perUser.crossJoin(broadcast(obsEnd))
      .select((col("__d1") - col("__d0")).as("__t"),
        when(col("__d1") < col("__obs_end") - churnGapDays, 1L).otherwise(0L)
          .as("__ev"))
    val g = durations.groupBy(col("__t"))
      .agg(sum(col("__ev")).as("n_events"),
        sum(lit(1L) - col("__ev")).as("n_censored"))
    val b = broadcast(g.select(col("__t").as("__tb"),
      (col("n_events") + col("n_censored")).as("__leave")))
    g.join(b, col("__tb") >= col("__t"))
      .groupBy(col("__t"), col("n_events"), col("n_censored"))
      .agg(sum(col("__leave")).as("n_risk"))
      .select(col("__t").as("duration_days"), col("n_risk"),
        col("n_events"), col("n_censored"),
        (col("n_events").cast("double") / col("n_risk").cast("double"))
          .as("hazard"))
  }
}
