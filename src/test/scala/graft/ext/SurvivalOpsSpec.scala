package graft.ext

import graft.SparkSpec

/** Hand-computed Kaplan-Meier ground truth; the sf-scale version rides the
  * DuckDB hash oracle (q255). */
class SurvivalOpsSpec extends SparkSpec {

  import spark.implicits._

  private val Day = 86400000000000L

  // u1: span [0,2] -> dur 2; u2: [0,0] -> 0; u3: [1,4] -> 3; u4: [8,10] -> 2.
  // obs_end = 10; churn gap 3 -> churned iff last day < 7: u1, u2, u3; u4
  // is censored at duration 2.
  private lazy val ev = Seq(
    (1L, 0L * Day), (1L, 2L * Day),
    (2L, 0L * Day),
    (3L, 1L * Day), (3L, 2L * Day), (3L, 4L * Day),
    (4L, 8L * Day), (4L, 10L * Day)
  ).toDF("u", "ts")

  test("kmTable: risk sets, events, censoring, and hazards match the textbook table") {
    val got = SurvivalOps.kmTable(ev, "u", "ts", churnGapDays = 3L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got === Map(
      0L -> ((4L, 1L, 0L, 0.25)),
      2L -> ((3L, 1L, 1L, 1.0 / 3.0)),
      3L -> ((1L, 1L, 0L, 1.0))))
    // KM survival curve from the hazards: S = prod(1 - h) in t order
    val s = got.toSeq.sortBy(_._1).scanLeft(1.0) { case (acc, (_, (_, _, _, h))) =>
      acc * (1.0 - h)
    }.tail
    assert(s.zip(Seq(0.75, 0.5, 0.0)).forall { case (a, b) => math.abs(a - b) < 1e-15 })
  }

  test("kmTable: users active at the observation edge are censored, never events") {
    // churn gap 0: only users whose last day IS obs_end are censored
    val got = SurvivalOps.kmTable(ev, "u", "ts", churnGapDays = 0L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got(2L) === ((1L, 1L))) // u1 churns, u4 (last day = 10 = obs_end) censored
    // a large gap censors everyone -> zero hazards everywhere
    val all = SurvivalOps.kmTable(ev, "u", "ts", churnGapDays = 100L)
      .collect().map(r => (r.getLong(2), r.getDouble(4)))
    assert(all.forall { case (d, h) => d == 0L && h == 0.0 })
  }
}
