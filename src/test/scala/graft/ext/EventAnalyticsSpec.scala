package graft.ext

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-computed ground truth for the event-analytics family on a tiny
  * fixed event log; the sf-scale versions ride the DuckDB hash oracle
  * (q175–q178). */
class EventAnalyticsSpec extends SparkSpec {

  import spark.implicits._

  private val Day = 86400000000000L
  private val Hour = 3600000000000L
  private val Min = 60000000000L

  // (event_id, user, tsNanos, type, value)
  private lazy val log = Seq(
    // user 1: signup day0, click day0, purchase day0 (+2h), click day2, purchase day9
    (1L, 1L, 0L * Day + 1 * Hour, "signup", 10.0),
    (2L, 1L, 0L * Day + 2 * Hour, "click", 0.0),
    (3L, 1L, 0L * Day + 4 * Hour, "purchase", 25.5),
    (4L, 1L, 2L * Day + 1 * Hour, "click", 0.0),
    (5L, 1L, 9L * Day + 1 * Hour, "purchase", 99.0),
    // user 2: purchase with NO preceding touch; then view, view (same type run)
    (6L, 2L, 1L * Day + 1 * Hour, "purchase", 7.0),
    (7L, 2L, 1L * Day + 2 * Hour, "view", 0.0),
    (8L, 2L, 1L * Day + 3 * Hour, "view", 0.0),
    // user 3: click then purchase 30h later (outside the 24h window)
    (9L, 3L, 0L * Day + 0 * Hour, "click", 0.0),
    (10L, 3L, 1L * Day + 6 * Hour, "purchase", 11.0)
  ).toDF("event_id", "user_id", "ts", "event_type", "value")

  test("retentionCohorts: cohort sizes and offsets match hand computation") {
    val got = EventAnalytics.retentionCohorts(log, "user_id", "ts")
      .orderBy("cohort_day", "day_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // cohort day0 = users {1, 3}: day0 both, day1 user3, day2 user1, day9 user1
    // cohort day1 = user {2}: day1 only
    assert(got === Seq(
      (0L, 0L, 2L), (0L, 1L, 1L), (0L, 2L, 1L), (0L, 9L, 1L),
      (1L, 0L, 1L)))
  }

  test("lastTouchAttribution: window cut, none-bucket, and value sums") {
    val got = EventAnalytics.lastTouchAttribution(log, "user_id", "ts",
        "event_type", "value", convType = "purchase",
        orderTieCol = "event_id", windowNanos = 24L * Hour)
      .orderBy("touch_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    // user1 purchase@4h → click@2h (in window); purchase@day9 → click@day2 (OUT of window → none)
    // user2 purchase → no prior event → none
    // user3 purchase → click 30h earlier → outside 24h → none
    assert(got === Seq(("(none)", 3L, 117.0), ("click", 1L, 25.5)))
  }

  test("scd2History: run compaction, versions, is_current") {
    val got = EventAnalytics.scd2History(log, "user_id", "ts", "event_type",
        orderTieCol = "event_id")
      .orderBy("user_id", "version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getInt(4), r.getBoolean(5))).toSeq
    val u1 = Seq(
      (1L, "signup", 1 * Hour, Some(2 * Hour), 1, false),
      (1L, "click", 2 * Hour, Some(4 * Hour), 2, false),
      (1L, "purchase", 4 * Hour, Some(2 * Day + 1 * Hour), 3, false),
      (1L, "click", 2 * Day + 1 * Hour, Some(9 * Day + 1 * Hour), 4, false),
      (1L, "purchase", 9 * Day + 1 * Hour, None, 5, true))
    // user 2's two consecutive views collapse into ONE interval
    val u2 = Seq(
      (2L, "purchase", 1 * Day + 1 * Hour, Some(1 * Day + 2 * Hour), 1, false),
      (2L, "view", 1 * Day + 2 * Hour, None, 2, true))
    val u3 = Seq(
      (3L, "click", 0L, Some(1 * Day + 6 * Hour), 1, false),
      (3L, "purchase", 1 * Day + 6 * Hour, None, 2, true))
    assert(got === u1 ++ u2 ++ u3)
  }

  test("transitionMatrix: counts and row-normalized probabilities") {
    val got = EventAnalytics.transitionMatrix(log, "user_id", "ts", "event_type",
        orderTieCol = "event_id")
      .orderBy("from_type", "to_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    // transitions: u1: signup→click, click→purchase, purchase→click, click→purchase
    //              u2: purchase→view, view→view
    //              u3: click→purchase
    assert(got === Seq(
      ("click", "purchase", 3L, 1.0),
      ("purchase", "click", 1L, 0.5),
      ("purchase", "view", 1L, 0.5),
      ("signup", "click", 1L, 1.0),
      ("view", "view", 1L, 1.0)))
  }

  test("scd2History: leading NULL attribute still opens version 1") {
    val withNull = Seq(
      (1L, 9L, 0L, null.asInstanceOf[String], 0.0),
      (2L, 9L, Hour, "click", 0.0),
      (3L, 9L, 2 * Hour, "click", 0.0)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = EventAnalytics.scd2History(withNull, "user_id", "ts", "event_type",
        orderTieCol = "event_id")
      .orderBy("version")
      .collect().map(r => (Option(r.getString(1)), r.getLong(2), r.getInt(4))).toSeq
    assert(got === Seq((None, 0L, 1), (Some("click"), Hour, 2)))
  }

  test("sequencePatterns: trigrams from hand timeline, no cross-user runs") {
    // user 1 timeline: signup click purchase click purchase
    //   -> trigrams (signup,click,purchase), (click,purchase,click),
    //      (purchase,click,purchase)
    // user 2: purchase view view -> (purchase,view,view)
    // user 3: click purchase -> too short for a trigram
    val got = EventAnalytics.sequencePatterns(log, "user_id", "ts",
        "event_type", "event_id", n = 3)
      .collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        (r.getLong(3), r.getDouble(4)))).toMap
    assert(got.keySet === Set(
      ("signup", "click", "purchase"), ("click", "purchase", "click"),
      ("purchase", "click", "purchase"), ("purchase", "view", "view")))
    assert(got.values.map(_._1).sum === 4L)
    assert(got(("purchase", "view", "view")) === ((1L, 0.25)))
  }

  test("sequencePatterns: n=2 counts equal the transition matrix") {
    val bi = EventAnalytics.sequencePatterns(log, "user_id", "ts",
        "event_type", "event_id", n = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val tm = EventAnalytics.transitionMatrix(log, "user_id", "ts",
        "event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(bi === tm)
    intercept[IllegalArgumentException] {
      EventAnalytics.sequencePatterns(log, "user_id", "ts", "event_type", "event_id", n = 1)
    }
  }

  test("timeWeightedAverage: durations weight values, last event drops") {
    // user 1: v=1.00 held 10ns, v=3.00 held 20ns, v=9.99 unterminated
    val df = Seq(
      (1L, 1L, 0L, "x", 1.0), (2L, 1L, 10L, "x", 3.0), (3L, 1L, 30L, "x", 9.99),
      // user 2: single event -> no segments -> absent
      (4L, 2L, 5L, "x", 7.0)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = EventAnalytics.timeWeightedAverage(df, "user_id", "ts", "value", "event_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // twap = (100c*10 + 300c*20) / 30 / 100 = 7000/30/100
    assert(got.keySet === Set(1L))
    assert(got(1L)._1 === 2L && got(1L)._2 === 30L)
    assert(math.abs(got(1L)._3 - 7000.0 / 30.0 / 100.0) < 1e-12)
  }

  test("topPaths: ordered, capped, tie-broken path strings") {
    val df = Seq(
      // user 1: a b c (c beyond the cap of 2)
      (1L, 1L, 0L, "a", 0.0), (2L, 1L, 1L, "b", 0.0), (3L, 1L, 2L, "c", 0.0),
      // user 2: same first-2 path via an event-id tie at ts=0
      (5L, 2L, 0L, "b", 0.0), (4L, 2L, 0L, "a", 0.0),
      // user 3: different path
      (6L, 3L, 0L, "b", 0.0), (7L, 3L, 1L, "a", 0.0)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = EventAnalytics.topPaths(df, "user_id", "ts", "event_type", "event_id",
        maxEvents = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // user 2's tie: event_id 4 ("a") precedes 5 ("b") -> same a>b path
    assert(got === Map("a>b" -> 2L, "b>a" -> 1L))
  }

  test("rollingDistinctUsers: window accumulates, repeats collapse, clips to observed days") {
    val df = Seq(
      // users 1,2 on day 0; user 1 again day 1 (twice); user 3 day 9
      (1L, 1L, 0L * Day, "x", 0.0), (2L, 2L, 0L * Day, "x", 0.0),
      (3L, 1L, 1L * Day, "x", 0.0), (4L, 1L, 1L * Day + Hour, "x", 0.0),
      (5L, 3L, 9L * Day, "x", 0.0)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = EventAnalytics.rollingDistinctUsers(df, "user_id", "ts", windowDays = 7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // observed days only: 0, 1, 9 (days 2-6 would also see users 1/2 but
    // aren't in the data -> clipped); day 9 sees only user 3 (window 3-9)
    assert(got === Map(0L -> 2L, 1L -> 2L, 9L -> 1L))
    intercept[IllegalArgumentException] {
      EventAnalytics.rollingDistinctUsers(df, "user_id", "ts", windowDays = 0)
    }
  }

  test("cusumChangePoint: planted level shift peaks at the shift boundary") {
    // type "a": 1 event/hour for hours 0-5, then 3/hour for hours 6-11
    // B=12, T=24; S_k = sum(12*x - 24): -12 each early hour -> S_5 = -72
    // (the |S| peak, exactly at the last pre-shift bucket), then +12
    val rows = ((0 to 5).map(h => (h, 1)) ++ (6 to 11).map(h => (h, 3)))
      .flatMap { case (h, k) => (1 to k).map(i =>
        (h.toLong * 100 + i, 7L, h * Hour, "a", 0.0)) }
      // type "b": flat 2/hour for 4 hours -> S_k = 0 everywhere, peak 0
      // at the earliest bucket
      .++((0 to 3).flatMap(h => (1 to 2).map(i =>
        (9000L + h * 10 + i, 8L, h * Hour, "b", 0.0))))
      .map { case (id, u, ts, ty, v) => (id, u, ts, ty, v) }
    val df = rows.toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = EventAnalytics.cusumChangePoint(df, "ts", "event_type", Hour)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("a") === ((12L, 24L, 72L, 5L)))
    assert(got("b") === ((4L, 8L, 0L, 0L)))
    intercept[IllegalArgumentException] {
      EventAnalytics.cusumChangePoint(df, "ts", "event_type", 0L)
    }
  }

  test("seasonalNaiveError: constant series scores 0, shifts score the jump") {
    // type a: volumes 2,2,2,2 per hour with season=2 -> predictions exact
    val a = (0 to 3).flatMap(h => (1 to 2).map(i =>
      (h.toLong * 10 + i, 1L, h * Hour, "a", 0.0)))
    // type b: volumes 1,1,3,3 with season=2 -> errors |3-1| + |3-1| = 4
    val b = Seq((100L, 2L, 0L, "b", 0.0), (101L, 2L, Hour, "b", 0.0)) ++
      (1 to 3).map(i => (110L + i, 2L, 2 * Hour, "b", 0.0)) ++
      (1 to 3).map(i => (120L + i, 2L, 3 * Hour, "b", 0.0))
    val df = (a ++ b).toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = EventAnalytics.seasonalNaiveError(df, "ts", "event_type", Hour, season = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Double])))).toMap
    assert(got("a") === ((4L, 2L, 0L, Some(0.0))))
    assert(got("b") === ((4L, 2L, 4L, Some(2.0))))
    intercept[IllegalArgumentException] {
      EventAnalytics.seasonalNaiveError(df, "ts", "event_type", Hour, season = 0)
    }
  }

  test("wilsonRate: textbook bounds, degenerate rates stay inside [0,1]") {
    val df = ((1 to 8).map(i => (i.toLong, 1L, 0L, "x", 200.0)) ++
      (9 to 10).map(i => (i.toLong, 1L, 0L, "x", 0.0)) ++
      Seq((11L, 1L, 0L, "allfail", 0.0))).toDF("event_id", "user_id", "ts", "g", "value")
    val got = EventAnalytics.wilsonRate(df, "g", col("value") > 100.0)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getAs[Double]("rate"),
          r.getAs[Double]("wilson_lo"), r.getAs[Double]("wilson_hi")))).toMap
    val (n, s, z) = (10.0, 8.0, 1.959963984540054)
    val p = s / n
    val lo = (p + z * z / (2.0 * n) - z * math.sqrt(p * (1.0 - p) / n + z * z / (4.0 * n * n))) /
      (1.0 + z * z / n)
    val hi = (p + z * z / (2.0 * n) + z * math.sqrt(p * (1.0 - p) / n + z * z / (4.0 * n * n))) /
      (1.0 + z * z / n)
    assert(got("x")._1 === 10L && got("x")._2 === 8L && got("x")._3 === 0.8)
    assert(got("x")._4 === lo && got("x")._5 === hi)
    assert(lo > 0.44 && lo < 0.5 && hi > 0.94 && hi < 0.98) // textbook 8/10
    // p = 0: the Wald interval would collapse to [0, 0]; Wilson doesn't
    val af = got("allfail")
    assert(af._3 === 0.0 && af._4 === 0.0 && af._5 > 0.5)
  }

  test("burstFlags: trailing window counts, boundary inclusion, flags") {
    // user 1: 3 events inside one hour (0, 30m, 59m59.999...s), then one
    // exactly at the window edge (the event at t=0 ages out at t=1h)
    val df = Seq(
      (1L, 1L, 0L, "x", 0.0), (2L, 1L, Hour / 2, "x", 0.0),
      (3L, 1L, Hour - 1, "x", 0.0), (4L, 1L, Hour, "x", 0.0),
      // user 2: two events far apart
      (5L, 2L, 0L, "x", 0.0), (6L, 2L, 10 * Hour, "x", 0.0)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = EventAnalytics.burstFlags(df, "user_id", "ts", Hour, threshold = 3L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    // at t=Hour-1 the window [0, Hour-1] holds events 1,2,3 -> max 3;
    // at t=Hour the window [1, Hour] holds only 2,3,4 -> still 3
    assert(got(1L) === ((4L, 3L, true)))
    assert(got(2L) === ((2L, 1L, false)))
    intercept[IllegalArgumentException] {
      EventAnalytics.burstFlags(df, "user_id", "ts", 0L, 3L)
    }
  }

  test("acfHourly: alternating series gives r=-1 at lag 1 and r=+1 at lag 2") {
    // hourly counts [1, 2, 1, 2, 1]: one event in even hours, two in odd
    val events = (0 until 5).flatMap { h =>
      val n = if (h % 2 == 0) 1 else 2
      (0 until n).map(i => (h.toLong * 100 + i, h * Hour + i))
    }.toDF("event_id", "ts")
    val got = EventAnalytics.acfHourly(events, "ts", maxLag = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1L) === ((4L, -1.0))) // (2,1),(1,2),(2,1),(1,2): perfect anti
    assert(got(2L) === ((3L, 1.0))) // (1,1),(2,2),(1,1): identical series
    assert(got(3L)._1 === 2L)
    assert(math.abs(got(3L)._2 - (-1.0)) < 1e-15)
  }

  test("ohlcBars: open/close follow (ts, tie) order; high/low/count exact") {
    // bucket 0 of key "a": events at ts 5,1,9 (ids 1,2,3) → open = value at
    // ts 1, close = value at ts 9; a ts tie breaks on event_id
    val events = Seq(
      ("a", 5L, 10L, 3.0), ("a", 1L, 20L, 7.0), ("a", 9L, 30L, 1.5),
      ("a", Hour + 2, 40L, 9.0),
      ("b", 4L, 50L, 2.0), ("b", 4L, 60L, 8.0) // tie: open=id50, close=id60
    ).toDF("k", "ts", "event_id", "value")
    val got = EventAnalytics.ohlcBars(events, "k", "ts", "value", "event_id")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6))))
      .toMap
    assert(got(("a", 0L)) === ((7.0, 7.0, 1.5, 1.5, 3L)))
    assert(got(("a", 1L)) === ((9.0, 9.0, 9.0, 9.0, 1L)))
    assert(got(("b", 0L)) === ((2.0, 8.0, 2.0, 8.0, 2L)))
  }

  test("cohortLtv: min-day cohorts, exact cell revenue, per-cohort running sum") {
    // cohort 0: u1 (days 0,1,3), u2 (day 0). cohort 2: u3 (days 2,3).
    val ev = Seq(
      (1L, 0L * Day, 10L), (1L, 1L * Day, 5L), (1L, 3L * Day, 2L),
      (2L, 0L * Day + 7, 1L),
      (3L, 2L * Day, 100L), (3L, 3L * Day + 9, 50L)
    ).toDF("u", "ts", "rev")
    val got = EventAnalytics.cohortLtv(ev, "u", "ts", col("rev"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === Map(
      (0L, 0L) -> ((2L, 11L, 11L)),   // u1 + u2 on day 0
      (0L, 1L) -> ((1L, 5L, 16L)),
      (0L, 3L) -> ((1L, 2L, 18L)),    // age 2 absent, cum skips it
      (2L, 0L) -> ((1L, 100L, 100L)),
      (2L, 1L) -> ((1L, 50L, 150L))))
  }

  test("markovAttribution: closed-form chains — assist channels get credit, dead ends none") {
    // u1: A -> CONV. u2: B -> drop. Chain: START -> {A: 1/2, B: 1/2};
    // A -> CONV always, B -> DROP always. p = 0.5. Removing A kills every
    // conversion (effect 1); removing B changes nothing (effect 0).
    val ev1 = Seq((1L, 0L, "A", 1L), (1L, 10L, "buy", 2L),
      (2L, 0L, "B", 3L)).toDF("u", "ts", "ch", "eid")
    val g1 = EventAnalytics.markovAttribution(ev1, "u", "ts", "ch", "buy", "eid")
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(g1("A") === ((1.0, 1.0, 0.5)))
    assert(g1("B") === ((0.0, 0.0, 0.5)))

    // pure chain A -> B -> CONV for every user: last-touch would give B
    // all credit; removal gives both channels effect 1, share 1/2 each
    val ev2 = (1L to 4L).flatMap(u => Seq((u, 0L, "A", u * 10),
      (u, 1L, "B", u * 10 + 1), (u, 2L, "buy", u * 10 + 2)))
      .toDF("u", "ts", "ch", "eid")
    val g2 = EventAnalytics.markovAttribution(ev2, "u", "ts", "ch", "buy", "eid")
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(g2("A") === ((1.0, 0.5, 1.0)))
    assert(g2("B") === ((1.0, 0.5, 1.0)))
  }

  test("markovAttribution: journeys truncate at the FIRST conversion; no conversions -> NULL shares") {
    // u1 buys twice: the post-conversion touch C must contribute nothing
    val ev = Seq((1L, 0L, "A", 1L), (1L, 1L, "buy", 2L),
      (1L, 2L, "C", 3L), (1L, 3L, "buy", 4L)).toDF("u", "ts", "ch", "eid")
    val got = EventAnalytics.markovAttribution(ev, "u", "ts", "ch", "buy", "eid")
      .collect().map(r => r.getString(0)).toSet
    assert(got === Set("A")) // C never enters the chain
    val none = EventAnalytics.markovAttribution(
      Seq((1L, 0L, "A", 1L)).toDF("u", "ts", "ch", "eid"),
      "u", "ts", "ch", "buy", "eid").collect()
    assert(none.length === 1 && none(0).getDouble(4) === 0.0 &&
      none(0).isNullAt(3)) // p_conv 0, share NULL
  }

  test("markovAttributionFixedPoint: matches the exact solver within one fixed-point ulp") {
    val Scale = 1000000000000L
    // the closed-form assist chain: both channels effect 1, share 1/2
    val ev = (1L to 4L).flatMap(u => Seq((u, 0L, "A", u * 10),
      (u, 1L, "B", u * 10 + 1), (u, 2L, "buy", u * 10 + 2))) ++
      Seq((9L, 0L, "C", 900L)) // a dead-end channel: effect 0
    val df = ev.toDF("u", "ts", "ch", "eid")
    val exact = EventAnalytics.markovAttribution(df, "u", "ts", "ch", "buy", "eid")
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val fp = EventAnalytics.markovAttributionFixedPoint(df, "u", "ts", "ch", "buy", "eid")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(fp.keySet === exact.keySet)
    fp.foreach { case (ch, (p0, re, share)) =>
      val (exRe, exShare, exP0) = exact(ch)
      // floor-division truncation compounds over 40 rounds but stays tiny
      assert(math.abs(p0 / Scale.toDouble - exP0) < 1e-9, s"$ch p0")
      assert(math.abs(re / Scale.toDouble - exRe) < 1e-9, s"$ch effect")
      assert(math.abs(share / Scale.toDouble - exShare) < 1e-9, s"$ch share")
    }
    // no conversions: effects and shares NULL, p_conv_fp 0
    val none = EventAnalytics.markovAttributionFixedPoint(
      Seq((1L, 0L, "A", 1L)).toDF("u", "ts", "ch", "eid"),
      "u", "ts", "ch", "buy", "eid").collect()
    assert(none.length === 1 && none(0).getLong(2) === 0L &&
      none(0).isNullAt(3) && none(0).isNullAt(4))
  }

  test("peakConcurrency: sessionization, touch ties, multi-day carry, gap days") {
    // A: one session [0, 1000] (two events 1000ns apart), another at 3h
    // B: one session [500, 1000] — overlaps A's first -> day-0 peak 2
    // C ends exactly where D starts (10h+100): starts order first -> 2
    // E: one long session [23h, 48.5h] (18 events every 90min, gap 2h
    //    keeps it chained) — open across all of day 1, closes day 2
    // F: a single-event session day1 5h -> day1 peak = E open + F = 2
    val e = (0 until 18).map(i => (900L, 23L * Hour + i * 90 * Min))
    val ev = (Seq(
      (100L, 0L), (100L, 1000L), (100L, 3L * Hour),
      (200L, 500L), (200L, 1000L),
      (300L, 10L * Hour), (300L, 10L * Hour + 100),
      (400L, 10L * Hour + 100),
      (500L, Day + 5 * Hour)
    ) ++ e).toDF("u", "ts")
    val got = EventAnalytics.peakConcurrency(ev, "u", "ts", gapNanos = 2 * Hour)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // day 2's only boundary is E's end: the sweep reads the running sum AT
    // the boundary (post-decrement) -> peak 0, and the day still appears
    assert(got === Map(0L -> 2L, 1L -> 2L, 2L -> 0L))
    // a day with NO boundary is absent: cut E down to end day1 2h (and F
    // with it), add G in day 3 -> day 2 has no row at all
    val ev2 = ev.filter(col("ts") <= Day + 2 * Hour)
      .union(Seq((600L, 3L * Day + Hour)).toDF("u", "ts"))
    val got2 = EventAnalytics.peakConcurrency(ev2, "u", "ts", gapNanos = 2 * Hour)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 === Map(0L -> 2L, 1L -> 0L, 3L -> 1L)) // no day-2 key
    intercept[IllegalArgumentException] {
      EventAnalytics.peakConcurrency(ev, "u", "ts", gapNanos = Day)
    }
  }

  test("peakConcurrency: decomposed plan matches a naive global sweep") {
    val gap = 30L * Min
    val rows = (0 until 500).map { i =>
      ((i % 7).toLong, math.abs(i * 2654435761L) % (3 * Day))
    }
    val got = EventAnalytics.peakConcurrency(
        rows.toDF("u", "ts"), "u", "ts", gapNanos = gap)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // naive: sessionize in Scala, sweep one sorted boundary list
    val sessions = rows.groupBy(_._1).values.flatMap { evs =>
      val ts = evs.map(_._2).sorted
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var st = ts.head; var en = ts.head
      for (t <- ts.tail) {
        if (t - en <= gap) en = t
        else { out += ((st, en)); st = t; en = t }
      }
      out += ((st, en)); out
    }
    val bounds = sessions.flatMap { case (s, e) => Seq((s, 1L), (e, -1L)) }
      .toSeq.sortBy { case (t, d) => (t, -d) }
    var run = 0L
    val naive = scala.collection.mutable.Map.empty[Long, Long]
    for ((t, d) <- bounds) {
      run += d
      val day = t / Day
      naive(day) = math.max(naive.getOrElse(day, Long.MinValue), run)
    }
    assert(got === naive.toMap)
  }

  test("seasonalProfile: periodic series recovers exact seasonal deviations") {
    // x_t = [1,2,3,2][t % 4] over 20 hours: the even-period centered MA is
    // the cycle mean (2) at every interior point, so seasonal = x - 2
    val pattern = Array(1, 2, 3, 2)
    val events = (0 until 20).flatMap { h =>
      (0 until pattern(h % 4)).map(i => (h.toLong * 10 + i, h * Hour + i))
    }.toDF("event_id", "ts")
    val got = EventAnalytics.seasonalProfile(events, "ts", period = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // interior t in [2, 17]: 16 points, 4 per season index
    assert(got(0L) === ((4L, -1.0)))
    assert(got(1L) === ((4L, 0.0)))
    assert(got(2L) === ((4L, 1.0)))
    assert(got(3L) === ((4L, 0.0)))
    // a missing hour densifies to count 0 and shifts the means
    val gappy = events.filter(col("ts") < 10L * Hour || col("ts") >= 11L * Hour)
    val g = EventAnalytics.seasonalProfile(gappy, "ts", period = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(g(2L) < 1.0) // season 2 lost its t=10 count-3 hour to the gap
    intercept[IllegalArgumentException] {
      EventAnalytics.seasonalProfile(events, "ts", period = 5)
    }
  }

  test("acfHourly: calendar lag — a missing hour forms no pair; constant is NULL") {
    // hours 0,1,3 present (hour 2 empty): lag-1 pairs only (1,0); lag-2 (3,1)
    val events = Seq((1L, 0L * Hour), (2L, 0L * Hour + 5),
      (3L, 1L * Hour), (4L, 3L * Hour), (5L, 3L * Hour + 9), (6L, 3L * Hour + 10)
    ).toDF("event_id", "ts")
    val got = EventAnalytics.acfHourly(events, "ts", maxLag = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    // each lag has exactly ONE calendar pair -> zero variance -> NULL r
    assert(got(1L) === ((1L, None)))
    assert(got(2L) === ((1L, None)))
    intercept[IllegalArgumentException] {
      EventAnalytics.acfHourly(events, "ts", maxLag = 0)
    }
  }

  test("holtForecast: exact on a linear trend, flat on a constant series") {
    import spark.implicits._
    // y = 10 + 3t: Holt with l0=y0, b0=y1-y0 tracks a line EXACTLY
    // (l_t = y_t, b_t = 3 by induction), so the forecast is the
    // continuation 10 + 3*(n-1) + 3h with zero error
    val lin = (0L until 20L).map(t => ("a", t, 10L + 3 * t))
      .toDF("k", "t", "y")
    val r = EventAnalytics.holtForecast(lin, "k", "t", "y", horizon = 7).head()
    assert(r.getLong(1) === 20L)
    assert(r.getDouble(2) === 10.0 + 3 * 19) // level = last y
    assert(r.getDouble(3) === 3.0) // trend
    assert(r.getDouble(4) === 10.0 + 3 * 19 + 3 * 7) // forecast
    val const = (0L until 10L).map(t => ("c", t, 42L)).toDF("k", "t", "y")
    val rc = EventAnalytics.holtForecast(const, "k", "t", "y", horizon = 3).head()
    assert(rc.getDouble(2) === 42.0 && rc.getDouble(3) === 0.0 && rc.getDouble(4) === 42.0)
  }

  test("holtBacktest: per-step rows match the prefix-fit recurrence exactly") {
    import spark.implicits._
    // y = 10 + 3t is tracked exactly, so every held-out forecast is the
    // true continuation and every error term is exactly 0
    val lin = (0L until 15L).map(t => ("a", t, 10.0 + 3 * t)).toDF("k", "t", "y")
    val r = EventAnalytics.holtBacktest(lin, "k", "t", "y", horizon = 4)
      .orderBy($"step").collect()
    assert(r.length === 4)
    r.zipWithIndex.foreach { case (row, i) =>
      assert(row.getInt(1) === i + 1)
      assert(row.getLong(2) === 11L + i) // held-out idx
      assert(row.getDouble(4) === row.getDouble(3)) // forecast == actual
      assert(row.getDouble(5) === 0.0 && row.getDouble(6) === 0.0)
    }
    // irregular series: replay the recurrence by hand on the train prefix
    val ys = Seq(4.0, 7.0, 5.0, 9.0, 6.0, 8.0)
    val df = ys.zipWithIndex.map { case (y, t) => ("k", t.toLong, y) }.toDF("k", "t", "y")
    var l = ys(0)
    var b = ys(1) - ys(0)
    for (i <- 1 until 4) { // horizon=2 -> train on first 4
      val l1 = 0.5 * ys(i) + 0.5 * (l + b)
      b = 0.5 * (l1 - l) + 0.5 * b
      l = l1
    }
    val rr = EventAnalytics.holtBacktest(df, "k", "t", "y", horizon = 2)
      .orderBy($"step").collect()
    assert(rr(0).getDouble(4) === l + 1 * b)
    assert(rr(1).getDouble(4) === l + 2 * b)
    assert(rr(0).getDouble(6) ===
      2.0 * math.abs(l + b - ys(4)) / (math.abs(l + b) + math.abs(ys(4))))
    intercept[Exception] {
      EventAnalytics.holtBacktest(df, "k", "t", "y", horizon = 5).collect()
    }
  }

  test("holtForecast: hand-computed recurrence on a short irregular series") {
    import spark.implicits._
    val ys = Seq(4.0, 7.0, 5.0, 9.0)
    val df = ys.zipWithIndex.map { case (y, t) => ("k", t.toLong, y) }.toDF("k", "t", "y")
    var l = ys(0)
    var b = ys(1) - ys(0)
    for (i <- 1 until ys.length) {
      val l1 = 0.5 * ys(i) + 0.5 * (l + b)
      b = 0.5 * (l1 - l) + 0.5 * b
      l = l1
    }
    val r = EventAnalytics.holtForecast(df, "k", "t", "y", horizon = 2).head()
    assert(r.getDouble(2) === l)
    assert(r.getDouble(3) === b)
    assert(r.getDouble(4) === l + 2 * b)
    // rows arriving out of order sort by the index column first
    val shuffled = Seq(("k", 2L, 5.0), ("k", 0L, 4.0), ("k", 3L, 9.0), ("k", 1L, 7.0))
      .toDF("k", "t", "y")
    val rs = EventAnalytics.holtForecast(shuffled, "k", "t", "y", horizon = 2).head()
    assert(rs.getDouble(2) === l && rs.getDouble(3) === b)
    intercept[Exception] {
      EventAnalytics.holtForecast(Seq(("k", 0L, 1.0)).toDF("k", "t", "y"),
        "k", "t", "y").collect()
    }
  }
}
