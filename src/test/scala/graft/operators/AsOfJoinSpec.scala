package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // trades enriched with the latest quote at-or-before the trade time
  private lazy val trades = Seq(
    (1L, "A", 100L), (2L, "A", 205L), (3L, "A", 300L),
    (4L, "B", 150L), (5L, "B", 50L)
  ).toDF("trade_id", "sym", "t")
  private lazy val quotes = Seq(
    ("A", 100L, 10.0), ("A", 200L, 11.0), ("A", 250L, 12.0),
    ("B", 100L, 20.0)
  ).toDF("sym", "qt", "px")

  test("asOf picks the latest right row at-or-before each left time; null when none") {
    val got = AsOfJoin.asOf(trades, "t", quotes, "qt", Seq("sym"), Seq("px"))
      .select($"trade_id", $"asof_px")
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(got(1L) === Some(10.0)) // equal timestamp is inclusive
    assert(got(2L) === Some(11.0)) // 205 -> quote@200
    assert(got(3L) === Some(12.0)) // 300 -> quote@250
    assert(got(4L) === Some(20.0))
    assert(got(5L) === None) // before any quote for B
  }

  test("multiple value columns and schema: left columns preserved + asof_* appended") {
    val q2 = quotes.withColumn("venue", concat(lit("v"), $"px".cast("int")))
    val got = AsOfJoin.asOf(trades, "t", q2, "qt", Seq("sym"), Seq("px", "venue"))
    assert(got.columns.toSeq === Seq("trade_id", "sym", "t", "asof_px", "asof_venue"))
    val r = got.filter($"trade_id" === 3L).head()
    assert(r.getAs[Double]("asof_px") === 12.0 && r.getAs[String]("asof_venue") === "v12")
    assert(got.count() === trades.count()) // never multiplies or drops left rows
  }

  test("tolerance nulls matches older than the bound; boundary is inclusive") {
    val got = AsOfJoin.asOf(trades, "t", quotes, "qt", Seq("sym"), Seq("px"),
      tolerance = Some(50L))
      .select($"trade_id", $"asof_px")
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(got(1L) === Some(10.0)) // age 0
    assert(got(2L) === Some(11.0)) // age 5
    assert(got(3L) === Some(12.0)) // age 50 == tolerance -> inclusive
    assert(got(4L) === Some(20.0)) // t=150 vs quote@100: age 50, inclusive
    assert(got(5L) === None)       // no match at all
  }

  test("a NULL-valued right row is still THE match (no resurrection of older values)") {
    // quotes for A: 100 -> 10.0, 200 -> null; a trade at 205 must see the
    // null (latest ROW), not 10.0 — and with tolerance 50 the 10.0 quote
    // is out of range anyway
    val q = Seq(("A", 100L, Some(10.0)), ("A", 200L, Option.empty[Double]))
      .toDF("sym", "qt", "px")
    val tr = Seq((1L, "A", 205L)).toDF("trade_id", "sym", "t")
    val noTol = AsOfJoin.asOf(tr, "t", q, "qt", Seq("sym"), Seq("px"))
      .select($"asof_px").head()
    assert(noTol.isNullAt(0), "latest right row has null px -> match is null")
    val withTol = AsOfJoin.asOf(tr, "t", q, "qt", Seq("sym"), Seq("px"), tolerance = Some(50L))
      .select($"asof_px").head()
    assert(withTol.isNullAt(0))
  }

  test("plan shape: one shuffle (hash partition by key), no join operator") {
    val plan = AsOfJoin.asOf(trades, "t", quotes, "qt", Seq("sym"), Seq("px"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"expected no join node\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1, plan)
  }

  test("asOfBucketed matches asOf on the small fixtures (tolerance included)") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(rows(AsOfJoin.asOfBucketed(trades, "t", quotes, "qt", Seq("sym"), Seq("px"), buckets = 3))
      === rows(AsOfJoin.asOf(trades, "t", quotes, "qt", Seq("sym"), Seq("px"))))
    assert(rows(AsOfJoin.asOfBucketed(trades, "t", quotes, "qt", Seq("sym"), Seq("px"),
        tolerance = Some(50L), buckets = 4))
      === rows(AsOfJoin.asOf(trades, "t", quotes, "qt", Seq("sym"), Seq("px"),
        tolerance = Some(50L))))
  }

  test("asOfBucketed splits a hot key: correct result, no straggler window partition") {
    // one user holds 50% of all rows — the skew shape the plain per-key
    // window serializes into a single straggler task
    val rng = new scala.util.Random(7)
    val hot = (0 until 4000).map(i => (i.toLong, "hot", i.toLong * 10 + rng.nextInt(5)))
    val rest = (0 until 4000).map { i =>
      (10000L + i, s"u${i % 40}", i.toLong * 10 + rng.nextInt(5))
    }
    val events = (hot ++ rest).toDF("event_id", "user", "t")
    val state = events.filter($"event_id" % 3 === 0)
      .select($"user", $"t" - 1 as "st", concat(lit("s"), $"event_id") as "v")

    val buckets = 16
    val exact = AsOfJoin.asOf(events, "t", state, "st", Seq("user"), Seq("v"))
    val split = AsOfJoin.asOfBucketed(events, "t", state, "st", Seq("user"), Seq("v"),
      buckets = buckets)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toString).sorted.toSeq
    assert(rows(split) === rows(exact))

    // skew evidence: the hot key's rows now spread across the bucket salt —
    // the largest (key, bucket) window group is a small fraction of the hot
    // key's total, so no single task sorts half the data
    val all = events.select($"user", $"t")
      .unionByName(state.select($"user", $"st".as("t")))
    val Seq(mn, mx) = all.agg(min($"t"), max($"t")).head().toSeq.map(_.asInstanceOf[Long]).toSeq
    val width = math.max(1L, (mx - mn) / buckets + 1)
    val maxGroup = all.groupBy($"user", (($"t" - mn) / width).cast("int").as("b"))
      .count().agg(max($"count")).head().getLong(0)
    val hotTotal = all.filter($"user" === "hot").count()
    assert(maxGroup <= hotTotal / 4,
      s"largest salted group $maxGroup should be far below the hot key's $hotTotal rows")
  }
}
