package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.AsOfJoinExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import graft.SparkSpec

/** The native whole-operator as-of join (AsOfJoinNode/Exec): semantics
  * pinned bit-identical to the composed [[AsOfJoin.asOf]], plan shape
  * pinned to one merge exec fed by co-partitioned sorted children. */
class AsOfNativeSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private lazy val trades = Seq(
    (1L, "A", 100L), (2L, "A", 205L), (3L, "A", 300L),
    (4L, "B", 150L), (5L, "B", 50L)
  ).toDF("trade_id", "sym", "t")
  private lazy val quotes = Seq(
    ("A", 100L, 10.0), ("A", 200L, 11.0), ("A", 250L, 12.0),
    ("B", 100L, 20.0)
  ).toDF("sym", "qt", "px")

  test("native as-of matches the worked examples and keeps left row count") {
    val got = AsOfJoin.asOfNative(trades, "t", quotes, "qt", Seq("sym"), Seq("px"))
    assert(got.columns.toSeq === Seq("trade_id", "sym", "t", "asof_px"))
    val m = got.select($"trade_id", $"asof_px")
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(m(1L) === Some(10.0)) // equal timestamp inclusive
    assert(m(2L) === Some(11.0))
    assert(m(3L) === Some(12.0))
    assert(m(4L) === Some(20.0))
    assert(m(5L) === None)
    assert(got.count() === trades.count())
  }

  test("native == composed on the real events table, tolerance included") {
    val e = graft.io.ParquetIO.tsToNanos(spark.read.parquet(s"$sf0001/events.parquet"))
      .select($"event_id", $"user_id", $"ts")
    val purchases = graft.io.ParquetIO.tsToNanos(spark.read.parquet(s"$sf0001/events.parquet"))
      .filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"value".as("purchase_value"))
    for (tol <- Seq(None, Some(1800000000000L))) {
      val composed = AsOfJoin.asOf(e, "ts", purchases, "ts",
          Seq("user_id"), Seq("purchase_value"), tol)
        .select($"event_id", $"asof_purchase_value").collect()
        .map(r => r.getLong(0) -> Option(r.get(1))).toMap
      val native = AsOfJoin.asOfNative(e, "ts", purchases, "ts",
          Seq("user_id"), Seq("purchase_value"), tol)
        .select($"event_id", $"asof_purchase_value").collect()
        .map(r => r.getLong(0) -> Option(r.get(1))).toMap
      assert(native.size === composed.size)
      assert(native === composed, s"mismatch at tolerance=$tol")
    }
  }

  test("plan: one AsOfJoinExec, both children shuffled to the key — no join fan-out") {
    val df = AsOfJoin.asOfNative(trades, "t", quotes, "qt", Seq("sym"), Seq("px"))
    df.collect() // materialize so AQE finalizes the plan
    val plan = df.queryExecution.executedPlan
    val execs = collect(plan) { case e: AsOfJoinExec => e }
    assert(execs.size === 1, s"expected exactly one AsOfJoinExec in:\n$plan")
    val shuffles = collect(plan) { case s: ShuffleExchangeExec => s }
    assert(shuffles.size === 2, "each side hash-clusters on the key once")
  }

  test("multiple value columns, multiple keys, null left time -> no match") {
    val l = Seq((1L, "A", 1, 100L), (2L, "A", 1, 205L), (3L, "A", 2, 205L))
      .toDF("id", "k1", "k2", "t")
      .union(Seq((4L, "A", 1, 0L)).toDF("id", "k1", "k2", "t")
        .withColumn("t", lit(null).cast("long")))
    val r = Seq(("A", 1, 100L, 1.0, "x"), ("A", 1, 200L, 2.0, "y"), ("A", 2, 300L, 3.0, "z"))
      .toDF("k1", "k2", "qt", "v", "w")
    val got = AsOfJoin.asOfNative(l, "t", r, "qt", Seq("k1", "k2"), Seq("v", "w"))
      .collect().map(row => row.getLong(0) ->
        (Option(row.get(4)), Option(row.get(5)))).toMap
    assert(got(1L) === ((Some(1.0), Some("x"))))
    assert(got(2L) === ((Some(2.0), Some("y"))))
    assert(got(3L) === ((None, None))) // k2=2 has no quote at/before 205
    assert(got(4L) === ((None, None))) // null left time never matches
  }

  test("right rows with null time are ignored; empty right -> all null") {
    val rWithNull = quotes.union(
      Seq(("A", 0L, 99.0)).toDF("sym", "qt", "px")
        .withColumn("qt", lit(null).cast("long")))
    val a = AsOfJoin.asOfNative(trades, "t", rWithNull, "qt", Seq("sym"), Seq("px"))
      .select($"trade_id", $"asof_px").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(a(5L) === None && a(1L) === Some(10.0))
    val empty = AsOfJoin.asOfNative(trades, "t", quotes.filter(lit(false)), "qt",
      Seq("sym"), Seq("px"))
    assert(empty.count() === 5 && empty.filter($"asof_px".isNotNull).count() === 0)
  }

  test("fail-fast: bad column, non-long time") {
    val e1 = intercept[IllegalArgumentException] {
      AsOfJoin.asOfNative(trades, "t", quotes, "qt", Seq("nope"), Seq("px"))
    }
    assert(e1.getMessage.contains("nope") && e1.getMessage.contains("trade_id"))
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoin.asOfNative(trades.withColumn("td", $"t".cast("double")), "td",
        quotes, "qt", Seq("sym"), Seq("px"))
    }
    assert(e2.getMessage.contains("LongType"))
  }
}
