package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SemiJoinReducerSpec extends SparkSpec {
  import spark.implicits._

  test("semi-join equals IN-subquery semantics; schema preserved; no row multiplication") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val got = SemiJoinReducer.reduce(orders, "o_orderkey", li, "l_orderkey")
    assert(got.schema === orders.schema)
    val keys = li.select($"l_orderkey").distinct().as[Long].collect().toSet
    val exp = orders.filter($"o_orderkey".isin(keys.toSeq: _*))
    assert(got.count() === exp.count())
    assert(got.exceptAll(exp).count() === 0)
    // lineitem repeats order keys ~4x; output must not multiply
    assert(got.count() === got.select($"o_orderkey").distinct().count())
  }

  test("SQL semantics: NULL keys never match (both sides)") {
    val dim = Seq((Some(1L), "a"), (None, "null-dim"), (Some(3L), "c")).toDF("k", "v")
    val fact = Seq(Some(1L), None, Some(9L)).toDF("fk")
    val got = SemiJoinReducer.reduce(dim, "k", fact, "fk").select($"v").as[String].collect().toSet
    assert(got === Set("a"))
  }

  test("legacy string-key semantics: NULL matches NULL, cross-type values match by rendering") {
    // reference joins on to_string(): NULL renders "null" and matches NULL
    // (join.rs:66-70,115-119); INT32 5 matches INT64 5
    val dim = Seq((Some(1), "a"), (None, "null-dim"), (Some(5), "five")).toDF("k", "v")
    val factLong = Seq[Option[Long]](None, Some(5L)).toDF("fk")
    val got = SemiJoinReducer.reduce(dim, "k", factLong, "fk", legacyStringKeys = true)
      .select($"v").as[String].collect().toSet
    assert(got === Set("null-dim", "five"))
    // SQL mode on the same inputs: NULL drops, typed equality still matches 5
    val sql = SemiJoinReducer.reduce(dim, "k", factLong, "fk")
      .select($"v").as[String].collect().toSet
    assert(sql === Set("five"))
  }

  test("anti-join is the exact complement of semi-join") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val semi = SemiJoinReducer.reduce(orders, "o_orderkey", li, "l_orderkey")
    val anti = SemiJoinReducer.antiReduce(orders, "o_orderkey", li, "l_orderkey")
    assert(semi.count() + anti.count() === orders.count())
    assert(semi.join(anti, Seq("o_orderkey"), "inner").count() === 0)
  }

  test("missing column fails fast with a named error") {
    val dim = Seq((1, "a")).toDF("k", "v")
    val e = intercept[IllegalArgumentException](
      SemiJoinReducer.reduce(dim, "nope", dim, "k"))
    assert(e.getMessage.contains("nope"))
  }

  test("build side is broadcast (plan check at 100TB shape: probe never shuffles)") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val plan = SemiJoinReducer.reduce(orders, "o_orderkey", li, "l_orderkey")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"), plan)
  }
}
