package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RobustStatsSpec extends SparkSpec {
  import spark.implicits._

  test("thresholds are the exact k-th order statistics, k = ceil(pct*n/100)") {
    // group a: values 1..10 -> p20 = 2nd smallest = 2, p80 = 8
    // group b: values 100,200,300 -> p20 = ceil(0.6)=1st = 100, p80 = ceil(2.4)=3rd = 300
    val df = ((1 to 10).map(v => ("a", v.toDouble)) ++
      Seq(("b", 100.0), ("b", 200.0), ("b", 300.0))).toDF("g", "v")
    val th = RobustStats.groupQuantileThresholds(df, "g", "v", 20, 80)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(th("a") === ((10L, 2.0, 8.0)))
    assert(th("b") === ((3L, 100.0, 300.0)))
  }

  test("winsorize clips to the thresholds and preserves row count") {
    val df = ((1 to 100).map(v => ("a", v.toDouble))).toDF("g", "v")
    val w = RobustStats.winsorize(df, "g", "v", 5, 95)
    assert(w.count() === 100)
    val clipped = w.select($"v_w").collect().map(_.getDouble(0))
    assert(clipped.min === 5.0) // ceil(5*100/100)=5th smallest
    assert(clipped.max === 95.0)
    // interior values untouched
    val m = w.select($"v", $"v_w").collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(m(50.0) === 50.0 && m(1.0) === 5.0 && m(100.0) === 95.0)
  }

  test("matches the per-group window formulation (the plan we refuse to run)") {
    val df = (0 until 500).map(i => (s"g${i % 3}", ((i * 37) % 97).toDouble)).toDF("g", "v")
    val got = RobustStats.groupQuantileThresholds(df, "g", "v", 10, 90)
      .collect().map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    val byWindow = df.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy($"g").orderBy($"v")))
      .withColumn("n", count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy($"g")))
      .filter($"rn" === expr("greatest(1L, (n * 10 + 99) div 100)") ||
        $"rn" === expr("greatest(1L, (n * 90 + 99) div 100)"))
      .groupBy($"g")
      .agg(min(when($"rn" === expr("greatest(1L, (n * 10 + 99) div 100)"), $"v")).as("lo"),
        min(when($"rn" === expr("greatest(1L, (n * 90 + 99) div 100)"), $"v")).as("hi"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got === byWindow)
  }

  test("validation fails fast on bad percentile bounds") {
    val df = Seq(("a", 1.0)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      RobustStats.groupQuantileThresholds(df, "g", "v", 90, 10)
    }
    intercept[IllegalArgumentException] {
      RobustStats.groupQuantileThresholds(df, "g", "v", -1, 50)
    }
  }
}
