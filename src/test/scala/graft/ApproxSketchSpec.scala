package graft

import org.apache.spark.sql.functions._

/** Accuracy bounds for the sketch aggregates that are rows-only in the
  * gate (their internals differ across engines, so no SQL oracle): HLL
  * approx-distinct and t-digest approximate percentiles. */
class ApproxSketchSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct stays within 5% relative error of exact (q19 bound)") {
    val rows = SparkEntry.queries("q19_approx_distinct")(spark, sf0001)
      .select($"approx_customers", $"exact_customers").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(0).toDouble
      val exact = r.getLong(1).toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"approx=$approx exact=$exact rel_err=${math.abs(approx - exact) / exact}")
    }
  }

  test("percentile_approx at accuracy 2500 lands within 1% rank of the exact percentile") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select($"l_returnflag", $"l_extendedprice".cast("double").as("p"))
    val approx = SparkEntry.queries("q96_approx_percentile")(spark, sf0001)
      .select($"l_returnflag", $"p50_approx", $"p99_approx")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    approx.foreach { case (flag, (p50, p99)) =>
      val vals = li.filter($"l_returnflag" === flag).select($"p")
        .collect().map(_.getDouble(0)).sorted
      def rankOf(v: Double): Double = {
        val below = vals.count(_ <= v).toDouble
        below / vals.length
      }
      // t-digest with accuracy=2500 guarantees rank error <= 1/2500; allow
      // 1% to absorb duplicate-value rank plateaus in the empirical check
      assert(math.abs(rankOf(p50) - 0.50) <= 0.01, s"$flag p50=$p50 rank=${rankOf(p50)}")
      assert(rankOf(p99) >= 0.98, s"$flag p99=$p99 rank=${rankOf(p99)}")
    }
  }
}
