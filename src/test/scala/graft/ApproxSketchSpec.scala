package graft

import org.apache.spark.sql.functions._

/** Accuracy bounds for the sketch aggregates that are rows-only in the
  * gate (their internals differ across engines, so no SQL oracle): HLL
  * approx-distinct and t-digest approximate percentiles. */
class ApproxSketchSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct stays within 5% relative error of exact (q19 bound)") {
    import org.apache.spark.sql.functions._
    // the q19 query now exports the bound as a pinned boolean; check the
    // underlying sketch against ground truth here, then the exported flag
    val rows = spark.read.parquet(s"$sf0001/orders.parquet")
      .groupBy($"o_orderpriority")
      .agg(approx_count_distinct($"o_custkey", rsd = 0.01).as("approx_customers"),
        countDistinct($"o_custkey").as("exact_customers"))
      .select($"approx_customers", $"exact_customers").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(0).toDouble
      val exact = r.getLong(1).toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"approx=$approx exact=$exact rel_err=${math.abs(approx - exact) / exact}")
    }
    val flags = SparkEntry.queries("q19_approx_distinct")(spark, sf0001)
      .select($"approx_ok").collect()
    assert(flags.nonEmpty && flags.forall(_.getBoolean(0)))
  }

  test("percentile_approx at accuracy 2500 lands within 1% rank of the exact percentile") {
    import org.apache.spark.sql.functions._
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select($"l_returnflag", $"l_extendedprice".cast("double").as("p"))
    val approx = li
      .groupBy($"l_returnflag")
      .agg(percentile_approx($"p", lit(0.5), lit(2500)).as("p50_approx"),
        percentile_approx($"p", lit(0.99), lit(2500)).as("p99_approx"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // the exported q96 contract flags must all hold
    val flags = SparkEntry.queries("q96_approx_percentile")(spark, sf0001)
      .select($"p50_ok", $"p99_ok").collect()
    assert(flags.nonEmpty && flags.forall(r => r.getBoolean(0) && r.getBoolean(1)))
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
