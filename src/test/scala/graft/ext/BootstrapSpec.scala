package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Poisson bootstrap: pinned CDF thresholds re-derive from StrictMath,
  * weights distribute like Poisson(1), the whole CI is deterministic and
  * partitioning-independent, and intervals behave (bracket the mean,
  * ordered). The sf-scale readout rides the gate (q289) against the full
  * DuckDB resampling replay. */
class BootstrapSpec extends SparkSpec {

  import spark.implicits._

  test("pinned hex thresholds equal floor(F(k)*2^52) from StrictMath.exp") {
    val e1 = StrictMath.exp(-1.0)
    var term = e1
    var cdf = 0.0
    val derived = (0 to 8).map { k =>
      cdf += term
      term = term / (k + 1)
      f"${(cdf * 4503599627370496.0).toLong}%013x"
    }
    assert(derived === Bootstrap.PoissonCdfHex52)
  }

  test("weights distribute like Poisson(1): mean ~1, P(0) ~ 1/e, truncation cap 9") {
    val n = 200000
    val w = (1 to n).toDF("id")
      .select(Bootstrap.poissonWeight(
        substring(md5(concat(lit("wtest:"), col("id").cast("string"))), 1, 13)).as("w"))
      .groupBy("w").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val mean = w.map { case (k, c) => k.toLong * c }.sum.toDouble / n
    assert(math.abs(mean - 1.0) < 0.01, s"mean weight $mean")
    val p0 = w(0).toDouble / n
    assert(math.abs(p0 - StrictMath.exp(-1.0)) < 0.01, s"P(w=0) $p0")
    assert(w.keys.max <= 9)
  }

  test("deterministic and partitioning-independent; CI brackets the mean") {
    val df = (1 to 2000).map(i => (if (i % 2 == 0) "a" else "b", i.toLong, (i % 97).toLong * 10))
      .toDF("g", "id", "cents")
    val base = Bootstrap.bootstrapMeanCi(df, Seq("g"), "id", "cents",
      resamples = 100, seed = "s1").collect()
      .map(r => r.getString(0) -> r).toMap
    for (parts <- Seq(1, 7, 32)) {
      val got = Bootstrap.bootstrapMeanCi(df.repartition(parts), Seq("g"), "id", "cents",
        resamples = 100, seed = "s1").collect().map(r => r.getString(0) -> r).toMap
      for (g <- Seq("a", "b")) {
        assert(got(g).toString === base(g).toString, s"parts=$parts g=$g")
      }
    }
    for (g <- Seq("a", "b")) {
      val r = base(g)
      val (m, lo, hi) = (r.getAs[Double]("mean_cents"), r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
      assert(lo < m && m < hi, s"CI [$lo, $hi] must bracket mean $m for $g")
      assert(r.getAs[Long]("b_eff") === 100L)
      assert(r.getAs[Long]("n_rows") === 1000L)
    }
  }

  test("a different seed moves the draws; a tiny group still yields ordered bounds") {
    val df = (1 to 50).map(i => ("g", i.toLong, i.toLong)).toDF("g", "id", "cents")
    val a = Bootstrap.bootstrapMeanCi(df, Seq("g"), "id", "cents", resamples = 50, seed = "sA").head()
    val b = Bootstrap.bootstrapMeanCi(df, Seq("g"), "id", "cents", resamples = 50, seed = "sB").head()
    assert(a.getAs[Double]("ci_lo") !== b.getAs[Double]("ci_lo"))
    assert(a.getAs[Double]("ci_lo") <= a.getAs[Double]("ci_hi"))
  }
}
