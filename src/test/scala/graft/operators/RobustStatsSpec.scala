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

  test("madOutliers: hand-computed medians, MADs, and flags") {
    // group a: values 1..9 plus a wild 1000 (n=10).
    // lower median (k = ceil(10/2) = 5) = 5; |v-5| sorted:
    // 0,1,1,2,2,3,3,4,4,995 -> MAD (k=5) = 2. Threshold 3/2: outlier iff
    // |v-5|*2 > 3*2=6, i.e. |v-5| > 3 -> values 1, 9, 1000.
    val vals = (1L to 9L) :+ 1000L
    val df = vals.map(("a", _)).toDF("g", "v")
    val got = RobustStats.madOutliers(df, "g", "v", kNum = 3, kDen = 2)
    val rows = got.collect()
    assert(rows.forall(_.getAs[Long]("med") === 5L))
    assert(rows.forall(_.getAs[Long]("mad") === 2L))
    val flagged = rows.filter(_.getAs[Boolean]("is_outlier")).map(_.getAs[Long]("v")).sorted
    assert(flagged === Array(1L, 9L, 1000L))
    // the wild value moved neither the median nor the MAD: robust by
    // construction (a mean/std gate would have been dragged to ~105)
  }

  test("madOutliers keeps groups independent and validates k") {
    val df = (Seq.fill(5)("a").zip(Seq(1L, 2L, 3L, 4L, 100L)) ++
      Seq.fill(3)("b").zip(Seq(10L, 11L, 12L))).toDF("g", "v")
    val got = RobustStats.madOutliers(df, "g", "v", kNum = 3, kDen = 1)
      .collect().groupBy(_.getAs[String]("g"))
    // group a: med 3, deviations 0,1,1,2,97 -> mad 1; |100-3|=97 > 3 flagged
    assert(got("a").count(_.getAs[Boolean]("is_outlier")) === 1)
    // group b: med 11, mad 1, no value deviates beyond 3
    assert(got("b").forall(!_.getAs[Boolean]("is_outlier")))
    intercept[IllegalArgumentException] {
      RobustStats.madOutliers(df, "g", "v", kNum = 1, kDen = 0)
    }
  }

  test("weightedMedianByGroup: weight mass, not row count, picks the center") {
    val df = Seq(("a", 1.0, 1L), ("a", 2.0, 1L), ("a", 3.0, 10L))
      .toDF("g", "v", "w")
    val got = RobustStats.weightedMedianByGroup(df, "g", "v", "w")
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    // total 12; cum at 1->1, 2->2, 3->12; first v with 2*cum >= 12 is 3
    // (the UNWEIGHTED lower median would be 2)
    assert(got === Map("a" -> ((3.0, 12L))))
  }

  test("weightedMedianByGroup: unit weights reduce to the lower median") {
    val df = (1 to 4).map(v => ("a", v.toDouble, 1L)).toDF("g", "v", "w")
    val got = RobustStats.weightedMedianByGroup(df, "g", "v", "w").collect()
    assert(got.map(r => (r.getDouble(1), r.getLong(2))).toSeq === Seq((2.0, 4L)))
  }

  test("weightedMedianByGroup: duplicate values collapse, groups independent, layout-free") {
    val df = Seq(
      ("a", 1.0, 3L), ("a", 1.0, 3L), ("a", 2.0, 1L),
      ("b", 5.0, 1L), ("b", 7.0, 2L)).toDF("g", "v", "w")
    def run(d: org.apache.spark.sql.DataFrame) =
      RobustStats.weightedMedianByGroup(d, "g", "v", "w")
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val got = run(df)
    // a: value 1 carries weight 6 of 7 -> 1; b: cum 5->1, 7->3, 2*1<3 -> 7
    assert(got === Set(("a", 1.0, 7L), ("b", 7.0, 3L)))
    assert(run(df.repartition(7)) === got)
  }

  test("groupQuantiles: vector of ceil-index order statistics in one pass") {
    val df = ((1 to 100).map(v => ("a", v.toDouble)) ++
      Seq(("b", 5.0), ("b", 6.0))).toDF("g", "v")
    val got = RobustStats.groupQuantiles(df, "g", "v", Seq(25, 50, 90, 100))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got("a") === ((100L, 25.0, 50.0, 90.0, 100.0)))
    // b: n=2 -> p25 = ceil(0.5) = 1st = 5, p50 = 1st = 5, p90/p100 = 2nd = 6
    assert(got("b") === ((2L, 5.0, 5.0, 6.0, 6.0)))
    // agrees with the two-point groupQuantileThresholds on the same rule
    val th = RobustStats.groupQuantileThresholds(df, "g", "v", 25, 90)
      .collect().map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(th("a") === ((got("a")._2, got("a")._4)))
    intercept[IllegalArgumentException] {
      RobustStats.groupQuantiles(df, "g", "v", Seq(50, 50))
    }
  }

  test("percentRankTable matches SQL PERCENT_RANK, incl. ties and 1-row groups") {
    import org.apache.spark.sql.expressions.Window
    val df = (Seq(("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 5.0)) ++
      Seq(("b", 9.0))).toDF("g", "v")
    val got = RobustStats.percentRankTable(df, "g", "v")
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // a: n=4; ranks 1, 2 (tie run of 2), 4 -> pct 0, 1/3, 1
    assert(got(("a", 1.0)) === ((1L, 0.0)))
    assert(got(("a", 2.0)) === ((2L, 1.0 / 3.0)))
    assert(got(("a", 5.0)) === ((1L, 1.0)))
    // single-row group: the SQL convention is 0
    assert(got(("b", 9.0)) === ((1L, 0.0)))
    // agrees with Spark's own window function on the same data
    val ref = df.select($"g", $"v",
        org.apache.spark.sql.functions.percent_rank()
          .over(Window.partitionBy($"g").orderBy($"v")).as("pr"))
      .distinct().collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(ref === got.map { case (k, v) => k -> v._2 })
  }

  test("imputeGroupMedian: NULLs fill with the group median, all-NULL groups stay NULL") {
    val df = Seq(
      ("a", Some(1.0)), ("a", Some(3.0)), ("a", Some(9.0)), ("a", None),
      ("b", None), ("b", None)).map { case (g, v) => (g, v.map(Double.box).orNull) }
      .toDF("g", "v").selectExpr("g", "CAST(v AS DOUBLE) AS v")
    val got = RobustStats.imputeGroupMedian(df, "g", "v")
      .collect().map(r => (r.getString(0), Option(r.get(1)),
        Option(r.get(2)).map(_.asInstanceOf[Double]), r.getBoolean(3)))
    // a's lower median of {1, 3, 9} is 3; the NULL row fills with it
    val aImputed = got.filter(r => r._1 == "a" && r._2.isEmpty)
    assert(aImputed.map(r => (r._3, r._4)).toSeq === Seq((Some(3.0), true)))
    assert(got.filter(r => r._1 == "a" && r._2.nonEmpty).forall(!_._4))
    // b has no observed values: filled stays NULL, not imputed
    assert(got.filter(_._1 == "b").forall(r => r._3.isEmpty && !r._4))
    assert(got.length === 6)
  }

  test("modeByGroup: most frequent value, smallest-value tie-break") {
    val df = Seq(
      ("a", 2.0), ("a", 2.0), ("a", 5.0),
      // b: 1.0 and 3.0 both appear twice -> tie to the smaller value
      ("b", 3.0), ("b", 1.0), ("b", 3.0), ("b", 1.0), ("b", 9.0)
    ).toDF("g", "v")
    val got = RobustStats.modeByGroup(df, "g", "v")
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(got === Map("a" -> ((2.0, 2L)), "b" -> ((1.0, 2L))))
  }

  test("quantileNormalizeTable: groups map onto the global marginal") {
    // group a = {10, 20}, group b = {100, 200}; global sorted =
    // [10, 20, 100, 200], N=4, bins=4 -> targets p1..p4 = 10,20,100,200
    // in-group ECDF (n=2): first value -> p = ceil(4*1/2) = 2,
    // second -> p = 4; so a: 10->20, 20->200; b: 100->20, 200->200
    val df = Seq(("a", 10.0), ("a", 20.0), ("b", 100.0), ("b", 200.0))
      .toDF("g", "v")
    val got = RobustStats.quantileNormalizeTable(df, "g", "v", bins = 4)
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        ((r.getLong(3), r.getDouble(4)))).toMap
    assert(got(("a", 10.0)) === ((2L, 20.0)))
    assert(got(("a", 20.0)) === ((4L, 200.0)))
    assert(got(("b", 100.0)) === ((2L, 20.0)))
    assert(got(("b", 200.0)) === ((4L, 200.0)))
    // both groups now share the identical marginal {20, 200}: the
    // definition of quantile normalization
    intercept[IllegalArgumentException] {
      RobustStats.quantileNormalizeTable(df, "g", "v", bins = 0)
    }
  }

  test("tukeyFences: hand quartiles, fences, and outside counts") {
    // group a: 1..11 plus wild 100 -> n=12; q1 = 3rd = 3, q3 = 9th = 9
    // IQR 6 -> fences [-6, 18]; only 100 is outside (above)
    val df = ((1 to 11).map(v => ("a", v.toDouble)) :+ (("a", 100.0))).toDF("g", "v")
    val r = RobustStats.tukeyFences(df, "g", "v").collect().head
    assert(r.getLong(1) === 12L)
    assert(r.getDouble(2) === 3.0 && r.getDouble(3) === 9.0)
    assert(r.getDouble(4) === -6.0 && r.getDouble(5) === 18.0)
    assert(r.getLong(6) === 0L && r.getLong(7) === 1L)
    intercept[IllegalArgumentException] {
      RobustStats.tukeyFences(df, "g", "v", kNum = 1, kDen = 0)
    }
  }
}
