package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RegressionOpsSpec extends SparkSpec {

  import spark.implicits._

  test("olsByGroup recovers a planted linear relationship exactly") {
    // g=a: y = 3x + 7 exactly; g=b: y = -2x + 1 exactly
    val pts = (1 to 50).flatMap { i =>
      Seq(("a", i.toDouble, 3.0 * i + 7.0), ("b", i.toDouble, -2.0 * i + 1.0))
    }.toDF("g", "x", "y")
    val got = RegressionOps.olsByGroup(pts, "g", "x", "y")
      .orderBy("g").collect()
    assert(got(0).getString(0) === "a")
    assert(math.abs(got(0).getDouble(2) - 3.0) < 1e-9)   // slope
    assert(math.abs(got(0).getDouble(3) - 7.0) < 1e-9)   // intercept
    assert(math.abs(got(0).getDouble(4) - 1.0) < 1e-12)  // r2
    assert(math.abs(got(1).getDouble(2) + 2.0) < 1e-9)
    assert(math.abs(got(1).getDouble(3) - 1.0) < 1e-9)
  }

  test("olsByGroup matches the textbook formula on noisy data") {
    val pts = (0 until 200).map { i =>
      val x = (i % 40).toDouble
      val y = 1.5 * x + 4.0 + (((i * 31) % 11) - 5).toDouble // deterministic noise
      ("g", x, y)
    }
    val df = pts.toDF("g", "x", "y")
    val r = RegressionOps.olsByGroup(df, "g", "x", "y").collect().head
    // reference computation in plain scala
    val n = pts.length.toDouble
    val sx = pts.map(_._2).sum; val sy = pts.map(_._3).sum
    val sxy = pts.map(p => p._2 * p._3).sum; val sxx = pts.map(p => p._2 * p._2).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val intercept = (sy - slope * sx) / n
    assert(math.abs(r.getDouble(2) - slope) < 1e-9)
    assert(math.abs(r.getDouble(3) - intercept) < 1e-9)
    assert(r.getDouble(4) > 0.9 && r.getDouble(4) < 1.0)
  }

  test("zero x-variance group emits NULL coefficients, not a crash") {
    val df = Seq(("g", 5.0, 1.0), ("g", 5.0, 2.0), ("g", 5.0, 3.0)).toDF("g", "x", "y")
    val r = RegressionOps.olsByGroup(df, "g", "x", "y").collect().head
    assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
  }

  test("countCorrelation: identical series correlate at 1, opposite at -1") {
    // two categories with identical per-bucket counts, one anti-phased
    val rows = (0 until 40).flatMap { b =>
      val k = 1 + b % 5
      Seq.fill(k)((b.toLong, "same1")) ++ Seq.fill(k)((b.toLong, "same2")) ++
        Seq.fill(6 - k)((b.toLong, "anti"))
    }.toDF("b", "cat")
    val got = RegressionOps.countCorrelation(rows, col("b"), "cat")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(3))).toMap
    assert(math.abs(got(("same1", "same2")) - 1.0) < 1e-12)
    assert(math.abs(got(("anti", "same1")) + 1.0) < 1e-12)
    assert(math.abs(got(("anti", "same2")) + 1.0) < 1e-12)
  }

  test("countCorrelation densifies: a category absent from a bucket counts 0") {
    // cat 'rare' appears only in bucket 0; 'base' in all 3 buckets equally.
    val rows = (Seq((0L, "rare")) ++ (0L to 2L).map((_, "base"))).toDF("b", "cat")
    val r = RegressionOps.countCorrelation(rows, col("b"), "cat").collect().head
    // base counts (1,1,1): zero variance -> NULL correlation (guarded)
    assert(r.getString(0) === "base" && r.getString(1) === "rare")
    assert(r.getLong(2) === 3L)
    assert(r.isNullAt(3))
  }
}
