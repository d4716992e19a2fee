package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Skyline: agreement with the brute-force dominance reference across
  * dimensions/partitionings, tie/duplicate retention, loud failure on the
  * candidate cap and NULL dims. The sf-scale frontier rides the gate
  * (q285/q287) against the O(n log n) window-dominance oracle. */
class SkylineSpec extends SparkSpec {

  import spark.implicits._

  private def brute(points: Seq[Seq[Double]]): Set[Seq[Double]] =
    points.filter { x =>
      !points.exists { y =>
        y.zip(x).forall { case (a, b) => a >= b } && y.zip(x).exists { case (a, b) => a > b }
      }
    }.toSet

  private def scatter(n: Int, d: Int, seed: Long): Seq[Seq[Double]] =
    (1 to n).map { i =>
      (1 to d).map { j =>
        val h = (i * 0x9e3779b97f4a7c15L + j * 0xbf58476d1ce4e5b9L + seed)
        ((h % 1000L) + 1000L) % 1000L / 10.0
      }
    }

  test("2-d and 3-d skylines match the brute-force reference at several partitionings") {
    for (d <- Seq(2, 3); parts <- Seq(1, 7)) {
      val pts = scatter(800, d, seed = d * 31L)
      val cols = (1 to d).map(j => s"d$j")
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(pts.map(Row.fromSeq), parts),
        org.apache.spark.sql.types.StructType(cols.map(c =>
          org.apache.spark.sql.types.StructField(c, org.apache.spark.sql.types.DoubleType))))
      val got = Skyline.skyline(df, cols).collect()
        .map(r => cols.indices.map(r.getDouble).toSeq).toSet
      assert(got === brute(pts), s"d=$d parts=$parts")
    }
  }

  test("duplicate frontier points all survive; dominated duplicates all drop") {
    val pts = Seq(Seq(5.0, 5.0), Seq(5.0, 5.0), Seq(1.0, 1.0), Seq(1.0, 1.0), Seq(5.0, 1.0))
    val df = pts.map(p => (p(0), p(1))).toDF("a", "b").repartition(3)
    val got = Skyline.skyline(df, Seq("a", "b")).collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(got.count(_ == ((5.0, 5.0))) === 2)
    assert(!got.contains((1.0, 1.0)))
    assert(!got.contains((5.0, 1.0))) // dominated by (5,5): >= both, > on b
  }

  test("per-group skyline equals per-group brute force and groups never mix") {
    val pts = for (g <- Seq("x", "y"); p <- scatter(300, 2, if (g == "x") 1L else 2L))
      yield (g, p(0), p(1))
    val df = pts.toDF("g", "a", "b").repartition(5)
    val got = Skyline.skylinePerGroup(df, Seq("g"), Seq("a", "b")).collect()
      .groupBy(_.getString(0))
      .map { case (g, rs) => g -> rs.map(r => Seq(r.getDouble(1), r.getDouble(2))).toSet }
    for (g <- Seq("x", "y")) {
      val ref = brute(pts.filter(_._1 == g).map(t => Seq(t._2, t._3)))
      assert(got(g) === ref, s"group $g")
    }
  }

  test("anti-correlated blow-up past the cap completes via tournament rounds, exactly") {
    // anti-correlated diagonal: every point is on the TRUE frontier, so no
    // tournament round can shrink below 100 candidates and the pre-r7 code
    // failed loudly here. The escalation path must coalesce to one
    // partition and return the exact frontier instead.
    val diagPts = (1 to 100).map(i => (i.toDouble, (101 - i).toDouble))
    val diag = diagPts.toDF("a", "b").repartition(8)
    val got = Skyline.skyline(diag, Seq("a", "b"), maxCandidates = 10)
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    assert(got === diagPts.toSet)
    // mixed fixture: a large anti-correlated band PLUS dominated points —
    // the tournament must still prune every dominated row
    val mixed = (diagPts.map { case (a, b) => (a, b) } ++
      (1 to 400).map(i => ((i % 50).toDouble, (i % 37).toDouble))).toDF("a", "b")
      .repartition(16)
    val got2 = Skyline.skyline(mixed, Seq("a", "b"), maxCandidates = 10)
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    assert(got2 === diagPts.toSet) // every (i, 101-i) dominates the %50/%37 box
  }

  test("tournament escalation keeps a hard single-task memory bound that fails loudly") {
    // the escalation path must NOT become a silent single-task OOM: when a
    // coalesced round would funnel more than maxSinglePassRows candidates
    // into one task, it refuses with the bound in the message
    val diag = (1 to 100).map(i => (i.toDouble, (101 - i).toDouble)).toDF("a", "b")
      .repartition(8)
    val e = intercept[IllegalArgumentException] {
      Skyline.skyline(diag, Seq("a", "b"), maxCandidates = 10, maxSinglePassRows = 20L)
    }
    assert(e.getMessage.contains("maxSinglePassRows=20"))
    // with the bound above the candidate volume the same input still
    // completes exactly through the tournament
    val got = Skyline.skyline(diag, Seq("a", "b"), maxCandidates = 10,
        maxSinglePassRows = 200L)
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    assert(got === (1 to 100).map(i => (i.toDouble, (101 - i).toDouble)).toSet)
  }

  test("NULL and NaN dimensions fail loudly") {
    val withNull = Seq((Some(1.0), 2.0), (None, 3.0)).toDF("a", "b")
    val e2 = intercept[Exception] {
      Skyline.skyline(withNull, Seq("a", "b")).collect()
    }
    assert(e2.getMessage.contains("NULL in skyline dimension") ||
      e2.getCause != null && e2.getCause.getMessage.contains("NULL in skyline dimension"))
    // NaN is never dominated (all comparisons false): it would silently
    // pollute the frontier, so it must be rejected like NULL
    val withNaN = Seq((1.0, 2.0), (Double.NaN, 3.0)).toDF("a", "b")
    val e3 = intercept[Exception] {
      Skyline.skyline(withNaN, Seq("a", "b")).collect()
    }
    assert(e3.getMessage.contains("NaN in skyline dimension") ||
      e3.getCause != null && e3.getCause.getMessage.contains("NaN in skyline dimension"))
    val e4 = intercept[Exception] {
      Skyline.skylinePerGroup(withNaN.withColumn("g", lit("x")), Seq("g"), Seq("a", "b")).collect()
    }
    assert(e4.getMessage.contains("NaN in skyline dimension") ||
      e4.getCause != null && e4.getCause.getMessage.contains("NaN in skyline dimension"))
  }

  test("integer-typed dimensions work (numeric widening)") {
    val df = Seq((1, 10L), (2, 5L), (3, 1L), (2, 9L)).toDF("a", "b")
    val got = Skyline.skyline(df, Seq("a", "b")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(got === Set((1, 10L), (2, 9L), (3, 1L)))
  }
}
