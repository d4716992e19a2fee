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

  test("chiSquareCells: independent table contributes zero, dependent doesn't") {
    // perfectly independent 2x2: every cell O = R*C/N exactly
    val indep = Seq.fill(4)(("r1", "c1")) ++ Seq.fill(4)(("r1", "c2")) ++
      Seq.fill(4)(("r2", "c1")) ++ Seq.fill(4)(("r2", "c2"))
    val gotIndep = RegressionOps.chiSquareCells(indep.toDF("a", "b"), "a", "b")
      .collect()
    assert(gotIndep.length === 4)
    assert(gotIndep.forall(_.getAs[Double]("contribution") === 0.0))
    assert(gotIndep.forall(r => r.getAs[Long]("row_total") === 8L &&
      r.getAs[Long]("col_total") === 8L && r.getAs[Long]("n_total") === 16L))

    // textbook 2x2: [[10, 0], [0, 10]] — maximal association
    val dep = Seq.fill(10)(("r1", "c1")) ++ Seq.fill(10)(("r2", "c2"))
    val gotDep = RegressionOps.chiSquareCells(dep.toDF("a", "b"), "a", "b")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Double]("contribution")).toMap
    // each observed cell: (10*20 - 10*10)^2 / (20*10*10) = 10000/2000 = 5
    assert(gotDep(("r1", "c1")) === 5.0)
    assert(gotDep(("r2", "c2")) === 5.0)
    // chi2 total = sum of contributions = 20 = N (phi = 1), absent cells
    // aren't rows (observed 0 never forms a cell in a count table)
    assert(gotDep.values.sum === 10.0 && gotDep.size === 2)
  }

  test("welchTTest: textbook values, guards on tiny or missing sides") {
    // group g: A = {1, 2, 3}, B = {2, 4, 6} (values in whole units)
    val rows = Seq(("g", "A", 1.0), ("g", "A", 2.0), ("g", "A", 3.0),
      ("g", "B", 2.0), ("g", "B", 4.0), ("g", "B", 6.0),
      // group h: B side has a single observation -> NULL t
      ("h", "A", 1.0), ("h", "A", 2.0), ("h", "B", 5.0),
      // group i: no B at all -> NULL t
      ("i", "A", 1.0), ("i", "A", 2.0))
    val got = RegressionOps.welchTTest(rows.toDF("g", "c", "v"), "g", "c", "v", "A", "B")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap
    // cents: A = {100,200,300} mean 200 var 10000; B = {200,400,600} mean 400 var 40000
    // t = (200-400)/sqrt(10000/3 + 40000/3) = -200/sqrt(50000/3)
    val expT = -200.0 / math.sqrt(10000.0 / 3.0 + 40000.0 / 3.0)
    assert(got("g")._1 === 3L && got("g")._2 === 3L)
    assert(math.abs(got("g")._3.get - expT) < 1e-12)
    assert(got("h") === ((2L, 1L, None)))
    assert(got("i") === ((2L, 0L, None)))
  }

  test("ksTest: identical samples give D=0, disjoint samples give D=1") {
    val same = (1 to 50).flatMap(v =>
      Seq(("g", "A", v.toDouble), ("g", "B", v.toDouble)))
    val gotSame = RegressionOps.ksTest(same.toDF("g", "c", "v"), "g", "c", "v", "A", "B")
      .collect().head
    assert(gotSame.getAs[Long]("n_a") === 50L && gotSame.getAs[Long]("n_b") === 50L)
    assert(gotSame.getAs[Long]("d_num") === 0L)
    assert(gotSame.getAs[Double]("d") === 0.0)

    val disjoint = (1 to 20).map(v => ("g", "A", v.toDouble)) ++
      (100 to 130).map(v => ("g", "B", v.toDouble))
    val gotDis = RegressionOps.ksTest(disjoint.toDF("g", "c", "v"), "g", "c", "v", "A", "B")
      .collect().head
    assert(gotDis.getAs[Double]("d") === 1.0)
  }

  test("ksTest: hand ECDF gap, tie convention, and group independence") {
    // group g: A = {1, 2, 3, 4}, B = {3, 4, 5, 6}
    // ECDF gaps at 1:1/4, 2:2/4, 3:|3/4-1/4|=2/4, 4:|1-2/4|=2/4, 5:1/4, 6:0
    // D = 1/2 (d_num = max|cumA*4 - cumB*4| = 8)
    val rows = (1 to 4).map(v => ("g", "A", v.toDouble)) ++
      (3 to 6).map(v => ("g", "B", v.toDouble)) ++
      // group h: a tied value on both sides — the gap is measured AFTER
      // both step: A = {1, 1, 2}, B = {1, 3, 3}
      // at v=1: |2*3 - 1*3| = 3; v=2: |3*3 - 1*3| = 6; v=3: 0 -> D = 6/9
      Seq(("h", "A", 1.0), ("h", "A", 1.0), ("h", "A", 2.0),
        ("h", "B", 1.0), ("h", "B", 3.0), ("h", "B", 3.0))
    val got = RegressionOps.ksTest(rows.toDF("g", "c", "v"), "g", "c", "v", "A", "B")
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("d_num"), r.getAs[Double]("d")))).toMap
    assert(got("g") === ((4L, 4L, 8L, 0.5)))
    assert(got("h") === ((3L, 3L, 6L, 6.0 / 9.0)))
    // layout independence of the prefix-scan plan
    val again = RegressionOps.ksTest(rows.toDF("g", "c", "v").repartition(7),
        "g", "c", "v", "A", "B")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("d_num")).toMap
    assert(again === Map("g" -> 8L, "h" -> 6L))
  }

  test("mannWhitneyAuc: separation extremes, tie credit, hand midranks") {
    def run(rows: Seq[(String, String, Double)]) =
      RegressionOps.mannWhitneyAuc(rows.toDF("g", "c", "v"), "g", "c", "v", "A", "B")
        .collect().map(r => r.getString(0) ->
          ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
            // r2_a rides DECIMAL(38,0) (rank sums overflow long at scale)
            r.getAs[java.math.BigDecimal]("r2_a").longValueExact(),
            r.getAs[Double]("auc")))).toMap
    // A entirely below B -> AUC 0; entirely above -> 1
    val lo = run(Seq(("g", "A", 1.0), ("g", "A", 2.0), ("g", "B", 3.0), ("g", "B", 4.0)))
    assert(lo("g")._4 === 0.0)
    val hi = run(Seq(("g", "A", 3.0), ("g", "A", 4.0), ("g", "B", 1.0), ("g", "B", 2.0)))
    assert(hi("g")._4 === 1.0)
    // full ties -> exactly 0.5 (the half-credit convention)
    val tie = run(Seq(("g", "A", 5.0), ("g", "B", 5.0)))
    assert(tie("g") === ((1L, 1L, 3L, 0.5))) // midrank 1.5, r2 = 3
    // hand case: A = {1, 3}, B = {2, 3}; ranks 1, 2, (3.5, 3.5 tied)
    // R_A = 1 + 3.5 = 4.5 -> r2_a = 9; U = 4.5 - 3 = 1.5; AUC = 1.5/4
    val mid = run(Seq(("g", "A", 1.0), ("g", "A", 3.0), ("g", "B", 2.0), ("g", "B", 3.0)))
    assert(mid("g") === ((2L, 2L, 9L, 0.375)))
  }

  test("mannWhitneyAuc is the exact ROC AUC of a score against a label") {
    // scores for positives (A) and negatives (B); brute-force AUC =
    // (wins + ties/2) / (n_a*n_b)
    val a = Seq(0.9, 0.8, 0.8, 0.4, 0.3)
    val b = Seq(0.7, 0.8, 0.2, 0.1)
    val brute = (for { x <- a; y <- b } yield
      if (x > y) 1.0 else if (x == y) 0.5 else 0.0).sum / (a.size * b.size)
    val rows = a.map(("g", "A", _)) ++ b.map(("g", "B", _))
    val got = RegressionOps.mannWhitneyAuc(rows.toDF("g", "c", "v").repartition(5),
        "g", "c", "v", "A", "B")
      .collect().head.getAs[Double]("auc")
    assert(got === brute)
  }

  test("covarianceMatrixCents: textbook values, variance diagonal, pair count") {
    // x = 1,2,3,4; y = 2,4,6,8 -> var(x) = 5/3, cov(x,y) = 10/3, var(y) = 20/3
    val df = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0), (4.0, 8.0)).toDF("x", "y")
    val got = RegressionOps.covarianceMatrixCents(df, Seq("x", "y"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got.size === 3) // k(k+1)/2 unordered pairs incl. diagonal
    assert(got(("x", "x"))._1 === 4L)
    assert(math.abs(got(("x", "x"))._2 - 5.0 / 3.0) < 1e-12)
    assert(math.abs(got(("x", "y"))._2 - 10.0 / 3.0) < 1e-12)
    assert(math.abs(got(("y", "y"))._2 - 20.0 / 3.0) < 1e-12)
    // constant column: zero variance and zero covariance, exactly
    val dfc = Seq((1.0, 5.0), (2.0, 5.0), (3.0, 5.0)).toDF("x", "k")
    val gotc = RegressionOps.covarianceMatrixCents(dfc, Seq("x", "k"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(gotc(("k", "k")) === 0.0 && gotc(("x", "k")) === 0.0)
    intercept[IllegalArgumentException] {
      RegressionOps.covarianceMatrixCents(df, Seq("x"))
    }
  }

  test("spearmanByGroup: monotone = 1, reversed = -1, outlier-immune, ties") {
    // perfect monotone (nonlinear!) relation -> rho exactly 1
    val mono = (1 to 20).map(i => ("g", i.toDouble, (i * i).toDouble))
    val up = RegressionOps.spearmanByGroup(mono.toDF("g", "x", "y"), "g", "x", "y")
      .collect().head
    assert(up.getAs[Double]("spearman_rho") === 1.0)
    // reversed -> -1 even with a wild y outlier (rank-based)
    val rev = (1 to 20).map(i => ("g", i.toDouble,
      if (i == 1) 1e9 else (21 - i).toDouble))
    val dn = RegressionOps.spearmanByGroup(rev.toDF("g", "x", "y"), "g", "x", "y")
      .collect().head
    assert(dn.getAs[Double]("spearman_rho") === -1.0)
    // all-tied x: zero rank variance -> NULL (guarded)
    val flat = (1 to 5).map(i => ("g", 7.0, i.toDouble))
    assert(RegressionOps.spearmanByGroup(flat.toDF("g", "x", "y"), "g", "x", "y")
      .collect().head.isNullAt(2))
    // hand midrank case vs a driver-side reference with average ranks
    val rows = Seq(("g", 1.0, 2.0), ("g", 2.0, 2.0), ("g", 2.0, 5.0), ("g", 4.0, 1.0))
    def ranks(vs: Seq[Double]): Seq[Double] = {
      val sorted = vs.sorted
      vs.map(v => {
        val first = sorted.indexOf(v); val last = sorted.lastIndexOf(v)
        (first + last) / 2.0 + 1.0
      })
    }
    val rx = ranks(rows.map(_._2)); val ry = ranks(rows.map(_._3))
    val n = rows.size.toDouble
    val (sx, sy) = (rx.sum, ry.sum)
    val sxy = rx.zip(ry).map { case (a, b) => a * b }.sum
    val sxx = rx.map(a => a * a).sum; val syy = ry.map(a => a * a).sum
    val expRho = (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    val gotRho = RegressionOps.spearmanByGroup(rows.toDF("g", "x", "y"), "g", "x", "y")
      .collect().head.getAs[Double]("spearman_rho")
    assert(math.abs(gotRho - expRho) < 1e-12)
  }

  test("cupedAdjust: removes a planted covariate imbalance; pooled theta exact") {
    // y = 2x exactly, but variant 1 drew larger-x users: raw means differ
    // (3 vs 7) purely from the pre-period imbalance; theta = 2 and both
    // adjusted means collapse to the pooled 5 — the textbook CUPED win
    val units = Seq((0L, 1L, 2L), (0L, 2L, 4L), (1L, 3L, 6L), (1L, 4L, 8L))
      .toDF("variant", "x", "y")
    val got = RegressionOps.cupedAdjust(units, "variant", "x", "y")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got(0L) === ((2L, 3.0, 5.0, 2.0)))
    assert(got(1L) === ((2L, 7.0, 5.0, 2.0)))
  }

  test("cupedAdjust: balanced covariate preserves the treatment effect; var(X)=0 is NULL theta") {
    // y = 3x + 5*treat with identical x distributions: theta = 3 (the
    // treatment indicator is orthogonal to x), adjusted = raw means
    val units = Seq(
      (0L, 1L, 3L), (0L, 2L, 6L), (0L, 3L, 9L),
      (1L, 1L, 8L), (1L, 2L, 11L), (1L, 3L, 14L)).toDF("variant", "x", "y")
    val got = RegressionOps.cupedAdjust(units, "variant", "x", "y")
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got(0L) === ((6.0, 6.0, 3.0)))
    assert(got(1L) === ((11.0, 11.0, 3.0)))
    // constant covariate: theta NULL, mean_adj degrades to mean_post
    val flat = Seq((0L, 5L, 2L), (0L, 5L, 4L), (1L, 5L, 10L))
      .toDF("variant", "x", "y")
    val g2 = RegressionOps.cupedAdjust(flat, "variant", "x", "y")
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(2), r.getDouble(3), r.isNullAt(4)))).toMap
    assert(g2(0L) === ((3.0, 3.0, true)))
    assert(g2(1L) === ((10.0, 10.0, true)))
  }

  test("cohensKappa: textbook 2x2 matrix matches the closed form") {
    import spark.implicits._
    // 20 yes-yes, 5 yes-no, 10 no-yes, 15 no-no:
    // po = 35/50 = 0.7; pe = (25*30 + 25*20)/2500 = 0.5; kappa = 0.4
    val rows =
      Seq.fill(20)(("yes", "yes")) ++ Seq.fill(5)(("yes", "no")) ++
        Seq.fill(10)(("no", "yes")) ++ Seq.fill(15)(("no", "no"))
    val got = RegressionOps.cohensKappa(rows.toDF("a", "b"), "a", "b")
      .collect().head
    assert(got.getLong(0) === 50L)
    assert(got.getLong(1) === 35L)
    assert(got.getDouble(2) === 0.7)
    assert(got.getDouble(3) === 0.5)
    assert(math.abs(got.getDouble(4) - 0.4) < 1e-15)
  }

  test("cohensKappa: perfect agreement is 1; single-cell degenerate is NULL") {
    import spark.implicits._
    val perfect = Seq(("x", "x"), ("y", "y"), ("z", "z"), ("x", "x"))
    assert(RegressionOps.cohensKappa(perfect.toDF("a", "b"), "a", "b")
      .collect().head.getDouble(4) === 1.0)
    // all mass in one cell: pe = 1, kappa undefined -> NULL
    val degen = Seq(("x", "x"), ("x", "x"))
    assert(RegressionOps.cohensKappa(degen.toDF("a", "b"), "a", "b")
      .collect().head.isNullAt(4))
    // NULL labels are excluded from the confusion matrix
    val withNulls = Seq(("x", "x"), ("x", null), (null, "x"), ("y", "y"))
      .toDF("a", "b")
    assert(RegressionOps.cohensKappa(withNulls, "a", "b")
      .collect().head.getLong(0) === 2L)
  }
}
