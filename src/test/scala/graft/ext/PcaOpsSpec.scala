package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PcaOpsSpec extends SparkSpec {

  import spark.implicits._

  private val dim = 8

  /** Deterministic data with planted structure: variance ~100 along a known
    * diagonal axis u = (1,1,0,...)/sqrt(2), ~1 along e3, ~0.01 elsewhere. */
  private lazy val planted = {
    def noise(i: Int, j: Int): Double = (((i * 31 + j * 17) % 97) - 48) / 480.0 // +-0.1
    (0 until 600).map { i =>
      val t = ((i % 60) - 30).toDouble // sd ~17 along u
      val s = (((i * 7) % 20) - 10) / 10.0 // sd ~0.6 along e3
      val v = Array.tabulate(dim)(j => noise(i, j).toFloat)
      v(0) = (t / math.sqrt(2) + noise(i, 0)).toFloat
      v(1) = (t / math.sqrt(2) + noise(i, 1)).toFloat
      v(2) = (s + noise(i, 2)).toFloat
      (i.toLong, v.toSeq)
    }.toDF("id", "vec")
  }

  private lazy val model = PcaOps.fit(planted, "vec", dim, k = 3)

  test("first component recovers the planted axis") {
    val u = Array.tabulate(dim)(j => if (j < 2) 1.0 / math.sqrt(2) else 0.0)
    val cosine = math.abs(model.components(0).zip(u).map { case (a, b) => a * b }.sum)
    assert(cosine > 0.999, s"planted-axis cosine $cosine")
  }

  test("components are orthonormal and eigenvalues descend") {
    for (a <- model.components.indices; b <- a until model.components.length) {
      val dot = model.components(a).zip(model.components(b)).map { case (x, y) => x * y }.sum
      if (a == b) assert(math.abs(dot - 1.0) < 1e-9, s"norm of c$a = $dot")
      else assert(math.abs(dot) < 1e-9, s"c$a . c$b = $dot")
    }
    assert(model.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
  }

  test("projected variance matches the eigenvalues") {
    val proj = PcaOps.project(planted, "id", "vec", model)
    val stats = proj.agg(
      var_samp(col("pc_0")), var_samp(col("pc_1")), var_samp(col("pc_2"))).collect().head
    for (j <- 0 until 3) {
      val v = stats.getDouble(j)
      assert(math.abs(v - model.eigenvalues(j)) <= 1e-6 * math.max(1.0, model.eigenvalues(j)),
        s"var(pc_$j)=$v eigenvalue=${model.eigenvalues(j)}")
    }
  }

  test("whitened projection has unit variance per axis") {
    val proj = PcaOps.project(planted, "id", "vec", model, whiten = true)
    val stats = proj.agg(
      var_samp(col("pc_0")), var_samp(col("pc_1")), var_samp(col("pc_2"))).collect().head
    for (j <- 0 until 3)
      assert(math.abs(stats.getDouble(j) - 1.0) < 1e-6, s"whitened var(pc_$j)=${stats.getDouble(j)}")
  }

  test("explained-variance ratios are sane and dominated by the planted axis") {
    val r0 = model.explainedRatio(0)
    val total = (0 until 3).map(model.explainedRatio).sum
    assert(r0 > 0.95 && total <= 1.0 + 1e-12, s"r0=$r0 total=$total")
  }

  test("projection matches a by-hand dot product on one row") {
    val row = planted.filter(col("id") === 5L).select("vec").as[Seq[Float]].head()
    val got = PcaOps.project(planted.filter(col("id") === 5L), "id", "vec", model)
      .select("pc_0").as[Double].head()
    val want = row.zipWithIndex.map { case (x, j) =>
      (x.toDouble - model.mean(j)) * model.components(0)(j) }.sum
    assert(math.abs(got - want) < 1e-12)
  }

  test("fit rejects mismatched dimensions and degenerate inputs") {
    intercept[IllegalArgumentException] { PcaOps.fit(planted, "vec", dim, k = 0) }
    intercept[Exception] {
      PcaOps.fit(Seq((1L, Seq(1.0f, 2.0f))).toDF("id", "vec"), "vec", 3, 1)
    }
  }
}
