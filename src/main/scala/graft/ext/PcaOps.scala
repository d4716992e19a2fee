package graft.ext

import breeze.linalg.{eigSym, DenseMatrix}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/**
 * PCA for embedding columns — the dimensionality-reduction / whitening pass
 * an embedding pipeline runs before ANN indexing or clustering (smaller
 * codes, decorrelated dimensions; OPQ-style preprocessing).
 *
 * Fit is ONE distributed pass: each partition accumulates (count, sum,
 * upper-triangular Gram) — dim*(dim+3)/2 doubles — and the partials reduce
 * to the driver, where the dim x dim covariance eigendecomposes in
 * milliseconds (breeze eigSym; dim is 64–4096 in practice, never
 * data-sized). No row ever leaves its partition; the shuffle-free shape of
 * QualityModel's train-small/score-everywhere discipline.
 *
 * Projection is a pure codegen expression chain (the randomProject
 * pattern): out_j = dot(vec - mean, component_j) [/ sqrt(eigenvalue_j) when
 * whitening] over literal component rows — scan-fused, no UDF, no
 * broadcast state, embarrassingly parallel at any scale.
 */
object PcaOps {

  final case class PcaModel(
      mean: Array[Double],
      // components(j) is the j-th principal axis, unit length, eigenvalue-descending
      components: Array[Array[Double]],
      eigenvalues: Array[Double],
      totalVariance: Double) {
    def explainedRatio(j: Int): Double = eigenvalues(j) / totalVariance
  }

  /**
   * Fit the top-`k` principal components of a float-vector column.
   * Covariance uses the (n-1) sample normalizer; eigenvalues below
   * numerical zero clamp to 0 so whitening never divides by noise.
   */
  def fit(df: DataFrame, vecCol: String, dim: Int, k: Int): PcaModel = {
    require(k > 0 && k <= dim, s"k must be in [1,$dim], got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val tri = dim * (dim + 1) / 2

    val (n, sum, gram) = df.select(col(vecCol)).as[Seq[Float]]
      .mapPartitions { it =>
        val s = new Array[Double](dim)
        val g = new Array[Double](tri)
        var cnt = 0L
        it.foreach { v =>
          require(v.length == dim, s"expected dim $dim, got ${v.length}")
          var i = 0
          var t = 0
          while (i < dim) {
            val xi = v(i).toDouble
            s(i) += xi
            var j = i
            while (j < dim) { g(t) += xi * v(j).toDouble; j += 1; t += 1 }
            i += 1
          }
          cnt += 1
        }
        Iterator.single((cnt, s, g))
      }
      .reduce { (a, b) =>
        val (na, sa, ga) = a
        val (nb, sb, gb) = b
        var i = 0
        while (i < dim) { sa(i) += sb(i); i += 1 }
        i = 0
        while (i < tri) { ga(i) += gb(i); i += 1 }
        (na + nb, sa, ga)
      }
    require(n > 1, s"PCA needs at least 2 rows, got $n")

    val mean = sum.map(_ / n)
    val cov = DenseMatrix.zeros[Double](dim, dim)
    var i = 0
    var t = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = (gram(t) - n * mean(i) * mean(j)) / (n - 1).toDouble
        cov(i, j) = c
        cov(j, i) = c
        j += 1
        t += 1
      }
      i += 1
    }
    val es = eigSym(cov) // eigenvalues ascending
    val order = (0 until dim).sortBy(j => -es.eigenvalues(j))
    val eigenvalues = order.take(k).map(j => math.max(0.0, es.eigenvalues(j))).toArray
    val components = order.take(k).map { j =>
      Array.tabulate(dim)(r => es.eigenvectors(r, j))
    }.toArray
    val totalVar = (0 until dim).map(j => math.max(0.0, es.eigenvalues(j))).sum
    PcaModel(mean, components, eigenvalues, totalVar)
  }

  /**
   * Project `vecCol` onto the model's components: columns pc_0..pc_{k-1}.
   * `whiten = true` scales each axis by 1/sqrt(eigenvalue) (unit variance
   * per output dimension; axes with eigenvalue ~0 emit 0 rather than
   * dividing by noise). Left-to-right double sums — the q50 bit-exactness
   * discipline.
   */
  def project(df: DataFrame, idCol: String, vecCol: String, model: PcaModel,
      whiten: Boolean = false): DataFrame = {
    val meanLit = typedLit(model.mean.toIndexedSeq)
    val centered = zip_with(col(vecCol), meanLit, (x, m) => x.cast("double") - m)
    val outCols = model.components.zipWithIndex.map { case (comp, j) =>
      val row = typedLit(comp.toIndexedSeq)
      val dot = aggregate(
        zip_with(centered, row, (x, w) => x * w),
        lit(0.0), (acc, x) => acc + x)
      val scaled =
        if (!whiten) dot
        else if (model.eigenvalues(j) > 1e-12) dot / math.sqrt(model.eigenvalues(j))
        else lit(0.0)
      scaled.as(s"pc_$j")
    }
    df.select(col(idCol) +: outCols.toIndexedSeq: _*)
  }
}
