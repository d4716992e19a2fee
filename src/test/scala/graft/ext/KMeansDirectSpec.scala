package graft.ext

import graft.SparkSpec
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.graft.KMeansDirect
import org.apache.spark.sql.functions._

/** KMeansDirect exists only as a faster invocation of the SAME training
  * loop the ml Estimator runs — this suite pins the bit-identity that
  * makes it a pure optimization (r11): identical centroids, identical
  * predictions, for both init modes the engine uses. */
class KMeansDirectSpec extends SparkSpec {

  private def vecs(n: Int, dim: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      i.toLong -> (0 until dim).map(d => math.sin(i * 0.7 + d * 1.3).toFloat)
    }.toDF("id", "v")
      .select(col("id"), array_to_vector(col("v")).as("features"))
  }

  test("centroids and predictions bit-identical to the ml Estimator (random init)") {
    val df = vecs(500, 8)
    val ml = new KMeans().setK(7).setSeed(42L).setMaxIter(10).setInitMode("random")
      .setFeaturesCol("features").fit(df)
    val direct = KMeansDirect.fit(df.select("features"), 7, 42L, 10, "random")
    assert(ml.clusterCenters.length == direct.clusterCenters.length)
    ml.clusterCenters.zip(direct.clusterCenters).foreach { case (a, b) =>
      assert(a.toArray.toSeq == b.toArray.toSeq) // exact, not approximate
    }
    val pMl = ml.transform(df).select("id", "prediction").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val pDirect = direct.transform(df).select("id", "prediction").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(pMl == pDirect)
  }

  test("bit-identical under k-means|| init too") {
    val df = vecs(300, 4)
    val ml = new KMeans().setK(5).setSeed(7L).setMaxIter(5).setInitMode("k-means||")
      .setFeaturesCol("features").fit(df)
    val direct = KMeansDirect.fit(df.select("features"), 5, 7L, 5, "k-means||")
    ml.clusterCenters.zip(direct.clusterCenters).foreach { case (a, b) =>
      assert(a.toArray.toSeq == b.toArray.toSeq)
    }
  }
}
