package org.apache.spark.ml.graft

import org.apache.spark.ml.clustering.KMeansModel
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.mllib.clustering.{KMeans => MLlibKMeans}
import org.apache.spark.mllib.linalg.{Vectors => OldVectors}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.storage.StorageLevel

/**
 * KMeans fit without the `ml.KMeans.fit` wrapper costs (guide §1.2 "don't
 * compute things you throw away"): the ml Estimator runs the SAME
 * `mllib.clustering.KMeans.runWithWeight` training loop, but its
 * `Instrumentation` logging forces an extra `count()` over the input and
 * its training-summary construction runs a full `transform` + per-cluster
 * `collect` over the train set (`ClusteringSummary.clusterSizes`) — pure
 * telemetry our quantizer fits never read. Measured on the IVF-PQ bench
 * queries (9 fits each), the discarded summary/instrumentation passes were
 * ~1.5-4s per query at sf0.1.
 *
 * Determinism contract: centroids (and therefore every downstream cell
 * assignment and PQ code) are BIT-IDENTICAL to `new KMeans().fit(df)` with
 * the same k/seed/maxIter/initMode, because this is the same
 * `runWithWeight` invocation on the same `(vector, 1.0)` rows in the same
 * partition order; only the logging/summary side channels are dropped.
 * Pinned by KMeansDirectSpec against the ml Estimator.
 *
 * Input contract mirrors the Estimator defaults the callers relied on:
 * one `features` vector column, unit weights, euclidean distance,
 * tol=1e-4, initSteps=2. The returned model keeps the default
 * featuresCol="features" / predictionCol="prediction".
 */
object KMeansDirect {

  /** Fit on `df`'s `features` column; all non-listed params at the ml
    * Estimator defaults. */
  def fit(df: DataFrame, k: Int, seed: Long, maxIter: Int,
      initMode: String): KMeansModel = {
    val handlePersistence = df.storageLevel == StorageLevel.NONE
    val instances = df.select("features").rdd.map {
      case Row(point: Vector) => (OldVectors.fromML(point), 1.0)
    }
    val oldModel = new MLlibKMeans()
      .setK(k)
      .setInitializationMode(initMode)
      .setInitializationSteps(2)
      .setMaxIterations(maxIter)
      .setSeed(seed)
      .setEpsilon(1e-4)
      .setDistanceMeasure("euclidean")
      .runWithWeight(instances, handlePersistence, None)
    new KMeansModel("kmeans_direct", oldModel)
  }
}
