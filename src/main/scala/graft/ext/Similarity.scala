package graft.ext

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, StructField, StructType}
import graft.functions.vec_cosine

/**
 * Approximate-nearest-neighbor search over an `array<float>` embedding
 * column (extension surface; the reference has no vector operators —
 * SURVEY.md §2.2).
 *
 * Two tiers:
 *  - [[bruteTopK]]: exact baseline. The query set is broadcast, so the data
 *    side streams through a broadcast nested-loop join with the codegen'd
 *    cosine in the loop — one full scan, no shuffle of the corpus, then a
 *    per-query top-k. Correct at any corpus size; cost is O(|corpus|·|Q|).
 *  - [[lshTopK]]: scale path. Random-hyperplane signatures bucket the corpus
 *    (one shuffle by band key); each query probes only its matching buckets.
 *    Recall < 1 by construction; raise `bands` / lower `numPlanes` for more
 *    recall, opposite for more pruning.
 */
object Similarity {

  /**
   * Exact top-k cosine neighbors per query row.
   * Output: (query_id, neighbor_id, cosine, rank), rank 1..k, deterministic
   * tie-break on neighbor id.
   */
  def bruteTopK(
      data: DataFrame, dataId: String, dataVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int): DataFrame = {
    val joined = data.select(col(dataId).as("neighbor_id"), col(dataVec).as("__dv"))
      .join(broadcast(queries.select(col(queryId).as("query_id"), col(queryVec).as("__qv"))))
      .withColumn("cosine", vec_cosine(col("__dv"), col("__qv")))
    rankTopK(joined, k)
  }

  /**
   * LSH-bucketed approximate top-k: corpus and queries are signed by the
   * same hyperplanes; candidates = rows sharing any band key with the query.
   */
  def lshTopK(
      data: DataFrame, dataId: String, dataVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, dim: Int,
      numPlanes: Int = 16, bands: Int = 4, seed: Long = 42L): DataFrame = {
    def banded(df: DataFrame, id: String, vec: String, idOut: String, vecOut: String) =
      df.select(col(id).as(idOut), col(vec).as(vecOut),
          posexplode(LshPlanes.bandKeys(col(vec), dim, numPlanes, bands, seed)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bk")

    val d = banded(data, dataId, dataVec, "neighbor_id", "__dv").alias("d")
    val q = banded(queries, queryId, queryVec, "query_id", "__qv").alias("q")

    val cand = d.join(q, col("d.band") === col("q.band") && col("d.bk") === col("q.bk"))
      .select(col("query_id"), col("neighbor_id"), col("__dv"), col("__qv"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cosine", vec_cosine(col("__dv"), col("__qv")))
    rankTopK(cand, k)
  }

  /**
   * @param trainFraction fraction of the corpus the coarse quantizer is fit
   *                      on; negative (the default) = auto-cap at
   *                      [[IvfConfig.maxTrainRows]] rows. Every KMeans
   *                      iteration is a full distributed pass over the TRAIN
   *                      set, so an uncapped fraction would mean `maxIter`
   *                      full-corpus passes at 100 TB just to place `nlist`
   *                      centroids — a sample bounds that to constant work.
   */
  final case class IvfConfig(
      nlist: Int = 64,
      nprobe: Int = 8,
      seed: Long = 42L,
      trainFraction: Double = -1.0,
      maxTrainRows: Long = 100000L,
      maxIter: Int = 10,
      initMode: String = "random")

  /**
   * IVF (inverted-file) approximate top-k: a KMeans coarse quantizer
   * partitions the corpus into `nlist` cells (trained on a sample, assigned
   * in one distributed pass); each query scans only its `nprobe` nearest
   * cells. The classic FAISS-style scale path: per-query work drops from
   * O(|corpus|) to O(|corpus| * nprobe / nlist) while the cell assignment
   * is a one-off, reusable index artifact.
   *
   * Cells are probed by euclidean distance to the centroid (KMeans'
   * metric); final ranking is exact cosine over the probed cells.
   */
  /**
   * Shared coarse-quantizer fit (sample-sized driver cost, k x dim). Auto
   * mode (`trainFraction < 0`) sizes the sample from the corpus row count —
   * count() on a parquet source is satisfied from row-group metadata, far
   * cheaper than even one of the maxIter KMeans passes it prevents.
   * Coarse quantizers don't need converged clusters, they need balanced
   * cells: random init + few iterations skips k-means||'s extra passes
   * (each KMeans iteration is a full distributed pass over the train set).
   */
  private def fitQuantizer(
      data: DataFrame, vecCol: String, k: Int, seed: Long,
      trainFraction: Double, maxTrainRows: Long, maxIter: Int,
      initMode: String) = {
    val frac =
      if (trainFraction >= 0.0) math.min(trainFraction, 1.0)
      else {
        require(maxTrainRows > 0, "maxTrainRows must be positive")
        val n = data.count()
        if (n <= maxTrainRows) 1.0 else maxTrainRows.toDouble / n
      }
    val trainSrc = if (frac < 1.0)
      data.sample(withReplacement = false, frac, seed) else data
    new KMeans().setK(k).setSeed(seed).setFeaturesCol("__features")
      .setMaxIter(maxIter).setInitMode(initMode)
      .fit(trainSrc.select(array_to_vector(col(vecCol)).as("__features")))
  }

  /**
   * A built IVF index: the per-row cell assignment (corpus-sized, columnar)
   * and the tiny centroid table (nlist rows). Both are plain DataFrames so
   * the index is a first-class, persistable artifact — build once, [[save]]
   * it, [[loadIvfIndex]] and [[searchIvf]] many times (the production ANN
   * flow; re-training the quantizer per query batch would waste the fit and
   * the corpus-wide assignment pass).
   */
  final case class IvfIndex(assigned: DataFrame, centroids: DataFrame) {
    /** Persist as two parquet tables under `dir`. */
    def save(dir: String): Unit = {
      assigned.write.mode("overwrite").parquet(s"$dir/assigned.parquet")
      centroids.write.mode("overwrite").parquet(s"$dir/centroids.parquet")
    }
  }

  /** Rehydrate an [[IvfIndex]] written by [[IvfIndex.save]]. */
  def loadIvfIndex(spark: org.apache.spark.sql.SparkSession, dir: String): IvfIndex =
    IvfIndex(
      assigned = spark.read.parquet(s"$dir/assigned.parquet"),
      centroids = spark.read.parquet(s"$dir/centroids.parquet"))

  /**
   * Build the IVF index: fit the capped-sample coarse quantizer, assign
   * every corpus row to its cell (one distributed pass), and materialize
   * the nlist centroid table. Centroids stay DOUBLE — KMeans assigned rows
   * in double precision, and ranking cells against float-downcast centroids
   * could order two near-equidistant cells differently than the assignment
   * did, pushing a row's own cell out of the probed set.
   */
  def buildIvfIndex(
      data: DataFrame, dataId: String, dataVec: String,
      cfg: IvfConfig = IvfConfig()): IvfIndex = {
    val spark = data.sparkSession
    val model = fitQuantizer(data, dataVec, cfg.nlist, cfg.seed,
      cfg.trainFraction, cfg.maxTrainRows, cfg.maxIter, cfg.initMode)
    val assigned = model.transform(
        data.select(col(dataId).as("neighbor_id"), col(dataVec).as("__dv"),
          array_to_vector(col(dataVec)).as("__features")))
      .select(col("neighbor_id"), col("__dv"), col("prediction").as("cell"))
    val centroidRows = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      Row(i, c.toArray.toSeq)
    }
    val centroids = spark.createDataFrame(
      spark.sparkContext.parallelize(centroidRows.toSeq, 1),
      StructType(Seq(StructField("cell", IntegerType, nullable = false),
        StructField("__cv", ArrayType(DoubleType, containsNull = false), nullable = false))))
    IvfIndex(assigned, centroids)
  }

  /**
   * Probe an [[IvfIndex]]: rank cells per query by euclidean distance to
   * the centroid (KMeans' metric; interpreted HOF distance is fine here —
   * |queries| x nlist rows only), scan the nprobe nearest cells, exact
   * cosine, top-k.
   */
  def searchIvf(
      index: IvfIndex,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, nprobe: Int): DataFrame = {
    val probeW = Window.partitionBy(col("query_id")).orderBy(col("__cd").asc, col("cell").asc)
    val qvDouble = col("__qv").cast("array<double>")
    val probes = queries.select(col(queryId).as("query_id"), col(queryVec).as("__qv"))
      .join(broadcast(index.centroids))
      .withColumn("__cd", aggregate(
        zip_with(qvDouble, col("__cv"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, d) => acc + d))
      .withColumn("__pr", row_number().over(probeW))
      .filter(col("__pr") <= nprobe)
      .select(col("query_id"), col("__qv"), col("cell"))

    val cand = index.assigned.join(probes, "cell")
      .withColumn("cosine", vec_cosine(col("__dv"), col("__qv")))
    rankTopK(cand, k)
  }

  def ivfTopK(
      data: DataFrame, dataId: String, dataVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, cfg: IvfConfig = IvfConfig()): DataFrame =
    searchIvf(buildIvfIndex(data, dataId, dataVec, cfg),
      queries, queryId, queryVec, k, cfg.nprobe)

  /** @param nlist cluster count — pairwise work is O(Σ cell² ) ≈ n²/nlist,
    *               so size it ~ n / targetCellSize. */
  final case class SemDedupConfig(
      nlist: Int = 64,
      threshold: Double = 0.9,
      seed: Long = 42L,
      trainFraction: Double = -1.0,
      maxTrainRows: Long = 100000L,
      maxIter: Int = 10,
      initMode: String = "random")

  /**
   * SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
   * cluster the embedding space with a sampled KMeans coarse quantizer,
   * then drop near-duplicates WITHIN each cluster — a row is dropped when a
   * lower-id row in the same cell has cosine >= threshold with it, so each
   * duplicate group keeps its minimum-id representative.
   *
   * Scale shape: the cluster assignment is the same constant-cost
   * fit + one-pass transform as [[ivfTopK]]; the candidate generator is a
   * per-cell self-join — the O(n²) global problem becomes O(Σ cell²),
   * bounded by making `nlist` proportional to corpus size (the paper's
   * design). The join carries (id, vec) with the codegen cosine evaluated
   * inline, so no pair survives to a shuffle unless it crossed the
   * threshold. Cross-cluster near-dups are missed by construction — the
   * recall/cost trade the paper accepts.
   *
   * Output: one row per input row — (id, cell, kept); deterministic for a
   * fixed seed.
   */
  def semDedup(
      data: DataFrame, idCol: String, vecCol: String,
      cfg: SemDedupConfig = SemDedupConfig()): DataFrame = {
    val model = fitQuantizer(data, vecCol, cfg.nlist, cfg.seed,
      cfg.trainFraction, cfg.maxTrainRows, cfg.maxIter, cfg.initMode)
    // the assignment feeds THREE consumers (both self-join sides + the
    // kept-flag join) — localCheckpoint materializes it once (same pattern
    // as duplicateClusters); unlike persist(), the blocks are freed by the
    // ContextCleaner when the result is garbage collected, so repeated
    // invocations in one session don't accumulate CacheManager entries
    val assigned = model.transform(
        data.select(col(idCol).as("__sd_id"), col(vecCol).as("__sd_v"),
          array_to_vector(col(vecCol)).as("__features")))
      .select(col("__sd_id"), col("__sd_v"), col("prediction").as("cell"))
      .localCheckpoint()

    val a = assigned.select(col("__sd_id").as("__id_a"), col("__sd_v").as("__va"), col("cell"))
    val b = assigned.select(col("__sd_id").as("__id_b"), col("__sd_v").as("__vb"), col("cell"))
    val dropped = a.join(b,
        a("cell") === b("cell") && col("__id_a") < col("__id_b") &&
          vec_cosine(col("__va"), col("__vb")) >= cfg.threshold)
      .select(col("__id_b").as("__sd_id")).distinct()

    assigned.join(dropped.withColumn("__dropped", lit(true)), Seq("__sd_id"), "left")
      .select(col("__sd_id").as(idCol), col("cell").cast("long").as("cell"),
        col("__dropped").isNull.as("kept"))
  }

  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }
}
