package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
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

  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }
}
