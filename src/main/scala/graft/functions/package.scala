package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{VectorFunctions => VF}

/**
 * Public function surface of the graft engine. The Catalyst expression
 * implementations live in `org.apache.spark.sql.graft` (package access to
 * `private[sql]` internals); users import `graft.functions._`.
 */
package object functions {
  /** Dot product of two `array<float>` columns (codegen'd, no boxing). */
  def vec_dot(a: Column, b: Column): Column = VF.vec_dot(a, b)

  /** Cosine similarity of two `array<float>` columns, in [-1, 1]. */
  def vec_cosine(a: Column, b: Column): Column = VF.vec_cosine(a, b)

  /** Squared euclidean distance of two `array<float>` columns. */
  def vec_l2sq(a: Column, b: Column): Column = VF.vec_l2sq(a, b)

  /** Aggregate: deterministic uniform sample of up to k values per group
    * (bottom-k-by-hash sketch; one shuffle, order-independent). */
  def bottom_k_sample(e: Column, k: Int, seed: Long): Column =
    org.apache.spark.sql.graft.BottomKSampleFunctions.bottom_k_sample(e, k, seed)

  /** Aggregate: weighted (A-ES) deterministic sample of up to k values per
    * group; inclusion probability scales with the weight column. */
  def bottom_k_sample_weighted(e: Column, w: Column, k: Int, seed: Long): Column =
    org.apache.spark.sql.graft.BottomKSampleFunctions.bottom_k_sample_weighted(e, w, k, seed)

  /** Aggregate: the k payload values with the smallest rank expression —
    * top/bottom-k per group in one shuffle (mergeable sketch, no window
    * sort). With a portable rank (md5 of a key) the selection is exactly
    * replayable by any SQL engine. */
  def bottom_k_by_rank(rank: Column, payload: Column, k: Int): Column =
    org.apache.spark.sql.graft.BottomKSampleFunctions.bottom_k_by_rank(rank, payload, k)

  /** Aggregate: Misra-Gries heavy-hitters sketch of a string column — one
    * pass, O(k) memory, mergeable; superset of all items with true count
    * > N/(k+1). Pair with an exact recount of the candidates for a
    * deterministic heavy-hitters result. */
  def frequent_items(e: Column, k: Int): Column =
    org.apache.spark.sql.graft.FrequentItemsFunctions.frequent_items(e, k)

  /** Weighted heavy hitters: items whose total integer weight exceeds
    * W/(k+1) are guaranteed in the sketch. */
  def frequent_items_weighted(e: Column, w: Column, k: Int): Column =
    org.apache.spark.sql.graft.FrequentItemsFunctions.frequent_items_weighted(e, w, k)

  /** Aggregate: mergeable Count-Min frequency sketch of a string column
    * (serialized binary; depth x width counters). Estimates from
    * [[cms_estimate]] are >= the true count always and <= true +
    * (e/width)*N with probability 1 - e^-depth. */
  def count_min_agg(e: Column, depth: Int, width: Int): Column =
    org.apache.spark.sql.graft.CountMinFunctions.count_min_agg(e, depth, width)

  /** Scalar: estimated count of `e` in a built Count-Min sketch (bytes
    * from [[count_min_agg]], collected driver-side — the Bloom two-pass
    * pattern). */
  def cms_estimate(sketch: Array[Byte], e: Column): Column =
    org.apache.spark.sql.graft.CountMinFunctions.cms_estimate(sketch, e)
}
