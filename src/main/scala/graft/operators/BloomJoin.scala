package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.BloomFunctions

/**
 * Bloom-filtered join reduction: build a Bloom filter over the build side's
 * join keys (one shuffle-free aggregate — each partition ORs its bits into
 * one fixed-size array), then probe it inside the PROBE side's scan so
 * non-joining rows die BEFORE the join shuffle. The inner join afterwards
 * removes the false positives, so the result is provably identical to the
 * plain join (which is exactly how the q182 oracle checks it).
 *
 * This is the explicit, tunable form of the runtime row-group/semi-join
 * filters engines inject adaptively: at 100 TB the win is that a fact table
 * shuffles only the ~selectivity fraction that can match, instead of every
 * row — for a 1% dim selectivity that is a 100x cut in shuffle bytes for
 * the price of one broadcast-sized bit array (~1.2 GB per 10^9 keys at
 * fpp 0.01; BloomBuffer enforces the per-filter ceiling, shard beyond it).
 * False positives only cost wasted shuffle (fpp of the pruned mass), never
 * correctness.
 *
 * Keys must be integral (the BloomFilterAgg long-key discipline); NULL keys
 * never probe true, matching inner-join semantics.
 */
object BloomJoin {

  /**
   * Inner equi-join of `probe` to `build`, with the probe side pre-filtered
   * by a Bloom filter of `build`'s keys. `expectedItems <= 0` sizes the
   * filter with a count() pass over the (small) build side.
   */
  def filteredInnerJoin(
      probe: DataFrame, probeKey: String,
      build: DataFrame, buildKey: String,
      fpp: Double = 0.01,
      expectedItems: Long = -1L): DataFrame = {
    val keys = build.select(col(buildKey).cast("long").as("__bj_key"))
    val expected = if (expectedItems > 0) expectedItems else math.max(1L, keys.count())
    val filterBytes = keys
      .agg(BloomFunctions.bloom_filter_agg(col("__bj_key"), expected, fpp))
      .head.getAs[Array[Byte]](0)
    probe
      .filter(BloomFunctions.bloom_might_contain(filterBytes, col(probeKey).cast("long")))
      .join(build, col(probeKey) === col(buildKey))
  }
}
