package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.HilbertFunctions.hilbert_index

/**
 * Hilbert-curve data layout — [[ZOrder]]'s better-locality sibling, and
 * unlike the Morton key it is not limited to two dimensions. Consecutive
 * curve positions are always axis-neighbors (no power-of-two diagonal
 * jumps), so row-group min/max envelopes hug smaller boxes and a
 * multi-dimensional range probe prunes more groups; the trade is a
 * slightly costlier key (a per-row bit transform instead of pure
 * shift-masks — still one codegen'd expression in the scan projection).
 *
 * Same quantization contract as [[ZOrder.mortonKey]]: each clustering
 * column rank-normalizes to `bits`-bit bucket ordinals with
 * `width_bucket` over its [min, max] (one tiny bounds agg), NULLs land in
 * bucket 0, and the rewrite is the one range-repartition + local sort any
 * layout rewrite needs. Row data never shuffles anywhere else.
 */
object HilbertOrder {

  /** Hilbert key over `cols`, each quantized to `bits`-bit buckets.
    * dims*bits must stay within a long (<= 63 bits). */
  def hilbertKey(df: DataFrame, cols: Seq[String], bits: Int = 16): Column = {
    require(cols.size >= 2, s"need >= 2 clustering columns, got ${cols.size}")
    require(bits > 0 && cols.size * bits <= 63,
      s"need dims*bits <= 63, got ${cols.size} x $bits")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("double")), max(col(c).cast("double"))))
    val bounds = df.agg(aggs.head, aggs.tail: _*).head()
    val nBuckets = 1L << bits
    val coords = cols.zipWithIndex.map { case (c, i) =>
      require(!bounds.isNullAt(2 * i),
        s"cannot hilbert-order on '$c': empty input or all-NULL clustering column")
      val lo = bounds.getDouble(2 * i)
      val hi = bounds.getDouble(2 * i + 1)
      val span = if (hi > lo) hi - lo else 1.0
      coalesce(
        least(greatest(
          width_bucket(col(c).cast("double"), lit(lo), lit(lo + span), lit(nBuckets)) - 1,
          lit(0L)), lit(nBuckets - 1)),
        lit(0L))
    }
    hilbert_index(bits, coords: _*)
  }

  /** Rewrite `df` to `path` clustered along the Hilbert curve of `cols` —
    * range-repartition by the key (balanced files), sort within
    * partitions, bounded row groups for tight envelopes. The key column is
    * dropped: layout is a physical property, not schema. */
  def writeHilbertOrdered(
      df: DataFrame, path: String, cols: Seq[String],
      numFiles: Int = 8, bits: Int = 16, rowGroupBytes: Long = 1L << 20): Unit = {
    val keyed = df.withColumn("__hkey", hilbertKey(df, cols, bits))
    keyed
      .repartitionByRange(numFiles, col("__hkey"))
      .sortWithinPartitions(col("__hkey"))
      .drop("__hkey")
      .write.mode("overwrite")
      .option("parquet.block.size", rowGroupBytes)
      .parquet(path)
  }
}
