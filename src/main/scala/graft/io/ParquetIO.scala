package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Parquet source/sink.
 *
 * Reference behavior being re-expressed (see /root/reference):
 *  - scan: `SerializedFileReader::get_row_iter` full/projected scan
 *    (src/bin/sample.rs:27-28,59; src/bin/join.rs:42-56,105). Spark's
 *    vectorized Parquet reader plus Catalyst column pruning / predicate
 *    pushdown subsumes both scan variants.
 *  - sink: `write_output` (src/lib.rs:13-134) buffers every row in RAM and
 *    writes ONE row group in ONE file, supporting only 6 flat physical types
 *    and panicking on anything nested (src/lib.rs:122-124). We deliberately
 *    lift both restrictions: output stays a distributed write (no driver
 *    materialization) and all Spark SQL types round-trip (timestamp, date,
 *    decimal, array, map, struct, binary).
 *
 * `singleFile = true` reproduces the reference's one-file output layout for
 * CLI parity on small data; at 100 TB it must stay false (one task would
 * write everything).
 */
object ParquetIO {

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /**
   * Overwrite-mode write, mirroring the reference's `File::create` overwrite
   * semantics (src/bin/sample.rs:10, src/bin/join.rs:9).
   *
   * @param compression parquet codec; `None` = Spark session default
   *                    (snappy). The reference writes UNCOMPRESSED
   *                    (parquet-rs 5.5 defaults, src/lib.rs:25-27) — pass
   *                    Some("uncompressed") only if byte-layout parity
   *                    matters; the correctness oracle compares row content.
   */
  def write(
      df: DataFrame,
      path: String,
      singleFile: Boolean = false,
      compression: Option[String] = None): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    val w = out.write.mode("overwrite")
    compression.foreach(c => w.option("compression", c))
    w.parquet(path)
  }

  /** Footer row count without reading data pages (metadata-only count). */
  def rowCount(spark: SparkSession, path: String): Long =
    spark.read.parquet(path).count()

  /**
   * Bucketed parquet table write: rows are hash-partitioned into `buckets`
   * files per partition by `bucketCols`, and the layout is recorded in the
   * catalog. Joins/aggregations between tables bucketed the same way on the
   * same keys skip their shuffle entirely — the 100 TB answer for a fact
   * table that is repeatedly joined on the same key (pay one shuffle at
   * write time, never again).
   *
   * Tables go through the session catalog (`saveAsTable`) because bucket
   * metadata lives there, not in the files.
   */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      buckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty, "bucketCols must not be empty")
    val w = df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    val sorted = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    sorted.saveAsTable(table)
  }
}
