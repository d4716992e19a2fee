package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Structured Streaming surface over the `events` table shape
 * (event_id, ts, user_id, event_type, value, props). The reference is
 * batch-only (SURVEY.md §2.2 "Streaming: none"); this is extension work
 * re-using the same operator semantics on an unbounded source.
 *
 * events.parquet carries TIMESTAMP(NANOS); with
 * `spark.sql.legacy.parquet.nanosAsLong=true` the column arrives as long
 * nanoseconds and [[withEventTime]] converts to a proper timestamp for
 * watermarking.
 */
object StreamOps {

  /** Schema of the events table as surfaced under nanosAsLong. */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // TIMESTAMP(NANOS) read as long nanos
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-based streaming read of an events directory (one file per
    * micro-batch by default — `maxFilesPerTrigger` tunes replay pace). */
  def eventsStream(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(eventsSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** long-nanos -> TimestampType event time column `event_time`.
    * Integer division, NOT `/` — `Divide` on longs goes through double,
    * and nanosecond epochs (~1.7e18) exceed double's 2^53 exact range, so
    * a quotient can round a hair below its true integer value and truncate
    * one microsecond low. */
  def withEventTime(events: DataFrame): DataFrame =
    events.withColumn("event_time", timestamp_micros(expr("ts div 1000")))

  /**
   * Watermarked tumbling-window aggregation: counts + sum(value) per
   * (window, event_type). Late events beyond `lateness` are dropped —
   * bounded state at any scale.
   */
  def windowedAgg(events: DataFrame, windowLen: String = "1 hour", lateness: String = "2 hours"): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", lateness)
      .groupBy(window(col("event_time"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /**
   * Stream-safe Bernoulli sampling: content-hash acceptance (not rand()),
   * so a row's fate is a pure function of (seed, row) — stable across
   * micro-batch retries, which exactly-once sinks require.
   */
  def sampleStream(events: DataFrame, ratio: Double, seed: Long): DataFrame = {
    require(ratio >= 0.0 && ratio <= 1.0, s"ratio must be in [0,1], got $ratio")
    val r = shiftrightunsigned(xxhash64(lit(seed), struct(events.columns.map(col).toSeq: _*)), 11)
      .cast("double") / lit((1L << 53).toDouble)
    events.filter(r < ratio)
  }

  /**
   * Streaming exact dedup on a key, with watermark-bounded state: the first
   * occurrence of each key within the watermark horizon survives.
   */
  def dedupStream(events: DataFrame, keyCols: Seq[String], lateness: String = "2 hours"): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", lateness)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)
}
