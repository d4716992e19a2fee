package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The determinism claims StreamGate's oracle entries rest on, pinned at
  * sf0.001: the sentinel-flushed session set equals ALL batch islands (not
  * "all but the open ones"), and the complete-mode hourly agg equals its
  * batch formulation bit-for-bit. */
class StreamGateSpec extends SparkSpec {
  import spark.implicits._

  test("sentinel-flushed streaming sessions equal the batch islands exactly") {
    val got = StreamGate.sessions(spark, sf0001)
      .select($"session_start_us", $"session_end_us", $"user_id", $"n_events")

    val batch = spark.read.schema(StreamOps.eventsSchema).parquet(s"$sf0001/events.parquet")
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .groupBy(session_window($"event_time", "10 minutes"), $"user_id")
      .agg(count(lit(1)).as("n_events"))
      .select(unix_micros($"session_window.start").as("session_start_us"),
        // session_window.end = last event + gap; the gate emits the last
        // event time itself
        (unix_micros($"session_window.end") - 600000000L).as("session_end_us"),
        $"user_id", $"n_events")

    assert(got.count() === batch.count())
    assert(got.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(got).count() === 0)
  }

  test("complete-mode streaming hourly agg equals the batch aggregation") {
    val got = StreamGate.hourlyAgg(spark, sf0001)
    val batch = spark.read.schema(StreamOps.eventsSchema).parquet(s"$sf0001/events.parquet")
      .groupBy(expr("(ts div 3600000000000) * 3600").as("bucket_s"), $"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum($"value".cast("decimal(15,2)")).cast("double").as("sum_value"))
    assert(got.count() === batch.count())
    assert(got.exceptAll(batch).count() === 0)
  }
}
