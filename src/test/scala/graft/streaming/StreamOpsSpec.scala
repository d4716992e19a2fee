package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  // the file streaming source requires a DIRECTORY; stage the single
  // events.parquet file into one
  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_events").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    dir
  }

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
      mode: String = "append"): Unit = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
  }

  test("streaming windowed agg over events matches the batch equivalent") {
    val stream = StreamOps.eventsStream(spark, eventsDir)
    runToMemory(StreamOps.windowedAgg(stream), "win_agg", mode = "append")
    val got = spark.table("win_agg")
      .select($"window_start", $"event_type", $"n_events")

    val batch = StreamOps.windowedAgg(
      spark.read.schema(StreamOps.eventsSchema).parquet(s"$sf0001/events.parquet"))
      .select($"window_start", $"event_type", $"n_events")

    // watermark may hold back the final window in append mode; everything
    // emitted must match the batch result exactly
    assert(got.count() > 0)
    assert(got.exceptAll(batch).count() === 0)
  }

  test("stream-safe sampling: deterministic content-hash acceptance, ratio honored") {
    val batchEvents = spark.read.schema(StreamOps.eventsSchema).parquet(s"$sf0001/events.parquet")
    val a = StreamOps.sampleStream(batchEvents, 0.2, seed = 42L).count()
    val b = StreamOps.sampleStream(batchEvents, 0.2, seed = 42L).count()
    assert(a === b)
    val total = batchEvents.count().toDouble
    assert(math.abs(a / total - 0.2) < 0.05, s"got ${a / total}")

    // and it runs as an actual stream
    val stream = StreamOps.eventsStream(spark, eventsDir)
    runToMemory(StreamOps.sampleStream(stream, 0.2, seed = 42L), "sampled")
    assert(spark.table("sampled").count() === a)
  }

  test("streaming dedup on event_type keeps one row per key") {
    val stream = StreamOps.eventsStream(spark, eventsDir)
    runToMemory(StreamOps.dedupStream(stream, Seq("event_type")), "deduped")
    val types = spark.table("deduped").select($"event_type").collect().map(_.getString(0))
    assert(types.length === types.distinct.length)
    assert(types.nonEmpty)
  }
}
