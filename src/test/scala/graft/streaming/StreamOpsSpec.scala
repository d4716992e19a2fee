package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  // the file streaming source requires a DIRECTORY; stage the single
  // events.parquet file into one, ts normalized to the long-nanos contract
  private lazy val eventsDir: String = StreamGate.stageEventsDir(sf0001).toString

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
      StreamOps.batchEvents(spark, s"$sf0001/events.parquet"))
      .select($"window_start", $"event_type", $"n_events")

    // watermark may hold back the final window in append mode; everything
    // emitted must match the batch result exactly
    assert(got.count() > 0)
    assert(got.exceptAll(batch).count() === 0)
  }

  test("stream-safe sampling: deterministic content-hash acceptance, ratio honored") {
    val batchEvents = StreamOps.batchEvents(spark, s"$sf0001/events.parquet")
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

  test("flatMapGroupsWithState sessionization matches the batch session_window islands") {
    // all data arrives in one micro-batch: every session closed by a
    // within-batch gap is emitted; each user's LAST session stays open in
    // state (processing-time timeouts only fire on a subsequent batch), so
    // the expected emission is exactly islands - one open session per user
    val stream = spark.readStream.schema(StreamOps.eventsSchema)
      .option("maxFilesPerTrigger", "10").parquet(eventsDir)
    val q = StreamOps.sessionizeStream(stream)
      .writeStream.outputMode("append").format("memory").queryName("sessions")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = spark.table("sessions")
      .select($"session_start_us", $"user_id", $"n_events")

    // batch ground truth from the q31 logic: session_window islands
    val src = StreamOps.batchEvents(spark, s"$sf0001/events.parquet")
    val batch = src
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .groupBy(session_window($"event_time", "10 minutes"), $"user_id")
      .agg(count(lit(1)).as("n_events"))
      .select(unix_micros($"session_window.start").as("session_start_us"),
        $"user_id", $"n_events")

    // every emitted session must be a true island, exactly once; the final
    // open session per user may or may not have flushed (depends on whether
    // the trigger ran a finalizing batch that fired processing-time
    // timeouts), so the count is bounded rather than pinned
    val users = src.select($"user_id").distinct().count()
    assert(got.exceptAll(batch).count() === 0)
    assert(got.count() >= batch.count() - users && got.count() <= batch.count(),
      s"got ${got.count()}, islands ${batch.count()}, users $users")
  }

  test("stream-stream interval join emits exactly the batch join pairs") {
    val stream = StreamOps.eventsStream(spark, eventsDir)
    runToMemory(StreamOps.clickBeforePurchaseJoin(stream), "ssjoin")
    val got = spark.table("ssjoin").select($"purchase_id", $"click_id")

    val src = StreamOps.batchEvents(spark, s"$sf0001/events.parquet")
    val p = src.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id", expr("ts div 1000").as("pt"))
    val c = src.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id".as("cu"), expr("ts div 1000").as("ct"))
    val batch = p.join(c, $"user_id" === $"cu" &&
        $"ct" >= $"pt" - 3600000000L && $"ct" <= $"pt")
      .select($"purchase_id", $"click_id")

    assert(got.count() === batch.count())
    assert(got.exceptAll(batch).count() === 0)
  }

  test("streaming dedup on event_type keeps one row per key") {
    val stream = StreamOps.eventsStream(spark, eventsDir)
    runToMemory(StreamOps.dedupStream(stream, Seq("event_type")), "deduped")
    val types = spark.table("deduped").select($"event_type").collect().map(_.getString(0))
    assert(types.length === types.distinct.length)
    assert(types.nonEmpty)
  }
}
