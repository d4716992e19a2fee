package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

/**
 * Streaming operators against production-shaped plumbing:
 *  - foreachBatch (the arbitrary-sink escape hatch every streaming ETL
 *    lands on eventually) drains to parquet and matches the batch result;
 *  - the RocksDB state store provider (the backend that keeps state
 *    off-heap at real key cardinalities, vs the default in-memory HDFS
 *    store) runs the stateful dedup unchanged.
 */
class StreamBackendSpec extends SparkSpec {
  import spark.implicits._

  // staged with ts normalized to the long-nanos contract
  private lazy val eventsDir: String = StreamGate.stageEventsDir(sf0001).toString

  test("foreachBatch drains a stream to parquet; result equals the batch aggregation") {
    val out = graft.io.TempDirs.create("graft_feb_out").toString
    val agg = StreamOps.windowedAgg(StreamOps.eventsStream(spark, eventsDir))
    val q = agg.writeStream
      .outputMode("complete")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // complete mode: each batch carries the full result -> overwrite
        batch.write.mode("overwrite").parquet(out)
      }
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000))

    val got = spark.read.parquet(out).select($"window_start", $"event_type", $"n_events")
    val batch = StreamOps.windowedAgg(
      StreamOps.batchEvents(spark, s"$sf0001/events.parquet"))
      .select($"window_start", $"event_type", $"n_events")
    assert(got.count() === batch.count())
    assert(got.exceptAll(batch).count() === 0)
  }

  test("stateful dedup runs on the RocksDB state store provider") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = StreamOps.dedupStream(StreamOps.eventsStream(spark, eventsDir), Seq("event_type"))
        .writeStream.outputMode("append").format("memory").queryName("rocksdb_dedup")
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000))
      val types = spark.table("rocksdb_dedup").select($"event_type")
        .collect().map(_.getString(0))
      assert(types.nonEmpty && types.length === types.distinct.length)
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
