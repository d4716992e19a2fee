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

    val batch = StreamOps.batchEvents(spark, s"$sf0001/events.parquet")
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
    val batch = StreamOps.batchEvents(spark, s"$sf0001/events.parquet")
      .groupBy(expr("(ts div 3600000000000) * 3600").as("bucket_s"), $"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum($"value".cast("decimal(15,2)")).cast("double").as("sum_value"))
    assert(got.count() === batch.count())
    assert(got.exceptAll(batch).count() === 0)
  }

  test("streaming bottom-k sketch state equals the batch per-group selection exactly") {
    val got = StreamGate.topKPerGroup(spark, sf0001)
    val batch = graft.operators.Sampler.perGroupExactKByRank(
      spark.read.parquet(s"$sf0001/documents.parquet"), Seq("lang", "source"), 3,
      graft.operators.Sampler.hexRank("42", col("doc_id")))
      .select($"lang", $"source", $"doc_id")
    assert(got.count() === batch.count())
    assert(got.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(got).count() === 0)
  }

  test("sentinel-flushed streaming funnel equals the batch staged-min-ts funnel") {
    val got = StreamGate.funnel(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val win = 86400000000000L
    val ev = StreamOps.batchEvents(spark, s"$sf0001/events.parquet")
      .select($"user_id", $"event_type", $"ts")
    val v = ev.filter($"event_type" === "view").groupBy($"user_id").agg(min($"ts").as("tv"))
    val c = ev.filter($"event_type" === "click").join(v, Seq("user_id"))
      .filter($"ts" > $"tv" && $"ts" <= $"tv" + win)
      .groupBy($"user_id").agg(min($"ts").as("tc"))
    val p = ev.filter($"event_type" === "purchase").join(c, Seq("user_id"))
      .filter($"ts" > $"tc" && $"ts" <= $"tc" + win)
      .groupBy($"user_id").agg(min($"ts").as("tp"))
    val batch = ev.select($"user_id").distinct()
      .join(v, Seq("user_id"), "left").join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .groupBy(when($"tp".isNotNull, 3L).when($"tc".isNotNull, 2L)
        .when($"tv".isNotNull, 1L).otherwise(0L).as("funnel_stage"))
      .agg(count(lit(1)).as("n_users"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(got === batch)
    // every user is accounted for exactly once
    assert(got.values.sum === ev.select($"user_id").distinct().count())
  }

  test("funnel state machine: window bound and stage order enforced on crafted events") {
    import org.apache.spark.sql.types._
    val h = 3600000000000L // 1h in nanos
    val rows = Seq(
      // user 1: full conversion inside the windows
      (1L, 0L * h, "view"), (1L, 1L * h, "click"), (1L, 2L * h, "purchase"),
      // user 2: click arrives 25h after view -> stuck at stage 1
      (2L, 0L * h, "view"), (2L, 25L * h, "click"),
      // user 3: purchase BEFORE click -> stage 2 (order matters)
      (3L, 0L * h, "view"), (3L, 1L * h, "purchase"), (3L, 2L * h, "click"),
      // user 4: no view at all -> stage 0
      (4L, 0L * h, "click"), (4L, 1L * h, "purchase"))
    val sentinels = Seq(1L, 2L, 3L, 4L).map(u => (u, 1000L * h, "__sentinel"))
    val dir = graft.io.TempDirs.create("graft_funnel_spec")
    val mk = (data: Seq[(Long, Long, String)], name: String) =>
      data.toDF("user_id", "ts", "event_type")
        .select(lit(0L).as("event_id"), $"ts", $"user_id", $"event_type",
          lit(0.0).as("value"), lit(null).cast(StringType).as("props"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$name")
    mk(rows, "a_events"); mk(sentinels, "b_sentinels")
    // stage the two files into one source dir, events first by mtime
    val src = graft.io.TempDirs.create("graft_funnel_src")
    def firstPart(sub: String): java.nio.file.Path = {
      val l = java.nio.file.Files.list(dir.resolve(sub))
      try l.filter(_.toString.endsWith(".parquet")).findFirst().get() finally l.close()
    }
    java.nio.file.Files.copy(firstPart("a_events"), src.resolve("a.parquet"))
    java.nio.file.Files.copy(firstPart("b_sentinels"), src.resolve("b.parquet"))
    java.nio.file.Files.setLastModifiedTime(src.resolve("a.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 60000))
    val stages = StreamGate.runToTable(
      StreamOps.funnelStream(
        StreamOps.eventsStream(spark, src.toString, maxFilesPerTrigger = 1)).toDF(),
      "funnel_spec", "append")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stages === Map(1L -> 3L, 2L -> 1L, 3L -> 2L, 4L -> 0L))
  }

  test("sentinel-flushed left-outer interval join equals the batch LEFT JOIN") {
    val got = StreamGate.intervalJoinOuter(spark, sf0001)
    val ev = StreamOps.batchEvents(spark, s"$sf0001/events.parquet")
      .select($"event_id", expr("ts div 1000").as("t"), $"user_id", $"event_type")
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id", $"t".as("ct"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id".as("p_user"), $"t".as("pt"))
    val batch = clicks.join(purchases,
        $"p_user" === $"user_id" && $"pt" >= $"ct" && $"pt" <= $"ct" + 3600000000L,
        "left_outer")
      .select($"click_id", $"user_id",
        coalesce($"purchase_id", lit(-1L)).as("purchase_id"),
        $"purchase_id".isNotNull.as("matched"))
    assert(got.count() === batch.count())
    assert(got.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(got).count() === 0)
    // the unmatched (outer) rows genuinely exist — including any click
    // whose horizon extends past the last real event (the rows only a
    // sentinel-advanced watermark can flush)
    assert(got.filter(!$"matched").count() > 0)
    // no sentinel residue leaks into the result
    assert(got.filter($"click_id" === -1L).count() === 0)
  }

  test("streaming gini monitor equals the batch mix report exactly") {
    val sfDir = "/root/testdata/sf0.001"
    val stream = StreamGate.giniMonitor(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val batch = graft.ext.CorpusFilters.giniMixReport(
        spark.read.parquet(s"$sfDir/documents.parquet"), "source", "lang")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // complete-mode integer counts are order-free: bit-identical ginis
    assert(stream === batch)
    assert(stream.nonEmpty)
  }

  test("streaming near-dup gate: resubmits rejected, novel docs admitted, equals batch") {
    val sfDir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val got = StreamGate.nearDupGate(spark, sfDir)
      .as[Long].collect().toSet
    // batch replay of the same mix against the same static index
    val batch = docs.filter($"doc_id" % 7 <= 1)
      .select(($"doc_id" + 1000000L).as("doc_id"),
        when($"doc_id" % 7 === 1, md5($"doc_id".cast("string").cast("binary")))
          .otherwise($"text").as("text"))
    val idx = graft.ext.Dedup.buildMinhashIndex(docs, "doc_id", "text")
    val matched = graft.ext.Dedup
      .ingestNearDupPairs(batch, "doc_id", "text", idx, 0.8)
      .select($"batch_id".as("doc_id")).distinct()
    val expect = batch.join(matched, Seq("doc_id"), "left_anti")
      .select($"doc_id").as[Long].collect().toSet
    assert(got === expect)
    // every resubmission (%7==0 source) was rejected; novel docs admitted
    val resubmits = docs.filter($"doc_id" % 7 === 0)
      .select(($"doc_id" + 1000000L).as("d")).as[Long].collect().toSet
    assert(got.intersect(resubmits).isEmpty)
    assert(got.nonEmpty)
  }

  test("streaming k-anonymity gate equals batch Privacy.suppress row-exactly") {
    val sfDir = "/root/testdata/sf0.001"
    val gate = StreamGate.privacyGate(spark, sfDir, k = 3)
      .collect().map(r => (r.get(0), r.get(1), r.getString(2))).toSet
    val batch = graft.ext.Privacy.suppress(
        spark.read.parquet(s"$sfDir/customer.parquet"),
        Seq("c_nationkey", "c_mktsegment"), k = 3)
      .select("c_custkey", "c_nationkey", "c_mktsegment")
      .collect().map(r => (r.get(0), r.get(1), r.getString(2))).toSet
    assert(gate === batch)
    assert(gate.nonEmpty)
    // the gate actually suppressed something at this k
    assert(gate.size <
      spark.read.parquet(s"$sfDir/customer.parquet").count())
  }
}
