package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.io.{TempDirs, TxLog}

/** The native Structured Streaming source for TxLog tables
  * (`spark.readStream.format("graft_txlog")`): vanilla streaming jobs
  * follow a table with their own checkpoints and triggers; batch
  * semantics equal [[graft.io.TxLogOps.changeStream]]'s slices. */
class TxLogStreamSourceSpec extends SparkSpec {
  import spark.implicits._

  private def slice(i: Int) = Seq((i.toLong, i.toLong * 10)).toDF("k", "v")

  test("AvailableNow drains a TxLog table: sink content equals the batch read; offsets are versions") {
    val root = TempDirs.create("txsrc_")
    val src = root.resolve("src").toString
    val out = root.resolve("out").toString
    val ckp = root.resolve("ckp").toString
    TxLog.create(spark, src, slice(0))                                  // v0
    (1 to 5).foreach(i => TxLog.append(spark, src, slice(i)))          // v1..v5
    def drain(): Unit = {
      val q = spark.readStream.format("graft_txlog")
        .option("maxVersionsPerTrigger", 2)
        .load(src)
        .filter(col("_change_type") === "insert")
        .select(col("k"), col("v"))
        .writeStream.outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", ckp)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000))
    }
    drain()
    val got = spark.read.parquet(out).as[(Long, Long)].collect().toSet
    assert(got === (0 to 5).map(i => (i.toLong, i.toLong * 10)).toSet,
      "drained stream must equal the batch table")

    // RESUME from the same checkpoint: only versions committed since the
    // stream's mark flow; nothing replays
    (6 to 7).foreach(i => TxLog.append(spark, src, slice(i)))          // v6..v7
    drain()
    val got2 = spark.read.parquet(out).as[(Long, Long)].collect().toSeq
    assert(got2.size === 8, s"resume must consume ONLY the new range, got $got2")
    assert(got2.toSet === (0 to 7).map(i => (i.toLong, i.toLong * 10)).toSet)

    // and a third drain with no new commits moves nothing
    drain()
    assert(spark.read.parquet(out).count() === 8)
  }

  test("native sink: table-to-table pipeline is exactly-once end to end; resume appends only the new range") {
    val root = TempDirs.create("txsink_")
    val src = root.resolve("src").toString
    val dst = root.resolve("dst").toString
    val ckp = root.resolve("ckp").toString
    TxLog.create(spark, src, slice(0))
    (1 to 4).foreach(i => TxLog.append(spark, src, slice(i)))           // v1..v4
    def pipe(): Unit = {
      val q = spark.readStream.format("graft_txlog")
        .option("maxVersionsPerTrigger", 2).load(src)
        .filter(col("_change_type") === "insert")
        .select(col("k"), col("v"))
        .writeStream.format("graft_txlog")
        .option("streamId", "pipe")
        .option("checkpointLocation", ckp)
        .trigger(Trigger.AvailableNow()).start(dst)
      assert(q.awaitTermination(120000))
    }
    pipe()
    val got = TxLog.read(spark, dst).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === (0 to 4).map(i => (i.toLong, i.toLong * 10)).toSet,
      "piped table must equal the source")
    // each micro-batch landed as ONE atomic keyed commit; the mark rode
    // the destination's own log
    assert(TxLog.streamHighWater(dst, "pipe") >= 0L)
    // resume: only the new source range flows; nothing replays
    (5 to 6).foreach(i => TxLog.append(spark, src, slice(i)))
    pipe()
    val all = TxLog.read(spark, dst).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(all.length === 7, s"resume double-applied: ${all.toSeq.sorted}")
    assert(all.toSet === (0 to 6).map(i => (i.toLong, i.toLong * 10)).toSet)
    // a third drain with no new commits appends nothing
    val versions = TxLog.history(dst).length
    pipe()
    assert(TxLog.history(dst).length === versions, "caught-up drain must not commit")
    // non-append output modes refuse loudly
    val e = intercept[Exception] {
      spark.readStream.format("graft_txlog").load(src)
        .groupBy(col("k")).count()
        .writeStream.format("graft_txlog").outputMode("complete")
        .option("checkpointLocation", root.resolve("ckp2").toString)
        .trigger(Trigger.AvailableNow()).start(root.resolve("dst2").toString)
        .awaitTermination(120000)
    }
    assert(e.getMessage.contains("Append output mode only") ||
      Option(e.getCause).exists(_.getMessage.contains("Append output mode only")),
      s"got: ${e.getMessage}")
  }

  test("cdc replica: converges under appends/upserts/deletes, exactly-once, and stays followable") {
    val root = TempDirs.create("txcdc_")
    val src = root.resolve("src").toString
    val dst = root.resolve("dst").toString
    val ckp = root.resolve("ckp").toString
    TxLog.create(spark, src, Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")) // v0
    TxLog.append(spark, src, Seq((4L, 40L)).toDF("k", "v"))                        // v1
    def replicate(): Unit = {
      val q = spark.readStream.format("graft_txlog").load(src)
        .writeStream.format("graft_txlog")
        .option("mode", "cdc").option("keys", "k").option("streamId", "replica")
        .option("checkpointLocation", ckp)
        .trigger(Trigger.AvailableNow()).start(dst)
      assert(q.awaitTermination(120000))
    }
    def replica(): Set[(Long, Long)] = TxLog.read(spark, dst).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    replicate()
    assert(replica() === Set((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)))

    // mixed ops: COW upsert, dv delete, append — replica converges
    TxLog.upsert(spark, src, Seq((2L, 99L)).toDF("k", "v"), Seq("k"))  // v2
    TxLog.deleteRows(spark, src, col("k") === 3L)                       // v3
    TxLog.append(spark, src, Seq((5L, 50L)).toDF("k", "v"))            // v4
    val replicaVersionsBefore = TxLog.history(dst).length
    replicate()
    assert(replica() === Set((1L, 10L), (2L, 99L), (4L, 40L), (5L, 50L)))
    assert(TxLog.history(dst).length === replicaVersionsBefore + 1,
      "one advance must land as ONE keyed commit")

    // the replica's own change feed classifies the cdc rewrite (the keyed
    // commit carries its key columns) — a replica is itself followable
    val feedFrom = TxLog.latest(dst).version - 1
    val feed = TxLog.changeFeed(spark, dst, feedFrom)
      .select(col("k"), col("v"), col("_change_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(feed === Set((2L, 20L, "update_preimage"), (2L, 99L, "update_postimage"),
      (3L, 30L, "delete"), (5L, 50L, "insert")), s"got: $feed")

    // within-batch ordering: update THEN delete of the same key in one
    // advance — the later version wins, the key is gone
    TxLog.upsert(spark, src, Seq((4L, 44L)).toDF("k", "v"), Seq("k"))  // v5
    TxLog.deleteRows(spark, src, col("k") === 4L)                       // v6
    replicate()
    assert(replica() === Set((1L, 10L), (2L, 99L), (5L, 50L)))

    // caught up: nothing commits (exactly-once, no empty versions)
    val n = TxLog.history(dst).length
    replicate()
    assert(TxLog.history(dst).length === n, "caught-up drain must not commit")

    // a source schema ADDITION widens the replica: the restarted stream
    // picks up the new column, old replica rows surface NULL there
    TxLog.append(spark, src, Seq((6L, 60L, "x")).toDF("k", "v", "tag")) // v7
    TxLog.upsert(spark, src,
      Seq((2L, 98L, "y")).toDF("k", "v", "tag"), Seq("k"))              // v8
    replicate()
    val widened = TxLog.read(spark, dst)
    assert(widened.columns.contains("tag"), s"got: ${widened.columns.toSeq}")
    val wrows = widened.select(col("k"), col("v"), col("tag")).collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)).getOrElse("∅"))).toSet
    assert(wrows === Set((1L, 10L, "∅"), (2L, 98L, "y"), (5L, 50L, "∅"), (6L, 60L, "x")),
      s"got: $wrows")

    // cdc mode refuses unclassified rows and missing keys loudly
    val e1 = intercept[Exception] {
      spark.readStream.format("graft_txlog").load(src)
        .select(col("k"), col("v")) // strips the classification
        .writeStream.format("graft_txlog")
        .option("mode", "cdc").option("keys", "k")
        .option("checkpointLocation", root.resolve("ckp2").toString)
        .trigger(Trigger.AvailableNow()).start(root.resolve("dst2").toString)
        .awaitTermination(120000)
    }
    def deepMsg(t: Throwable): String =
      (Iterator.iterate[Throwable](t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | "))
    assert(deepMsg(e1).contains("classified change rows"), s"got: ${deepMsg(e1)}")
    val e2 = intercept[IllegalArgumentException] {
      spark.readStream.format("graft_txlog").load(src)
        .writeStream.format("graft_txlog").option("mode", "cdc")
        .option("checkpointLocation", root.resolve("ckp3").toString)
        .trigger(Trigger.AvailableNow()).start(root.resolve("dst3").toString)
    }
    assert(e2.getMessage.contains("keys"))
  }

  test("startingVersion: the stream skips the snapshot and drains classified changes from v onward") {
    val root = TempDirs.create("txsv_")
    val src = root.resolve("src").toString
    val out = root.resolve("out").toString
    val ckp = root.resolve("ckp").toString
    TxLog.create(spark, src, slice(0))                                  // v0
    (1 to 4).foreach(i => TxLog.append(spark, src, slice(i)))          // v1..v4
    def drain(): Unit = {
      val q = spark.readStream.format("graft_txlog")
        .option("startingVersion", 3).option("maxVersionsPerTrigger", 1)
        .load(src)
        .filter(col("_change_type") === "insert").select(col("k"), col("v"))
        .writeStream.outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", ckp)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000))
    }
    drain()
    val got = spark.read.parquet(out).as[(Long, Long)].collect().toSet
    assert(got === Set((3L, 30L), (4L, 40L)),
      s"startingVersion=3 must skip the snapshot and v1..v2: got $got")
    // resume consumes only the new range
    (5 to 6).foreach(i => TxLog.append(spark, src, slice(i)))
    drain()
    assert(spark.read.parquet(out).as[(Long, Long)].collect().toSet ===
      (3 to 6).map(i => (i.toLong, i.toLong * 10)).toSet)
    // v0 and sub-floor starts refuse loudly
    val e = intercept[Exception] {
      spark.readStream.format("graft_txlog").option("startingVersion", 0).load(src)
    }
    assert(e.getMessage.contains("startingVersion must be >= 1"), e.getMessage)
    TxLog.vacuum(spark, src, 2)
    val floor = TxLog.retentionFloor(src)
    val e2 = intercept[Exception] {
      spark.readStream.format("graft_txlog")
        .option("startingVersion", floor - 1).load(src)
    }
    assert(e2.getMessage.contains("retention floor"), e2.getMessage)
  }

  test("cdc sink where option: partial streaming replica drops postimages that leave scope") {
    val root = TempDirs.create("txcdcw_")
    val src = root.resolve("src").toString
    val dst = root.resolve("dst").toString
    val ckp = root.resolve("ckp").toString
    TxLog.create(spark, src, Seq((1L, 10L), (2L, 20L)).toDF("k", "v"))
    def replicate(): Unit = {
      val q = spark.readStream.format("graft_txlog").load(src)
        .writeStream.format("graft_txlog")
        .option("mode", "cdc").option("keys", "k").option("where", "v >= 15")
        .option("streamId", "partial").option("checkpointLocation", ckp)
        .trigger(Trigger.AvailableNow()).start(dst)
      assert(q.awaitTermination(120000))
    }
    def replica() = TxLog.read(spark, dst).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    replicate()
    assert(replica() === Set((2L, 20L))) // bootstrap inserts outside scope are noop deletes
    TxLog.upsert(spark, src, Seq((1L, 99L)).toDF("k", "v"), Seq("k")) // enters scope
    TxLog.upsert(spark, src, Seq((2L, 5L)).toDF("k", "v"), Seq("k"))  // leaves scope
    replicate()
    assert(replica() === Set((1L, 99L)), s"got ${replica()}")
  }

  test("change classification flows: updates surface as pre/postimage, deletes as delete") {
    val root = TempDirs.create("txsrc2_")
    val src = root.resolve("src").toString
    val out = root.resolve("out").toString
    val ckp = root.resolve("ckp").toString
    TxLog.create(spark, src, Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v"))
    def drain(): Unit = {
      val q = spark.readStream.format("graft_txlog").load(src)
        .writeStream.outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", ckp)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000))
    }
    drain() // bootstrap snapshot (all inserts)
    TxLog.upsert(spark, src, Seq((2L, 99L)).toDF("k", "v"), Seq("k"))  // v1 (COW)
    TxLog.deleteRows(spark, src, col("k") === 3L)                       // v2 (dv)
    drain() // classified slices
    val cls = spark.read.parquet(out)
      .select(col("k"), col("v"), col("_change_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(cls.contains((2L, 20L, "update_preimage")))
    assert(cls.contains((2L, 99L, "update_postimage")))
    assert(cls.contains((3L, 30L, "delete")))
    assert(cls.contains((1L, 10L, "insert")))
  }
}
