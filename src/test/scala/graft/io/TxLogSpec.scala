package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TxLog: versioned snapshots compose the upsert/CDC/diff/compaction
  * family without lost updates — including under genuinely concurrent
  * writers (the optimistic hard-link claim serializes commits). */
class TxLogSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    TempDirs.create("txlog_spec_").resolve("t").toString

  test("lifecycle: create, append, upsert, delete, compact; time travel sees history") {
    val tbl = freshTable()
    TxLog.create(spark, tbl, Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "name", "v"))
    TxLog.append(spark, tbl, Seq((3L, "c", 30L)).toDF("k", "name", "v"))
    TxLog.upsert(spark, tbl, Seq((2L, "b2", 21L), (4L, "d", 40L)).toDF("k", "name", "v"), Seq("k"))
    TxLog.delete(spark, tbl, col("k") === 1L)
    TxLog.compact(spark, tbl, targetPartitions = 1)

    val live = TxLog.read(spark, tbl).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(live === Set((2L, "b2", 21L), (3L, "c", 30L), (4L, "d", 40L)))
    // time travel: every version is still readable and correct
    assert(TxLog.read(spark, tbl, 0).count() === 2)
    assert(TxLog.read(spark, tbl, 1).count() === 3)
    assert(TxLog.read(spark, tbl, 2).collect().map(_.getLong(2)).sorted.toSeq
      === Seq(10L, 21L, 30L, 40L))
    assert(TxLog.read(spark, tbl, 3).count() === 3)
    assert(TxLog.read(spark, tbl, 4).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet === live)
    assert(TxLog.history(tbl).map(s => (s.version, s.op)) ===
      Seq((0L, "create"), (1L, "append"), (2L, "upsert"), (3L, "delete"), (4L, "compact")))
    // compaction really compacted: one segment, one part file
    assert(TxLog.latest(tbl).segments.size === 1)
  }

  test("diffVersions classifies added/removed/changed/unchanged across versions") {
    val tbl = freshTable()
    TxLog.create(spark, tbl, Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "t"))
    TxLog.upsert(spark, tbl, Seq((2L, "y2"), (4L, "w")).toDF("k", "t"), Seq("k"))
    TxLog.delete(spark, tbl, col("k") === 3L)
    val d = TxLog.diffVersions(spark, tbl, 0L, 2L, Seq("k"), md5(col("t").cast("binary")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d === Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("cdc applyChanges: per-key winners upsert, tombstone winners delete") {
    val tbl = freshTable()
    TxLog.create(spark, tbl, Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L))
      .toDF("k", "name", "v"))
    // out-of-order feed: k=1 update v2 then delete v3 (dead); k=2 two
    // updates, v5 wins; k=5 insert
    val changes = Seq(
      (1L, "a2", 2L, "U"), (1L, "a3", 3L, "D"),
      (2L, "b5", 5L, "U"), (2L, "b4", 4L, "U"),
      (5L, "e", 1L, "U")).toDF("k", "name", "v", "op")
    TxLog.applyChanges(spark, tbl, changes, Seq("k"), Seq(col("v")), "op")
    val live = TxLog.read(spark, tbl).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(live === Set((2L, "b5", 5L), (3L, "c", 1L), (5L, "e", 1L)))
  }

  test("deleting every row keeps the schema readable at 0 rows") {
    val tbl = freshTable()
    TxLog.create(spark, tbl, Seq((1L, "a")).toDF("k", "t"))
    TxLog.delete(spark, tbl, lit(true))
    val empty = TxLog.read(spark, tbl)
    assert(empty.count() === 0 && empty.columns.toSeq === Seq("k", "t"))
  }

  test("concurrent appends all survive with distinct contiguous versions") {
    val tbl = freshTable()
    TxLog.create(spark, tbl, Seq((0L, 0L)).toDF("k", "v"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futures = (1 to 8).map { i =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long =
            TxLog.append(spark, tbl, Seq((i.toLong, i.toLong)).toDF("k", "v")).version
        })
      }
      val versions = futures.map(_.get()).sorted
      assert(versions === (1L to 8L), s"got $versions") // every claim distinct
    } finally pool.shutdown()
    assert(TxLog.read(spark, tbl).count() === 9) // no append lost
    assert(TxLog.history(tbl).map(_.version) === (0L to 8L))
  }

  test("concurrent conflicting rewrites both apply (loser recomputes, no lost update)") {
    val tbl = freshTable()
    TxLog.create(spark, tbl, Seq((1L, 0L), (2L, 0L)).toDF("k", "v"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val f1 = pool.submit(new Runnable {
        def run(): Unit =
          { TxLog.upsert(spark, tbl, Seq((1L, 100L)).toDF("k", "v"), Seq("k")); () }
      })
      val f2 = pool.submit(new Runnable {
        def run(): Unit =
          { TxLog.upsert(spark, tbl, Seq((2L, 200L)).toDF("k", "v"), Seq("k")); () }
      })
      f1.get(); f2.get()
    } finally pool.shutdown()
    // a lost update would leave one key at 0
    val live = TxLog.read(spark, tbl).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(live === Map(1L -> 100L, 2L -> 200L))
    assert(TxLog.history(tbl).map(_.version) === Seq(0L, 1L, 2L))
  }

  test("appendStreamBatch: a replayed (streamId, batchId) is skipped, never double-applied") {
    val tbl = freshTable()
    TxLog.create(spark, tbl, Seq((0L, 0L)).toDF("k", "v"))
    assert(TxLog.appendStreamBatch(spark, tbl, Seq((1L, 1L)).toDF("k", "v"), "s", 0L))
    // the restart scenario: same batch re-delivered
    assert(!TxLog.appendStreamBatch(spark, tbl, Seq((1L, 1L)).toDF("k", "v"), "s", 0L))
    assert(TxLog.read(spark, tbl).count() === 2) // not 3
    // a NEW batch id commits; a different streamId has its own id space
    assert(TxLog.appendStreamBatch(spark, tbl, Seq((2L, 2L)).toDF("k", "v"), "s", 1L))
    assert(TxLog.appendStreamBatch(spark, tbl, Seq((3L, 3L)).toDF("k", "v"), "s2", 0L))
    assert(TxLog.read(spark, tbl).count() === 4)
    assert(TxLog.history(tbl).map(_.op) === Seq("create",
      "stream_append:s:0", "stream_append:s:1", "stream_append:s2:0"))
  }

  test("appendedIn reads only the new segments; rewrite commits refuse the delta") {
    val tbl = freshTable()
    TxLog.create(spark, tbl, Seq((1L, 10L)).toDF("k", "v"))
    TxLog.append(spark, tbl, Seq((2L, 20L), (3L, 30L)).toDF("k", "v"))
    val d1 = TxLog.appendedIn(spark, tbl, 1L).collect().map(_.getLong(0)).sorted
    assert(d1.toSeq === Seq(2L, 3L)) // only the appended rows, not v0's
    TxLog.upsert(spark, tbl, Seq((1L, 11L)).toDF("k", "v"), Seq("k"))
    val e = intercept[IllegalArgumentException] { TxLog.appendedIn(spark, tbl, 2L) }
    assert(e.getMessage.contains("rewrote"))
    intercept[IllegalArgumentException] { TxLog.appendedIn(spark, tbl, 0L) }
  }

  test("create on an existing table fails; reads of unknown versions fail loudly") {
    val tbl = freshTable()
    TxLog.create(spark, tbl, Seq((1L, "a")).toDF("k", "t"))
    intercept[IllegalArgumentException] {
      TxLog.create(spark, tbl, Seq((2L, "b")).toDF("k", "t"))
    }
    intercept[RuntimeException] { TxLog.read(spark, tbl, 99L) }
  }
}
