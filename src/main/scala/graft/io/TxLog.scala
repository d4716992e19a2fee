package graft.io

import java.io.File
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{FileAlreadyExistsException, Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Transactional-lite table format: a versioned commit log over plain
 * parquet, giving the upsert / CDC-apply / snapshot-diff / compaction
 * family (q129/q186/q131/q130 — until now one-shot plans) a shared,
 * concurrent-writer-safe table identity. The Delta/Iceberg protocol shape
 * at its minimum viable core:
 *
 *   <table>/_graft_log/00000000.commit   one manifest per version
 *   <table>/data/<uuid>/                 immutable parquet segments
 *
 * A manifest lists the data segments that make up its snapshot, so a read
 * is SNAPSHOT-ISOLATED for free (the listed segments are immutable; a
 * concurrent commit only adds a new manifest) and time travel is "read an
 * older manifest". Commits are OPTIMISTIC: the manifest is fully written
 * to a temp file, then CLAIMED as version v+1 with an atomic hard-link
 * (link(2) fails with EEXIST if a concurrent writer got there first — the
 * same loser-retries discipline as Delta's HDFS LogStore rename). A loser
 * RECOMPUTES its plan against the winner's snapshot and retries, so
 * lost updates are impossible: every committed version is derived from
 * the version immediately below it.
 *
 * Scope honesty for 100 TB: atomic link + listing assumes a POSIX
 * filesystem (HDFS rename-no-overwrite is the same primitive); an S3-class
 * object store needs a conditional-PUT / external log for the CLAIM step —
 * the protocol shape (immutable segments + single claimed manifest per
 * version + loser-recomputes) carries over unchanged. Data segments are
 * parquet dirs written by ordinary distributed jobs; only the tiny
 * manifest goes through driver-side filesystem calls.
 */
object TxLog {

  /** One committed version: the segment dirs (relative to the table root)
    * whose union IS the snapshot, plus the operation that produced it. */
  case class Snapshot(version: Long, op: String, segments: Seq[String])

  private def logDir(table: String) = new File(table, "_graft_log")
  private def commitFile(table: String, v: Long) =
    new File(logDir(table), f"$v%08d.commit")

  private def render(s: Snapshot): String =
    (Seq(s"version=${s.version}", s"op=${s.op}") ++
      s.segments.map(f => s"segment=$f")).mkString("", "\n", "\n")

  private def parse(f: File): Snapshot = {
    val lines = new String(Files.readAllBytes(f.toPath), UTF_8)
      .split("\n").filter(_.nonEmpty)
    def one(k: String) = lines.collectFirst {
      case l if l.startsWith(s"$k=") => l.substring(k.length + 1)
    }.getOrElse(sys.error(s"corrupt commit ${f.getPath}: missing $k"))
    Snapshot(one("version").toLong, one("op"),
      lines.collect { case l if l.startsWith("segment=") => l.substring(8) }.toSeq)
  }

  /** All committed versions, ascending. Ignores temp files mid-claim. */
  def history(table: String): Seq[Snapshot] = {
    val d = logDir(table)
    if (!d.exists()) Seq.empty
    else d.listFiles((_, n) => n.endsWith(".commit")).sortBy(_.getName)
      .map(parse).toSeq
  }

  def latest(table: String): Snapshot = {
    val h = history(table)
    require(h.nonEmpty, s"not a TxLog table (no _graft_log commits): $table")
    h.last
  }

  /** Snapshot read; `version` for time travel (defaults to latest). */
  def read(spark: SparkSession, table: String, version: Long = -1L): DataFrame = {
    val snap =
      if (version < 0) latest(table)
      else history(table).find(_.version == version)
        .getOrElse(sys.error(s"no version $version in $table " +
          s"(have ${history(table).map(_.version).mkString(", ")})"))
    if (snap.segments.isEmpty) {
      // empty snapshot: replay schema from the newest non-empty ancestor
      val donor = history(table).takeWhile(_.version <= snap.version)
        .reverse.find(_.segments.nonEmpty)
        .getOrElse(sys.error(s"$table has no non-empty version <= ${snap.version}"))
      spark.read.parquet(donor.segments.map(s => s"$table/$s"): _*).limit(0)
    } else spark.read.parquet(snap.segments.map(s => s"$table/$s"): _*)
  }

  /** Write `df` as a fresh immutable segment; returns the relative path.
    * Distributed parquet write — the only driver-side work is naming. */
  private def writeSegment(table: String, df: DataFrame): String = {
    val rel = s"data/${java.util.UUID.randomUUID().toString.take(13)}"
    df.write.parquet(s"$table/$rel")
    rel
  }

  /** Atomically claim version `v`: full temp write, then hard-link to the
    * final name — link(2) is atomic and FAILS if the name exists, so
    * exactly one concurrent writer wins and readers never observe a
    * half-written manifest. */
  private def tryClaim(table: String, snap: Snapshot): Boolean = {
    val dir = logDir(table)
    dir.mkdirs()
    val tmp = File.createTempFile(s"claim_${snap.version}_", ".tmp", dir)
    Files.write(tmp.toPath, render(snap).getBytes(UTF_8))
    val dst = commitFile(table, snap.version).toPath
    try {
      Files.createLink(dst, tmp.toPath)
      tmp.delete()
      true
    } catch {
      case _: FileAlreadyExistsException => tmp.delete(); false
    }
  }

  /** Create the table at version 0 from `df`. Fails if it already exists. */
  def create(spark: SparkSession, table: String, df: DataFrame): Snapshot = {
    require(!logDir(table).exists() || history(table).isEmpty,
      s"TxLog table already exists: $table")
    val snap = Snapshot(0L, "create", Seq(writeSegment(table, df)))
    require(tryClaim(table, snap), s"concurrent create of $table")
    snap
  }

  private def dropSegment(table: String, seg: String): Unit = {
    val p = Paths.get(s"$table/$seg")
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(x => { Files.deleteIfExists(x); () })
  }

  /** Optimistic-retry commit of a snapshot TRANSFORM: `plan` receives the
    * current snapshot's DataFrame and returns (op, next snapshot content,
    * reusable segments of the current snapshot). The new content is
    * written as a fresh segment FIRST; if the claim loses to a concurrent
    * writer the orphan segment is dropped and the plan RECOMPUTES against
    * the winner's snapshot — serializable by construction. */
  private def commitTransform(spark: SparkSession, table: String,
      maxRetries: Int = 20)(
      plan: (Snapshot, DataFrame) => (String, Option[DataFrame], Seq[String])): Snapshot = {
    var attempt = 0
    while (attempt < maxRetries) {
      val base = latest(table)
      val (op, newData, keptSegments) = plan(base, read(spark, table, base.version))
      val newSegments = newData.map(writeSegment(table, _)).toSeq
      val snap = Snapshot(base.version + 1, op, keptSegments ++ newSegments)
      if (tryClaim(table, snap)) return snap
      // lost the race: drop the orphan segment, recompute on the winner
      newSegments.foreach(dropSegment(table, _))
      attempt += 1
    }
    throw new IllegalStateException(
      s"TxLog commit on $table lost $maxRetries consecutive races — " +
        "pathological contention; serialize writers or raise maxRetries")
  }

  /**
   * Idempotent micro-batch append — the exactly-once `foreachBatch`
   * discipline: the (streamId, batchId) pair rides the manifest's op, so
   * a batch REPLAYED after a failure/restart (Structured Streaming
   * re-delivers the last uncommitted batch from its checkpoint) is
   * detected in the log and skipped instead of double-applied. Returns
   * true if committed, false if this batch was already in the log.
   */
  def appendStreamBatch(spark: SparkSession, table: String, batch: DataFrame,
      streamId: String, batchId: Long, maxRetries: Int = 20): Boolean = {
    require(!streamId.contains("\n"), "streamId must be single-line")
    val tag = s"stream_append:$streamId:$batchId"
    var attempt = 0
    while (attempt < maxRetries) {
      val h = history(table)
      require(h.nonEmpty, s"not a TxLog table: $table")
      if (h.exists(_.op == tag)) return false // replay: already committed
      val seg = writeSegment(table, batch)
      if (tryClaim(table, Snapshot(h.last.version + 1, tag, h.last.segments :+ seg)))
        return true
      dropSegment(table, seg)
      attempt += 1
    }
    throw new IllegalStateException(
      s"TxLog stream append on $table lost $maxRetries consecutive races")
  }

  /** `foreachBatch` adapter: `df.writeStream.foreachBatch(TxLog.streamSink(tbl, id))`.
    * Empty micro-batches (AvailableNow sometimes schedules one at the
    * tail) commit nothing — the log records only batches that carried rows. */
  def streamSink(table: String, streamId: String): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      if (!batch.isEmpty)
        appendStreamBatch(batch.sparkSession, table, batch, streamId, batchId)
      ()
    }

  /** Append-only commit: no base rows move, the new segment just joins the
    * manifest — concurrent appends always both survive (retry re-lists). */
  def append(spark: SparkSession, table: String, df: DataFrame): Snapshot =
    commitTransform(spark, table) { (base, _) =>
      ("append", Some(df), base.segments)
    }

  /** MERGE-INTO semantics as a versioned commit ([[graft.operators.Ingest.upsert]]
    * does the plan work: base never shuffles, update keys broadcast). The
    * whole snapshot rewrites into one fresh segment — the lite tradeoff
    * (real Delta rewrites only touched files; the protocol is identical). */
  def upsert(spark: SparkSession, table: String, updates: DataFrame,
      keyCols: Seq[String]): Snapshot =
    commitTransform(spark, table) { (_, cur) =>
      ("upsert", Some(graft.operators.Ingest.upsert(cur, updates, keyCols)), Seq.empty)
    }

  /** Delete rows matching `cond` (a rewrite commit). */
  def delete(spark: SparkSession, table: String, cond: Column): Snapshot =
    commitTransform(spark, table) { (_, cur) =>
      ("delete", Some(cur.filter(!coalesce(cond, lit(false)))), Seq.empty)
    }

  /** Apply a CDC change batch ([[graft.operators.Ingest.cdcApply]] picks
    * each key's winner; tombstone winners delete) onto the live snapshot:
    * surviving change rows upsert, tombstoned keys drop — one commit. */
  def applyChanges(spark: SparkSession, table: String, changes: DataFrame,
      keyCols: Seq[String], orderCols: Seq[Column], opCol: String,
      deleteOp: String = "D"): Snapshot =
    commitTransform(spark, table) { (_, cur) =>
      val winners = graft.operators.Ingest.cdcApply(
        changes, keyCols, orderCols, opCol, deleteOp)
      val dead = graft.operators.Ingest.cdcApply(
          changes, keyCols, orderCols, opCol, deleteOp = "__graft_none__")
        .filter(col(opCol) === deleteOp)
        .select(keyCols.map(col): _*)
      val renamed = keyCols.map(k => k -> s"__graft_dk_$k")
      val deadKeys = dead.select(renamed.map { case (k, a) => col(k).as(a) }: _*)
      val cond = renamed.map { case (k, a) => col(k) <=> col(a) }.reduce(_ && _)
      val upserted = graft.operators.Ingest.upsert(
        cur, winners.select(cur.columns.map(col).toSeq: _*), keyCols)
      ("cdc_apply", Some(upserted.join(deadKeys, cond, "left_anti")), Seq.empty)
    }

  /** Compaction: same rows, `targetPartitions` output files, one commit —
    * readers on older versions still see the pre-compaction segments. */
  def compact(spark: SparkSession, table: String, targetPartitions: Int): Snapshot =
    commitTransform(spark, table) { (_, cur) =>
      ("compact", Some(cur.repartition(targetPartitions)), Seq.empty)
    }

  /** Per-key change classification between two committed versions —
    * [[graft.operators.Ingest.snapshotDiff]] over time travel. */
  def diffVersions(spark: SparkSession, table: String, oldV: Long, newV: Long,
      keyCols: Seq[String], fingerprint: Column): DataFrame =
    graft.operators.Ingest.snapshotDiff(
      read(spark, table, oldV), read(spark, table, newV), keyCols, fingerprint)

  /**
   * The rows ADDED by `version` relative to its parent — read straight
   * from the manifest diff, touching ONLY the new segments (never the
   * accumulated table). This is what makes incremental maintenance real
   * at 100 TB: an aggregate state table updates from each append's delta
   * ([[graft.operators.Ingest.mergeAggState]]) without re-reading
   * history. Exact for append-type commits (append/stream_append), whose
   * manifests strictly extend the parent's segment list; a rewrite
   * commit (upsert/delete/compact) has no additive delta and fails
   * loudly rather than returning something wrong.
   */
  def appendedIn(spark: SparkSession, table: String, version: Long): DataFrame = {
    require(version > 0, s"version 0 is the full create snapshot — read() it")
    val h = history(table)
    val cur = h.find(_.version == version)
      .getOrElse(sys.error(s"no version $version in $table"))
    val prev = h.find(_.version == version - 1)
      .getOrElse(sys.error(s"no parent version ${version - 1} in $table"))
    require(prev.segments.forall(cur.segments.contains),
      s"version $version (op=${cur.op}) rewrote the snapshot — append-delta " +
        "reading is only exact for append commits; rebuild state from read()")
    val added = cur.segments.filterNot(prev.segments.contains)
    if (added.isEmpty) read(spark, table, version).limit(0)
    else spark.read.parquet(added.map(s => s"$table/$s"): _*)
  }
}
