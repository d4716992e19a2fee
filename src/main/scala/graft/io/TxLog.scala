package graft.io

import java.io.File
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{FileAlreadyExistsException, Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One committed version: the segment dirs (relative to the table root)
  * whose union IS the snapshot, plus the operation that produced it. */
case class TxSnapshot(version: Long, op: String, segments: Seq[String])

/**
 * The storage primitive the commit log needs — Delta's LogStore shape.
 * Everything concurrency-critical funnels through [[putIfAbsent]]: an
 * atomic create-if-not-exists of a fully-written log file. The POSIX
 * implementation uses link(2); an S3-class object store implements the
 * SAME contract with a conditional PUT (`If-None-Match: *`) — the protocol
 * above never changes, only this trait's binding.
 *
 * Log files are tiny (a manifest is a few hundred bytes) and always
 * written whole — no appends, no partial reads. Data segments do NOT go
 * through the store: they are parquet directories written by ordinary
 * distributed Spark jobs.
 */
trait LogStore {
  /** Names of all log files for `table` (unordered). */
  def list(table: String): Seq[String]
  /** Full contents of a log file; throws if absent. */
  def read(table: String, name: String): String
  /** Atomic create-if-absent — the CLAIM primitive. True iff this call
    * created the file; false iff it already existed (lost the race). The
    * content must be fully visible to any reader that sees the name. */
  def putIfAbsent(table: String, name: String, content: String): Boolean
  /** Overwrite-allowed pointer write (for `_last_checkpoint`), atomic
    * against readers (a reader sees the old or the new content, never a
    * torn mix). Last writer wins — pointer content is monotone-safe. */
  def putPointer(table: String, name: String, content: String): Unit
  /** Read a pointer if present. */
  def readPointer(table: String, name: String): Option[String]
}

/** POSIX/HDFS binding: log files live in `<table>/_graft_log/`; the claim
  * is a full temp-file write followed by link(2), which is atomic and
  * fails with EEXIST if a concurrent writer got there first (the same
  * discipline as Delta's HDFS LogStore rename-no-overwrite). */
object PosixLogStore extends LogStore {
  private def dir(table: String) = new File(table, "_graft_log")

  def list(table: String): Seq[String] = {
    val d = dir(table)
    if (!d.exists()) Seq.empty
    else d.listFiles().map(_.getName).toSeq
  }

  def read(table: String, name: String): String =
    new String(Files.readAllBytes(new File(dir(table), name).toPath), UTF_8)

  def putIfAbsent(table: String, name: String, content: String): Boolean = {
    val d = dir(table)
    d.mkdirs()
    val tmp = File.createTempFile(s"claim_", ".tmp", d)
    Files.write(tmp.toPath, content.getBytes(UTF_8))
    try {
      Files.createLink(new File(d, name).toPath, tmp.toPath)
      tmp.delete()
      true
    } catch {
      case _: FileAlreadyExistsException => tmp.delete(); false
    }
  }

  def putPointer(table: String, name: String, content: String): Unit = {
    val d = dir(table)
    d.mkdirs()
    val tmp = File.createTempFile(s"ptr_", ".tmp", d)
    Files.write(tmp.toPath, content.getBytes(UTF_8))
    Files.move(tmp.toPath, new File(d, name).toPath,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  def readPointer(table: String, name: String): Option[String] = {
    val f = new File(dir(table), name)
    if (f.exists()) Some(new String(Files.readAllBytes(f.toPath), UTF_8)) else None
  }
}

/** In-memory binding with EXACTLY the conditional-PUT semantics an
  * S3-class object store provides (`putIfAbsent` = `If-None-Match: *`).
  * Exists so the concurrency suite proves the PROTOCOL is correct against
  * the object-store contract, not against an accident of link(2) — the
  * production S3 binding differs from this only in where the bytes go. */
final class InMemoryLogStore extends LogStore {
  private val files =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  def list(table: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    files.keySet().asScala.collect { case (t, n) if t == table => n }.toSeq
  }

  def read(table: String, name: String): String = {
    val c = files.get((table, name))
    require(c != null, s"no such log file: $table/$name")
    c
  }

  def putIfAbsent(table: String, name: String, content: String): Boolean =
    files.putIfAbsent((table, name), content) == null

  def putPointer(table: String, name: String, content: String): Unit = {
    files.put((table, name), content); ()
  }

  def readPointer(table: String, name: String): Option[String] =
    Option(files.get((table, name)))
}

/**
 * Transactional-lite table format: a versioned commit log over plain
 * parquet, giving the upsert / CDC-apply / snapshot-diff / compaction
 * family (q129/q186/q131/q130 — until now one-shot plans) a shared,
 * concurrent-writer-safe table identity. The Delta/Iceberg protocol shape
 * at its minimum viable core:
 *
 *   <table>/_graft_log/00000000.commit       one manifest per version
 *   <table>/_graft_log/000000N0.checkpoint   cumulative state every
 *                                            `checkpointInterval` commits
 *   <table>/_graft_log/_last_checkpoint      pointer to the newest one
 *   <table>/data/<uuid>/                     immutable parquet segments
 *
 * A manifest lists the data segments that make up its snapshot, so a read
 * is SNAPSHOT-ISOLATED for free (the listed segments are immutable; a
 * concurrent commit only adds a new manifest) and time travel is "read an
 * older manifest". Commits are OPTIMISTIC: the manifest is fully written,
 * then CLAIMED as version v+1 through [[LogStore.putIfAbsent]] (exactly
 * one concurrent writer wins). A loser RECOMPUTES its plan against the
 * winner's snapshot and retries, so lost updates are impossible: every
 * committed version is derived from the version immediately below it.
 *
 * CHECKPOINTS keep per-operation log work FLAT as the table ages (the
 * Delta `_last_checkpoint` discipline): every `checkpointInterval`-th
 * commit also writes a checkpoint carrying the cumulative log state — the
 * vacuum retention floor and each stream's committed high-water batch id —
 * so the hot paths ([[appendStreamBatch]]'s replay check, [[read]]'s floor
 * check) parse one checkpoint plus at most an interval's worth of tail
 * manifests, never the whole history. A long-running stream's per-batch
 * commit cost is O(interval), independent of how many thousands of
 * versions the log holds.
 *
 * VACUUM ([[vacuum]]) bounds storage: rewrite commits (upsert / delete /
 * compact) supersede whole snapshots, and without reclamation every
 * superseded segment would live forever. Vacuum commits a retention floor
 * (itself a versioned, claim-serialized commit — concurrent writers
 * compose) and then deletes the segments only sub-floor manifests
 * reference. Time travel at or above the floor is untouched; below it,
 * reads fail loudly with the floor in the message. Retention >= 1 means
 * the latest snapshot's segments are always kept, so concurrent readers
 * of the live table never race the delete.
 *
 * Reads merge schemas across segment generations (an appended batch may
 * carry added columns — older rows surface NULL there); incompatible type
 * changes fail loudly at read time, and [[ParquetIO.schemaReport]] is the
 * drift detector to run before appending anything questionable.
 *
 * Data segments are parquet dirs written by ordinary distributed jobs;
 * only the tiny manifests go through the [[LogStore]].
 */
class TxLogOps(val store: LogStore, val checkpointInterval: Int = 10) {
  require(checkpointInterval >= 2, s"checkpointInterval must be >= 2")

  type Snapshot = TxSnapshot

  private def commitName(v: Long) = f"$v%08d.commit"
  private def checkpointName(v: Long) = f"$v%08d.checkpoint"
  private val LastCheckpoint = "_last_checkpoint"
  private val StreamTag = "stream_append:"
  private val VacuumTag = "vacuum:retainFrom="

  private def render(s: Snapshot): String =
    (Seq(s"version=${s.version}", s"op=${s.op}") ++
      s.segments.map(f => s"segment=$f")).mkString("", "\n", "\n")

  private def parse(name: String, content: String): Snapshot = {
    val lines = content.split("\n").filter(_.nonEmpty)
    def one(k: String) = lines.collectFirst {
      case l if l.startsWith(s"$k=") => l.substring(k.length + 1)
    }.getOrElse(sys.error(s"corrupt commit $name: missing $k"))
    TxSnapshot(one("version").toLong, one("op"),
      lines.collect { case l if l.startsWith("segment=") => l.substring(8) }.toSeq)
  }

  /** Committed version numbers, ascending — a name listing, no parses. */
  private def listVersions(table: String): Seq[Long] =
    store.list(table).filter(_.endsWith(".commit"))
      .map(_.stripSuffix(".commit").toLong).sorted

  /** Parse exactly one manifest; loud with the available range if absent. */
  private def snapshotOf(table: String, v: Long): Snapshot =
    try parse(commitName(v), store.read(table, commitName(v)))
    catch {
      case _: java.io.IOException | _: IllegalArgumentException =>
        val have = listVersions(table)
        sys.error(s"no version $v in $table (have ${have.mkString(", ")})")
    }

  /** All committed versions, ascending. O(versions) parses — fine for
    * inspection and tests; the hot paths go through [[logState]]. */
  def history(table: String): Seq[Snapshot] =
    listVersions(table).map(snapshotOf(table, _))

  def latest(table: String): Snapshot = {
    val vs = listVersions(table)
    require(vs.nonEmpty, s"not a TxLog table (no _graft_log commits): $table")
    snapshotOf(table, vs.last)
  }

  // ---- checkpointed log state --------------------------------------------

  /** Cumulative state at a checkpoint: the vacuum retention floor and each
    * stream's committed high-water batch id (the Delta `txn` discipline —
    * per-stream max, bounded by #streams, not #batches). */
  private case class CpState(version: Long, floor: Long, txns: Map[String, Long])

  private def renderCp(s: CpState): String =
    (Seq(s"version=${s.version}", s"floor=${s.floor}") ++
      s.txns.toSeq.sortBy(_._1).map { case (k, v) => s"txn=$k:$v" })
      .mkString("", "\n", "\n")

  private def parseCp(content: String): CpState = {
    val lines = content.split("\n").filter(_.nonEmpty)
    def one(k: String) = lines.collectFirst {
      case l if l.startsWith(s"$k=") => l.substring(k.length + 1)
    }.getOrElse(sys.error(s"corrupt checkpoint: missing $k"))
    val txns = lines.collect { case l if l.startsWith("txn=") =>
      val body = l.substring(4)
      val i = body.lastIndexOf(':')
      body.substring(0, i) -> body.substring(i + 1).toLong
    }.toMap
    CpState(one("version").toLong, one("floor").toLong, txns)
  }

  private def lastCheckpoint(table: String): Option[CpState] =
    store.readPointer(table, LastCheckpoint).map { v =>
      parseCp(store.read(table, checkpointName(v.trim.toLong)))
    }

  private def foldOp(floor: Long, txns: Map[String, Long], op: String): (Long, Map[String, Long]) =
    if (op.startsWith(StreamTag)) {
      val body = op.substring(StreamTag.length)
      val i = body.lastIndexOf(':')
      val sid = body.substring(0, i)
      val bid = body.substring(i + 1).toLong
      (floor, txns.updated(sid, math.max(bid, txns.getOrElse(sid, -1L))))
    } else if (op.startsWith(VacuumTag)) {
      (math.max(floor, op.substring(VacuumTag.length).toLong), txns)
    } else (floor, txns)

  /** Log state up to `upTo` (or the newest commit): latest version, floor,
    * per-stream high-water marks. FLAT cost: one checkpoint read plus the
    * tail manifests after it — never the whole history. */
  private def logState(table: String, upTo: Long = Long.MaxValue): (Long, Long, Map[String, Long]) = {
    val versions = listVersions(table).filter(_ <= upTo)
    if (versions.isEmpty) return (-1L, 0L, Map.empty)
    val cp = lastCheckpoint(table).filter(_.version <= versions.last)
    var floor = cp.map(_.floor).getOrElse(0L)
    var txns = cp.map(_.txns).getOrElse(Map.empty[String, Long])
    val from = cp.map(_.version + 1).getOrElse(0L)
    versions.filter(_ >= from).foreach { v =>
      val r = foldOp(floor, txns, snapshotOf(table, v).op)
      floor = r._1; txns = r._2
    }
    (versions.last, floor, txns)
  }

  /** The vacuum retention floor: versions below it are unreadable. */
  def retentionFloor(table: String): Long = logState(table)._2

  /** After winning the claim of `v`: every `checkpointInterval`-th version
    * also persists the cumulative state and bumps the pointer. Only the
    * winner of `v` gets here for `v`, so the write is single-writer;
    * putIfAbsent keeps a crash-retry idempotent. */
  private def maybeCheckpoint(table: String, v: Long): Unit =
    if (v > 0 && v % checkpointInterval == 0) {
      val (_, floor, txns) = logState(table, upTo = v)
      store.putIfAbsent(table, checkpointName(v), renderCp(CpState(v, floor, txns)))
      val cur = store.readPointer(table, LastCheckpoint).map(_.trim.toLong).getOrElse(-1L)
      if (cur < v) store.putPointer(table, LastCheckpoint, v.toString)
    }

  // ---- reads ---------------------------------------------------------------

  /** Snapshot read; `version` for time travel (defaults to latest).
    * Schemas MERGE across segment generations (added columns surface, old
    * rows read NULL there); a vacuumed version fails loudly with the
    * retention floor in the message. */
  def read(spark: SparkSession, table: String, version: Long = -1L): DataFrame = {
    val (lv, floor, _) = logState(table)
    require(lv >= 0, s"not a TxLog table (no _graft_log commits): $table")
    val v = if (version < 0) lv else version
    if (v > lv) sys.error(s"no version $v in $table (latest is $lv)")
    require(v >= floor,
      s"version $v of $table was vacuumed (retention floor $floor) — " +
        "time travel below the floor is gone; raise retainVersions before vacuuming")
    val snap = snapshotOf(table, v)
    if (snap.segments.isEmpty) {
      // empty snapshot: replay schema from the newest non-empty ancestor
      val donor = (snap.version - 1 to floor by -1).iterator
        .map(snapshotOf(table, _)).find(_.segments.nonEmpty)
        .getOrElse(sys.error(s"$table has no non-empty version <= ${snap.version}"))
      readSegments(spark, table, donor.segments).limit(0)
    } else readSegments(spark, table, snap.segments)
  }

  private def readSegments(spark: SparkSession, table: String, segs: Seq[String]): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(segs.map(s => s"$table/$s"): _*)

  /** Write `df` as a fresh immutable segment; returns the relative path.
    * Distributed parquet write — the only driver-side work is naming. */
  private def writeSegment(table: String, df: DataFrame): String = {
    val rel = s"data/${java.util.UUID.randomUUID().toString.take(13)}"
    df.write.parquet(s"$table/$rel")
    rel
  }

  private def tryClaim(table: String, snap: Snapshot): Boolean = {
    val won = store.putIfAbsent(table, commitName(snap.version), render(snap))
    if (won) maybeCheckpoint(table, snap.version)
    won
  }

  /** Create the table at version 0 from `df`. Fails if it already exists. */
  def create(spark: SparkSession, table: String, df: DataFrame): Snapshot = {
    require(listVersions(table).isEmpty, s"TxLog table already exists: $table")
    val snap = TxSnapshot(0L, "create", Seq(writeSegment(table, df)))
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
      val snap = TxSnapshot(base.version + 1, op, keptSegments ++ newSegments)
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
   * discipline: each stream's committed HIGH-WATER batch id rides the log
   * (manifest ops fold into the checkpoint state, the Delta `txn`
   * discipline), so a batch REPLAYED after a failure/restart (Structured
   * Streaming re-delivers the last uncommitted batch from its checkpoint,
   * and batch ids are monotone per stream) is detected and skipped instead
   * of double-applied. Returns true if committed, false if this batch id
   * was already at or below the stream's committed mark. Per-batch log
   * cost is FLAT (checkpoint + tail), independent of the log's length.
   */
  def appendStreamBatch(spark: SparkSession, table: String, batch: DataFrame,
      streamId: String, batchId: Long, maxRetries: Int = 20): Boolean = {
    require(!streamId.contains("\n"), "streamId must be single-line")
    val tag = s"$StreamTag$streamId:$batchId"
    var attempt = 0
    while (attempt < maxRetries) {
      val (lv, _, txns) = logState(table)
      require(lv >= 0, s"not a TxLog table: $table")
      if (txns.getOrElse(streamId, -1L) >= batchId) return false // replay
      val seg = writeSegment(table, batch)
      if (tryClaim(table, TxSnapshot(lv + 1, tag, snapshotOf(table, lv).segments :+ seg)))
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

  /** OPTIMIZE ZORDER: a compaction rewrite whose fresh segment is
    * clustered along the (colA, colB) Z-curve ([[ZOrder.mortonKey]]) —
    * range-partitioned on the Morton key and sorted within partitions, so
    * parquet row-group min/max envelopes stay tight on BOTH clustering
    * columns and a statistics-pruning scan skips most of the segment for
    * a selective predicate on either one. Same rows, one commit; the
    * layout is physical, the log records `optimize_zorder` and time
    * travel still reads the pre-optimize layout. */
  def optimize(spark: SparkSession, table: String, colA: String, colB: String,
      targetPartitions: Int = 8): Snapshot =
    commitTransform(spark, table) { (_, cur) =>
      val clustered = cur.withColumn("__zkey", ZOrder.mortonKey(cur, colA, colB))
        .repartitionByRange(targetPartitions, col("__zkey"))
        .sortWithinPartitions(col("__zkey"))
        .drop("__zkey")
      (s"optimize_zorder:$colA,$colB", Some(clustered), Seq.empty)
    }

  /**
   * CDC-style CHANGE FEED over an append-only version range: every row
   * committed in versions (fromVersion, toVersion], tagged with its
   * `_commit_version` — the incremental-consumer shape (a downstream job
   * resumes from the last version it processed and reads ONLY the new
   * segments, the Delta CDF discipline for append tables). Schemas merge
   * across the range (an appended column surfaces NULL for earlier
   * versions); a rewrite commit inside the range refuses loudly via
   * [[appendedIn]] — its delta is not additive, so the consumer must
   * rebuild from [[read]] instead of silently missing changes.
   */
  def changeFeed(spark: SparkSession, table: String, fromVersion: Long,
      toVersion: Long = -1L): DataFrame = {
    val (lv, floor, _) = logState(table)
    require(lv >= 0, s"not a TxLog table: $table")
    val to = if (toVersion < 0) lv else toVersion
    require(fromVersion >= 0 && to <= lv && fromVersion <= to,
      s"bad change-feed range ($fromVersion, $to] on $table (latest $lv)")
    require(fromVersion + 1 >= floor || fromVersion == to,
      s"change-feed range ($fromVersion, $to] starts below the retention floor $floor")
    if (fromVersion == to) return read(spark, table, to).limit(0)
      .withColumn("_commit_version", lit(-1L)).filter(lit(false))
    (fromVersion + 1 to to).map { v =>
      appendedIn(spark, table, v).withColumn("_commit_version", lit(v))
    }.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /**
   * Reclaim the storage rewrite commits strand: keep the newest
   * `retainVersions` versions readable (time travel within retention is
   * bit-identical — their manifests and segments are untouched), commit
   * the new retention floor as a versioned, claim-serialized commit (so
   * vacuum composes with concurrent writers like any other commit), then
   * physically delete every segment referenced ONLY by sub-floor
   * manifests. A read below the floor fails loudly with the floor in the
   * message. `retainVersions >= 1` keeps the pre-vacuum latest snapshot's
   * segments alive by construction (the vacuum manifest carries them
   * forward), so concurrent live readers never race the delete; only a
   * time traveler below the floor can observe it, and the floor check
   * turns that into a loud error.
   *
   * Segments never referenced by ANY manifest (a concurrent writer's
   * in-flight, not-yet-claimed segment) are deliberately NOT touched —
   * orphan cleanup on lost claims already handles those.
   */
  def vacuum(spark: SparkSession, table: String, retainVersions: Int): Snapshot = {
    require(retainVersions >= 1, s"retainVersions must be >= 1, got $retainVersions")
    val snap = commitTransform(spark, table) { (base, _) =>
      val prevFloor = logState(table, upTo = base.version)._2
      // the vacuum commit itself is version base+1; retain the newest
      // retainVersions versions counting from it
      val floor = math.max(prevFloor, math.max(0L, base.version + 2 - retainVersions))
      (s"$VacuumTag$floor", None, base.segments)
    }
    val floor = snap.op.substring(VacuumTag.length).toLong
    val kept = (floor to snap.version)
      .flatMap(v => snapshotOf(table, v).segments).toSet
    val dropped = (0L until floor)
      .flatMap(v => snapshotOf(table, v).segments).toSet -- kept
    dropped.foreach(dropSegment(table, _))
    snap
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
    val floor = retentionFloor(table)
    require(version >= floor,
      s"version $version of $table was vacuumed (retention floor $floor)")
    val cur = snapshotOf(table, version)
    val prev = snapshotOf(table, version - 1)
    require(prev.segments.forall(cur.segments.contains),
      s"version $version (op=${cur.op}) rewrote the snapshot — append-delta " +
        "reading is only exact for append commits; rebuild state from read()")
    val added = cur.segments.filterNot(prev.segments.contains)
    if (added.isEmpty) read(spark, table, version).limit(0)
    else spark.read.option("mergeSchema", "true")
      .parquet(added.map(s => s"$table/$s"): _*)
  }
}

/** The production binding: POSIX/HDFS claims, default checkpoint cadence.
  * `TxLog.xxx(...)` is the library surface; tests exercising the
  * object-store protocol instantiate [[TxLogOps]] over [[InMemoryLogStore]]. */
object TxLog extends TxLogOps(PosixLogStore) {
  val Snapshot: TxSnapshot.type = TxSnapshot
}
