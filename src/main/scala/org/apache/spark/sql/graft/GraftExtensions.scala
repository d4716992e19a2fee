package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/**
 * SparkSessionExtensions entry point: exposes the graft codegen kernels and
 * sketch aggregates to the pure-SQL surface —
 *
 *   spark-submit --conf spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions
 *   spark.sql("SELECT vec_cosine(a.embedding, b.embedding) FROM ...")
 *
 * Almost all operator semantics compose from built-ins (SURVEY.md §4), so
 * the bulk of the registrations are scalar/aggregate functions: SQL users
 * can't reach a Scala `Column` helper, so functions get registry entries,
 * each builder validating its literal parameters eagerly for sane error
 * messages. The one whole-operator exception is the native AS-OF join
 * ([[AsOfJoinNode]]/[[AsOfJoinExec]]) — a point-in-time join genuinely is
 * not expressible as a function or a composition with the right physical
 * contract, so its planner strategy is injected here too (sessions built
 * without the extension get it lazily via
 * [[AsOfJoinPlanBuilder.build]]'s `experimental.extraStrategies`
 * fallback).
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit = {
    registrations.foreach(ext.injectFunction)
    GraftExtensions.tableRegistrations.foreach(ext.injectTableFunction)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectPlannerStrategy(_ => TxLogProcedureStrategy)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def litLong(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def litStr(e: Expression, what: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  private def litBool(e: Expression, what: String): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be a boolean literal, got $other")
  }

  /** fpp accepts a decimal literal directly (0.005) or, for backwards
    * compatibility, an integer literal read as a percent (1 = 0.01) —
    * validated here so misuse fails with a message naming the parameter. */
  private def litFpp(e: Expression): Double = e match {
    case Literal(v: Double, _) => v
    case Literal(v: Float, _) => v.toDouble
    case Literal(v: java.math.BigDecimal, _) => v.doubleValue()
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case Literal(v: Int, _) =>
      require(v >= 1 && v <= 99,
        s"integer fpp is a percent and must be in [1,99], got $v " +
          "(pass a decimal literal like 0.001 for rates below 1%)")
      v / 100.0
    case other => throw new IllegalArgumentException(
      s"fpp must be a numeric literal, got $other")
  }

  /** A fraction-valued literal parameter (quantile, alpha): any numeric
    * literal form, validated by the consuming constructor. */
  private def litFrac(e: Expression, what: String): Double = e match {
    case Literal(v: Double, _) => v
    case Literal(v: Float, _) => v.toDouble
    case Literal(v: java.math.BigDecimal, _) => v.doubleValue()
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case Literal(v: Int, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $other")
  }

  private def arity(n: Int, name: String)(b: Seq[Expression] => Expression): FunctionBuilder =
    (exprs: Seq[Expression]) => {
      require(exprs.length == n, s"$name expects $n arguments, got ${exprs.length}")
      b(exprs)
    }

  /**
   * TABLE-VALUED functions: the TxLog lakehouse tier on the pure-SQL
   * surface — `SELECT ... FROM graft_txlog('/path')` (snapshot-isolated,
   * deletion vectors applied), with time travel by version
   * (`graft_txlog('/path', 3)`) or wall-clock (`graft_txlog('/path',
   * 'ts=<millis>')`), and `graft_txlog_changes('/path', fromV[, toV])`
   * for the classified CDF. The builder runs at resolution time on the
   * ACTIVE session and returns the read's logical plan, so everything
   * downstream (pruning, pushdown into the parquet scan, the dv
   * anti-join) is ordinary Catalyst — no bespoke physical source.
   */
  val tableRegistrations: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] = Seq(
    (FunctionIdentifier("graft_txlog"),
      info("graft_txlog",
        "graft_txlog(path[, version | 'ts=<millis>']) — read a graft TxLog table"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1 || exprs.length == 2,
          s"graft_txlog expects (path[, version|'ts=<millis>']), got ${exprs.length} args")
        val spark = org.apache.spark.sql.SparkSession.active
        val path = litStr(exprs.head, "graft_txlog path")
        val df =
          if (exprs.length == 1) graft.io.TxLog.read(spark, path)
          else exprs(1) match {
            case Literal(s: org.apache.spark.unsafe.types.UTF8String, _)
                if s.toString.startsWith("ts=") =>
              graft.io.TxLog.readAsOf(spark, path, s.toString.substring(3).toLong)
            case e => graft.io.TxLog.read(spark, path, litLong(e, "graft_txlog version"))
          }
        df.queryExecution.logical
      }),
    (FunctionIdentifier("graft_txlog_tagged"),
      info("graft_txlog_tagged",
        "graft_txlog_tagged(path, tag) — read a tagged snapshot (floor-exempt: " +
          "a live tag's artifacts are vacuum-protected forever)"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"graft_txlog_tagged expects (path, tag), got ${exprs.length} args")
        val spark = org.apache.spark.sql.SparkSession.active
        val path = litStr(exprs.head, "graft_txlog_tagged path")
        val tag = litStr(exprs(1), "tag")
        graft.io.TxLog.readTagged(spark, path, tag).queryExecution.logical
      }),
    (FunctionIdentifier("graft_txlog_refs"),
      info("graft_txlog_refs",
        "graft_txlog_refs(path) — the table's live refs: one (kind, name, version) " +
          "row per branch (version = fork) and tag"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1,
          s"graft_txlog_refs expects (path), got ${exprs.length} args")
        val spark = org.apache.spark.sql.SparkSession.active
        val path = litStr(exprs.head, "graft_txlog_refs path")
        import spark.implicits._
        (graft.io.TxLog.branches(path).map { case (n, v) => ("branch", n, v) } ++
          graft.io.TxLog.tags(path).map { case (n, v) => ("tag", n, v) })
          .toDF("kind", "name", "version").queryExecution.logical
      }),
    (FunctionIdentifier("graft_txlog_constraints"),
      info("graft_txlog_constraints",
        "graft_txlog_constraints(path) — the active CHECK constraints: one " +
          "(name, check_sql) row each"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1,
          s"graft_txlog_constraints expects (path), got ${exprs.length} args")
        val spark = org.apache.spark.sql.SparkSession.active
        val path = litStr(exprs.head, "graft_txlog_constraints path")
        import spark.implicits._
        graft.io.TxLog.constraintsOf(path).toSeq.sorted
          .toDF("name", "check_sql").queryExecution.logical
      }),
    (FunctionIdentifier("graft_txlog_changes"),
      info("graft_txlog_changes",
        "graft_txlog_changes(path, fromVersion[, toVersion]) — the classified CDF"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2 || exprs.length == 3,
          s"graft_txlog_changes expects (path, fromVersion[, toVersion]), got ${exprs.length} args")
        val spark = org.apache.spark.sql.SparkSession.active
        val path = litStr(exprs.head, "graft_txlog_changes path")
        val from = litLong(exprs(1), "fromVersion")
        val to = if (exprs.length == 3) litLong(exprs(2), "toVersion") else -1L
        graft.io.TxLog.changeFeed(spark, path, from, to).queryExecution.logical
      })) ++ writeProcedures

  /** The TxLog WRITE surface (verdict r9 #6): CALL-style procedures as
    * table functions — argument literals resolve eagerly (loud errors),
    * the write itself runs at EXECUTION time through
    * [[TxLogProcedureNode]] (EXPLAIN commits nothing). Each returns one
    * (version, op, n_segments) summary row. Key lists are comma-separated;
    * MERGE set lists are semicolon-separated `col = sqlExpr` pairs whose
    * expressions see base columns by name and source columns as
    * `src_<name>` ([[graft.operators.Ingest.mergeRows]]'s contract). */
  private def writeProcedures: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] = {
    import org.apache.spark.sql.functions.expr
    def csv(s: String): Seq[String] = s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    def setMap(s: String): Map[String, org.apache.spark.sql.Column] =
      s.split(";").map(_.trim).filter(_.nonEmpty).map { kv =>
        val i = kv.indexOf('=')
        require(i > 0, s"bad SET pair '$kv' — expected 'col = sqlExpr'")
        kv.substring(0, i).trim -> expr(kv.substring(i + 1).trim)
      }.toMap
    Seq(
      (FunctionIdentifier("graft_txlog_upsert"),
        info("graft_txlog_upsert",
          "graft_txlog_upsert(path, sourceSql, keyCsv) — copy-on-write upsert of the " +
            "source query's rows; returns (version, op, n_segments)"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 3,
            s"graft_txlog_upsert expects (path, sourceSql, keyCsv), got ${exprs.length} args")
          val path = litStr(exprs(0), "path")
          val srcSql = litStr(exprs(1), "sourceSql")
          val keys = csv(litStr(exprs(2), "keyCsv"))
          require(keys.nonEmpty, "keyCsv must name at least one key column")
          TxLogProcedures.node("upsert")(sp => graft.io.TxLog.upsert(sp, path, sp.sql(srcSql), keys))
        }),
      (FunctionIdentifier("graft_txlog_merge"),
        info("graft_txlog_merge",
          "graft_txlog_merge(path, sourceSql, keyCsv, setList[, deleteCond[, insertUnmatched]])" +
            " — MERGE INTO; setList = 'col = expr; ...' (src_<name> = source cols)"),
        (exprs: Seq[Expression]) => {
          require(exprs.length >= 4 && exprs.length <= 6,
            s"graft_txlog_merge expects (path, sourceSql, keyCsv, setList[, deleteCond[, " +
              s"insertUnmatched]]), got ${exprs.length} args")
          val path = litStr(exprs(0), "path")
          val srcSql = litStr(exprs(1), "sourceSql")
          val keys = csv(litStr(exprs(2), "keyCsv"))
          require(keys.nonEmpty, "keyCsv must name at least one key column")
          val sets = setMap(litStr(exprs(3), "setList"))
          val delCond = if (exprs.length >= 5) {
            val s = litStr(exprs(4), "deleteCond"); if (s.trim.isEmpty) None else Some(expr(s))
          } else None
          val insertUnmatched =
            if (exprs.length == 6) litBool(exprs(5), "insertUnmatched") else true
          TxLogProcedures.node("merge")(sp =>
            graft.io.TxLog.merge(sp, path, sp.sql(srcSql), keys, sets, delCond, insertUnmatched))
        }),
      (FunctionIdentifier("graft_txlog_delete"),
        info("graft_txlog_delete",
          "graft_txlog_delete(path, condSql) — copy-on-write delete of matching rows"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 2,
            s"graft_txlog_delete expects (path, condSql), got ${exprs.length} args")
          val path = litStr(exprs(0), "path")
          val cond = litStr(exprs(1), "condSql")
          TxLogProcedures.node("delete")(sp => graft.io.TxLog.delete(sp, path, expr(cond)))
        }),
      (FunctionIdentifier("graft_txlog_delete_rows"),
        info("graft_txlog_delete_rows",
          "graft_txlog_delete_rows(path, condSql) — merge-on-read delete via a deletion vector"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 2,
            s"graft_txlog_delete_rows expects (path, condSql), got ${exprs.length} args")
          val path = litStr(exprs(0), "path")
          val cond = litStr(exprs(1), "condSql")
          TxLogProcedures.node("delete_rows")(sp => graft.io.TxLog.deleteRows(sp, path, expr(cond)))
        }),
      (FunctionIdentifier("graft_txlog_restore"),
        info("graft_txlog_restore",
          "graft_txlog_restore(path, version) — roll the table back to `version` as a new commit"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 2,
            s"graft_txlog_restore expects (path, version), got ${exprs.length} args")
          val path = litStr(exprs(0), "path")
          val v = litLong(exprs(1), "version")
          TxLogProcedures.node("restore")(sp => graft.io.TxLog.restore(sp, path, v))
        }),
      (FunctionIdentifier("graft_txlog_vacuum"),
        info("graft_txlog_vacuum",
          "graft_txlog_vacuum(path, retainVersions) — commit a retention floor and reclaim"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 2,
            s"graft_txlog_vacuum expects (path, retainVersions), got ${exprs.length} args")
          val path = litStr(exprs(0), "path")
          val retain = litLong(exprs(1), "retainVersions").toInt
          TxLogProcedures.node("vacuum")(sp => graft.io.TxLog.vacuum(sp, path, retain))
        }),
      (FunctionIdentifier("graft_txlog_optimize"),
        info("graft_txlog_optimize",
          "graft_txlog_optimize(path, colA, colB[, targetPartitions[, scoped]]) — Z-order " +
            "re-cluster; scoped=true rewrites only un-clustered segments"),
        (exprs: Seq[Expression]) => {
          require(exprs.length >= 3 && exprs.length <= 5,
            s"graft_txlog_optimize expects (path, colA, colB[, targetPartitions[, scoped]]), " +
              s"got ${exprs.length} args")
          val path = litStr(exprs(0), "path")
          val a = litStr(exprs(1), "colA")
          val b = litStr(exprs(2), "colB")
          val parts = if (exprs.length >= 4) litLong(exprs(3), "targetPartitions").toInt else 8
          val scoped = if (exprs.length == 5) litBool(exprs(4), "scoped") else false
          TxLogProcedures.node("optimize")(sp =>
            graft.io.TxLog.optimize(sp, path, a, b, parts, scoped))
        }),
      (FunctionIdentifier("graft_txlog_optimize_dims"),
        info("graft_txlog_optimize_dims",
          "graft_txlog_optimize_dims(path, colCsv[, targetPartitions[, scoped]]) — " +
            "re-cluster on 2-4 dims (Morton for two, Hilbert beyond)"),
        (exprs: Seq[Expression]) => {
          require(exprs.length >= 2 && exprs.length <= 4,
            s"graft_txlog_optimize_dims expects (path, colCsv[, targetPartitions[, " +
              s"scoped]]), got ${exprs.length} args")
          val path = litStr(exprs(0), "path")
          val cols = csv(litStr(exprs(1), "colCsv"))
          val parts = if (exprs.length >= 3) litLong(exprs(2), "targetPartitions").toInt else 8
          val scoped = if (exprs.length == 4) litBool(exprs(3), "scoped") else false
          TxLogProcedures.node("optimize_dims")(sp =>
            graft.io.TxLog.optimizeDims(sp, path, cols, parts, scoped))
        }),
      (FunctionIdentifier("graft_txlog_compact_small"),
        info("graft_txlog_compact_small",
          "graft_txlog_compact_small(path, smallBytes[, targetPartitions]) — size-tiered compaction"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 2 || exprs.length == 3,
            s"graft_txlog_compact_small expects (path, smallBytes[, targetPartitions]), " +
              s"got ${exprs.length} args")
          val path = litStr(exprs(0), "path")
          val small = litLong(exprs(1), "smallBytes")
          val parts = if (exprs.length == 3) litLong(exprs(2), "targetPartitions").toInt else 1
          TxLogProcedures.node("compact_small")(sp =>
            graft.io.TxLog.compactSmall(sp, path, small, parts))
        }),
      // ---- ref procedures: branches / write-audit-publish / tags /
      // CHECK constraints — the pure-SQL story for the ref tier
      (FunctionIdentifier("graft_txlog_branch"),
        info("graft_txlog_branch",
          "graft_txlog_branch(path, name[, fromVersion]) — fork a zero-copy branch " +
            "(write to it as '<path>#<name>'); returns (version, op, n_segments)"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 2 || exprs.length == 3,
            s"graft_txlog_branch expects (path, name[, fromVersion]), got ${exprs.length} args")
          val path = litStr(exprs(0), "path")
          val name = litStr(exprs(1), "name")
          val from = if (exprs.length == 3) litLong(exprs(2), "fromVersion") else -1L
          TxLogProcedures.node("branch")(sp =>
            graft.io.TxLog.createBranch(sp, path, name, from))
        }),
      (FunctionIdentifier("graft_txlog_publish"),
        info("graft_txlog_publish",
          "graft_txlog_publish(path, name[, keyCsv]) — publish a branch back to the " +
            "root in one atomic manifest-only commit; returns (version, op, n_segments)"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 2 || exprs.length == 3,
            s"graft_txlog_publish expects (path, name[, keyCsv]), got ${exprs.length} args")
          val path = litStr(exprs(0), "path")
          val name = litStr(exprs(1), "name")
          val keys = if (exprs.length == 3) csv(litStr(exprs(2), "keyCsv")) else Nil
          TxLogProcedures.node("publish")(sp =>
            graft.io.TxLog.publishBranch(sp, path, name, keys))
        }),
      (FunctionIdentifier("graft_txlog_tag"),
        info("graft_txlog_tag",
          "graft_txlog_tag(path, name[, version]) — tag a version immutably (vacuum " +
            "protects it forever); returns (tag, version)"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 2 || exprs.length == 3,
            s"graft_txlog_tag expects (path, name[, version]), got ${exprs.length} args")
          val path = litStr(exprs(0), "path")
          val name = litStr(exprs(1), "name")
          val v = if (exprs.length == 3) litLong(exprs(2), "version") else -1L
          TxLogProcedures.rowsNode("tag", TxLogProcedures.tagSchema) { sp =>
            val tagged = graft.io.TxLog.tagVersion(path, name, v)
            Seq(org.apache.spark.sql.Row(name, tagged))
          }
        }),
      (FunctionIdentifier("graft_txlog_constraint_add"),
        info("graft_txlog_constraint_add",
          "graft_txlog_constraint_add(path, name, checkSql) — add a CHECK constraint " +
            "(validates existing rows; every later write enforces in-scan); returns " +
            "(version, op, n_segments)"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 3,
            s"graft_txlog_constraint_add expects (path, name, checkSql), got ${exprs.length} args")
          val path = litStr(exprs(0), "path")
          val name = litStr(exprs(1), "name")
          val check = litStr(exprs(2), "checkSql")
          TxLogProcedures.node("constraint_add")(sp =>
            graft.io.TxLog.addConstraint(sp, path, name, check))
        }),
      (FunctionIdentifier("graft_txlog_constraint_drop"),
        info("graft_txlog_constraint_drop",
          "graft_txlog_constraint_drop(path, name) — drop a CHECK constraint; " +
            "returns (version, op, n_segments)"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 2,
            s"graft_txlog_constraint_drop expects (path, name), got ${exprs.length} args")
          val path = litStr(exprs(0), "path")
          val name = litStr(exprs(1), "name")
          TxLogProcedures.node("constraint_drop")(sp =>
            graft.io.TxLog.dropConstraint(sp, path, name))
        }),
      (FunctionIdentifier("graft_txlog_publish_atomic"),
        info("graft_txlog_publish_atomic",
          "graft_txlog_publish_atomic(coordPath, stagedCsv) — atomic multi-table " +
            "publish of 'table#branch' pairs (one coordinator claim is the commit " +
            "point; crashes roll forward); returns (txn_id)"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 2,
            s"graft_txlog_publish_atomic expects (coordPath, stagedCsv), got ${exprs.length} args")
          val coord = litStr(exprs(0), "coordPath")
          val staged = csv(litStr(exprs(1), "stagedCsv")).map { tok =>
            val i = tok.lastIndexOf('#')
            require(i > 0, s"bad staged token '$tok' — expected 'table#branch'")
            tok.substring(0, i) -> tok.substring(i + 1)
          }
          TxLogProcedures.rowsNode("publish_atomic", TxLogProcedures.txnSchema)(sp =>
            Seq(org.apache.spark.sql.Row(
              graft.io.TxLog.publishAtomic(sp, coord, staged))))
        }),
      (FunctionIdentifier("graft_txlog_recover_atomic"),
        info("graft_txlog_recover_atomic",
          "graft_txlog_recover_atomic(coordPath) — roll forward every incomplete " +
            "atomic transaction (the all-or-nothing read barrier); returns one " +
            "(txn_id) row per transaction driven"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 1,
            s"graft_txlog_recover_atomic expects (coordPath), got ${exprs.length} args")
          val coord = litStr(exprs(0), "coordPath")
          TxLogProcedures.rowsNode("recover_atomic", TxLogProcedures.txnSchema)(sp =>
            graft.io.TxLog.recoverAtomic(sp, coord)
              .map(id => org.apache.spark.sql.Row(id)))
        }),
      // ---- follower procedures (verdict r10 #6): the pure-SQL story for
      // index-follows-table — each advances the followed state one atomic
      // keyed commit and returns (advanced, consumed_version, action)
      (FunctionIdentifier("graft_txlog_follow_hnsw"),
        info("graft_txlog_follow_hnsw",
          "graft_txlog_follow_hnsw(src, dst, consumerId, idCol, vecCol[, shards]) — " +
            "advance the exactly-once HNSW index follower; returns (advanced, " +
            "consumed_version, action)"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 5 || exprs.length == 6,
            s"graft_txlog_follow_hnsw expects (src, dst, consumerId, idCol, vecCol" +
              s"[, shards]), got ${exprs.length} args")
          val Seq(src, dst, cid, idc, vecc) = exprs.take(5).zip(
            Seq("src", "dst", "consumerId", "idCol", "vecCol")).map((litStr _).tupled)
          val cfg = graft.ext.GraphAnn.HnswConfig(shards =
            if (exprs.length == 6) litLong(exprs(5), "shards").toInt else 4)
          TxLogProcedures.rowsNode("follow_hnsw", TxLogProcedures.followSchema)(sp =>
            TxLogProcedures.followRows(dst, () => graft.ext.IndexFollower.hnswMark(dst, cid))(
              graft.ext.IndexFollower.followIndex(sp, src, dst, cid, idc, vecc, cfg)))
        }),
      (FunctionIdentifier("graft_txlog_follow_minhash"),
        info("graft_txlog_follow_minhash",
          "graft_txlog_follow_minhash(src, dst, consumerId, idCol, textCol) — advance " +
            "the exactly-once MinHash index follower; returns (advanced, " +
            "consumed_version, action)"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 5,
            s"graft_txlog_follow_minhash expects (src, dst, consumerId, idCol, textCol), " +
              s"got ${exprs.length} args")
          val Seq(src, dst, cid, idc, txtc) = exprs.zip(
            Seq("src", "dst", "consumerId", "idCol", "textCol")).map((litStr _).tupled)
          TxLogProcedures.rowsNode("follow_minhash", TxLogProcedures.followSchema)(sp =>
            TxLogProcedures.followRows(dst, () => graft.ext.IndexFollower.minhashMark(dst, cid))(
              graft.ext.IndexFollower.followMinhashIndex(sp, src, dst, cid, idc, txtc)))
        }),
      (FunctionIdentifier("graft_txlog_follow_ivfpq"),
        info("graft_txlog_follow_ivfpq",
          "graft_txlog_follow_ivfpq(src, dst, consumerId, idCol, vecCol[, nlist]) — " +
            "advance the exactly-once IVF-PQ index follower; returns (advanced, " +
            "consumed_version, action)"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 5 || exprs.length == 6,
            s"graft_txlog_follow_ivfpq expects (src, dst, consumerId, idCol, vecCol" +
              s"[, nlist]), got ${exprs.length} args")
          val Seq(src, dst, cid, idc, vecc) = exprs.take(5).zip(
            Seq("src", "dst", "consumerId", "idCol", "vecCol")).map((litStr _).tupled)
          val ivfCfg = graft.ext.Similarity.IvfConfig(nlist =
            if (exprs.length == 6) litLong(exprs(5), "nlist").toInt else 32)
          TxLogProcedures.rowsNode("follow_ivfpq", TxLogProcedures.followSchema)(sp =>
            TxLogProcedures.followRows(dst, () => graft.ext.IndexFollower.ivfPqMark(dst, cid))(
              graft.ext.IndexFollower.followIvfPq(sp, src, dst, cid, idc, vecc, ivfCfg)))
        }),
      (FunctionIdentifier("graft_txlog_replicate"),
        info("graft_txlog_replicate",
          "graft_txlog_replicate(src, dst, keyCsv, consumerId[, maxVersionsPerTrigger" +
            "[, rebootstrapOnFloorOverrun[, whereSql]]]) — drain the source's change " +
            "feed into an exactly-once CDC replica (optionally predicate-scoped); " +
            "returns (batches_committed, replica_version)"),
        (exprs: Seq[Expression]) => {
          require(exprs.length >= 4 && exprs.length <= 7,
            s"graft_txlog_replicate expects (src, dst, keyCsv, consumerId" +
              s"[, maxVersionsPerTrigger[, rebootstrapOnFloorOverrun[, whereSql]]]), " +
              s"got ${exprs.length} args")
          val Seq(src, dst, keyCsv, cid) = exprs.take(4).zip(
            Seq("src", "dst", "keyCsv", "consumerId")).map((litStr _).tupled)
          val keys = keyCsv.split(",").map(_.trim).filter(_.nonEmpty).toSeq
          require(keys.nonEmpty, "graft_txlog_replicate: keyCsv must name at least one column")
          val maxV =
            if (exprs.length >= 5) litLong(exprs(4), "maxVersionsPerTrigger").toInt
            else Int.MaxValue
          val reboot =
            exprs.length >= 6 && litBool(exprs(5), "rebootstrapOnFloorOverrun")
          val whereCol =
            if (exprs.length == 7)
              Some(org.apache.spark.sql.functions.expr(litStr(exprs(6), "whereSql")))
            else None
          TxLogProcedures.rowsNode("replicate", TxLogProcedures.replicateSchema) { sp =>
            val n = graft.io.TxLog.replicate(sp, src, dst, keys, cid, maxV, reboot,
              whereCol)
            Seq(org.apache.spark.sql.Row(n.toLong, graft.io.TxLog.latest(dst).version))
          }
        }))
  }

  /** Register the table functions on an EXISTING session (the gate/spec
    * path — sessions built without `spark.sql.extensions` config). */
  def registerTableFunctions(spark: org.apache.spark.sql.SparkSession): Unit =
    tableRegistrations.foreach { case (id, inf, builder) =>
      spark.sessionState.tableFunctionRegistry.registerFunction(id, inf, builder)
    }

  /** (identifier, info, builder) triples for every SQL-exposed function. */
  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, FunctionBuilder)] = Seq(
    (FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two float vectors"),
      arity(2, "vec_dot")(e => DotProduct(e(0), e(1)))),
    (FunctionIdentifier("g711_expand"),
      info("g711_expand",
        "g711_expand(codes, law) - expand G.711 'mulaw'/'alaw' code bytes to linear int samples"),
      arity(2, "g711_expand")(e => G711Expand(e(0), litStr(e(1), "law") match {
        case "mulaw" => true
        case "alaw" => false
        case other => throw new IllegalArgumentException(
          s"law must be 'mulaw' or 'alaw', got '$other'")
      }))),
    (FunctionIdentifier("vec_cosine"),
      info("vec_cosine", "vec_cosine(a, b) - cosine similarity in [-1, 1]"),
      arity(2, "vec_cosine")(e => CosineSimilarity(e(0), e(1)))),
    (FunctionIdentifier("vec_l2sq"),
      info("vec_l2sq", "vec_l2sq(a, b) - squared euclidean distance"),
      arity(2, "vec_l2sq")(e => SquaredL2Distance(e(0), e(1)))),
    (FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens, seed) - 64-bit simhash of a token array"),
      arity(2, "simhash64")(e => SimHash64(e(0), litLong(e(1), "seed")))),
    (FunctionIdentifier("sorted_intersect_count"),
      info("sorted_intersect_count",
        "sorted_intersect_count(a, b) - intersection size of two sorted long arrays"),
      arity(2, "sorted_intersect_count")(e => SortedIntersectCount(e(0), e(1)))),
    (FunctionIdentifier("frequent_items"),
      info("frequent_items",
        "frequent_items(item, k) - Misra-Gries heavy-hitters sketch (aggregate)"),
      arity(2, "frequent_items")(e =>
        FrequentItems(e(0), litLong(e(1), "k").toInt).toAggregateExpression())),
    (FunctionIdentifier("frequent_items_weighted"),
      info("frequent_items_weighted",
        "frequent_items_weighted(item, weight, k) - weighted Misra-Gries heavy " +
          "hitters: items with total weight > W/(k+1) guaranteed present (aggregate)"),
      arity(3, "frequent_items_weighted")(e =>
        FrequentItemsWeighted(e(0), e(1), litLong(e(2), "k").toInt).toAggregateExpression())),
    (FunctionIdentifier("bottom_k_by_rank"),
      info("bottom_k_by_rank",
        "bottom_k_by_rank(rank, payload, k) - the k payload values with the " +
          "smallest rank; top-k per group without a window sort (aggregate)"),
      arity(3, "bottom_k_by_rank")(e =>
        BottomKByRank(e(0), e(1), litLong(e(2), "k").toInt).toAggregateExpression())),
    (FunctionIdentifier("bloom_filter_agg"),
      info("bloom_filter_agg",
        "bloom_filter_agg(key, expectedItems, fpp) - mergeable Bloom filter over " +
          "long keys; fpp is a decimal rate (0.01) or an integer percent " +
          "(aggregate, returns binary)"),
      arity(3, "bloom_filter_agg")(e => {
        val (m, k) = BloomBuffer.shapeFor(litLong(e(1), "expectedItems"), litFpp(e(2)))
        BloomFilterAgg(e(0), m, k).toAggregateExpression()
      })),
    (FunctionIdentifier("count_min_agg"),
      info("count_min_agg",
        "count_min_agg(item, depth, width) - mergeable Count-Min frequency " +
          "sketch over strings (aggregate, returns binary); estimates are " +
          ">= true count, <= true + (e/width)*N w.p. 1-e^-depth"),
      arity(3, "count_min_agg")(e =>
        CountMinAgg(e(0), litLong(e(1), "depth").toInt, litLong(e(2), "width").toInt)
          .toAggregateExpression())),
    (FunctionIdentifier("bitmap_agg"),
      info("bitmap_agg",
        "bitmap_agg(key) - EXACT membership bitmap over long keys (Roaring-" +
          "style chunked containers; aggregate, returns binary); query with " +
          "bitmap_count / bitmap_and_count / bitmap_or_count / bitmap_andnot_count"),
      arity(1, "bitmap_agg")(e => BitmapAgg(e(0)).toAggregateExpression())),
    (FunctionIdentifier("bitmap_count"),
      info("bitmap_count", "bitmap_count(bitmap) - exact cardinality of a bitmap_agg result"),
      arity(1, "bitmap_count")(e => BitmapCount(e(0)))),
    (FunctionIdentifier("bitmap_and_count"),
      info("bitmap_and_count", "bitmap_and_count(a, b) - exact |A INTERSECT B| of two bitmaps"),
      arity(2, "bitmap_and_count")(e => BitmapAndCount(e(0), e(1)))),
    (FunctionIdentifier("bitmap_or_count"),
      info("bitmap_or_count", "bitmap_or_count(a, b) - exact |A UNION B| of two bitmaps"),
      arity(2, "bitmap_or_count")(e => BitmapOrCount(e(0), e(1)))),
    (FunctionIdentifier("bitmap_andnot_count"),
      info("bitmap_andnot_count", "bitmap_andnot_count(a, b) - exact |A EXCEPT B| of two bitmaps"),
      arity(2, "bitmap_andnot_count")(e => BitmapAndNotCount(e(0), e(1)))),
    (FunctionIdentifier("theta_sketch_agg"),
      info("theta_sketch_agg",
        "theta_sketch_agg(key, k) - mergeable KMV/theta distinct sketch over " +
          "long keys (aggregate, returns binary); exact below k, supports " +
          "intersection/union estimates between sketches"),
      arity(2, "theta_sketch_agg")(e =>
        ThetaSketchAgg(e(0), litLong(e(1), "k").toInt).toAggregateExpression())),
    (FunctionIdentifier("ddsketch_agg"),
      info("ddsketch_agg",
        "ddsketch_agg(value, alpha, maxBins) - mergeable relative-error " +
          "quantile sketch over doubles (aggregate, returns binary); any " +
          "quantile within alpha relative error"),
      arity(3, "ddsketch_agg")(e =>
        DDSketchAgg(e(0), litFrac(e(1), "alpha"), litLong(e(2), "maxBins").toInt)
          .toAggregateExpression())),
    (FunctionIdentifier("dd_quantile"),
      info("dd_quantile",
        "dd_quantile(sketch, q) - quantile q in [0,1] of a serialized DDSketch"),
      arity(2, "dd_quantile")(e => DdQuantile(e(0), litFrac(e(1), "q")))),
    (FunctionIdentifier("jaro_similarity"),
      info("jaro_similarity",
        "jaro_similarity(a, b) - Jaro string similarity in [0,1]; empty side scores 0"),
      arity(2, "jaro_similarity")(e => JaroSimilarity(e(0), e(1)))),
    (FunctionIdentifier("jaro_winkler_similarity"),
      info("jaro_winkler_similarity",
        "jaro_winkler_similarity(a, b) - Jaro-Winkler similarity (prefix-boosted " +
          "above 0.7, scaling 0.1, prefix <= 4)"),
      arity(2, "jaro_winkler_similarity")(e => JaroWinklerSimilarity(e(0), e(1)))),
  )
}
