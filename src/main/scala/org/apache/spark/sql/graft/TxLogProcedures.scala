package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Statistics}
import org.apache.spark.sql.classic.SparkSession
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/**
 * The TxLog WRITE surface for pure SQL (verdict r9 #6) — CALL-style
 * procedures beside the read TVFs (`graft_txlog`/`graft_txlog_changes`):
 *
 *   SELECT * FROM graft_txlog_upsert('/path', 'SELECT ...', 'k')
 *   SELECT * FROM graft_txlog_merge('/path', 'SELECT ...', 'k', 'v = src_v')
 *   SELECT * FROM graft_txlog_delete('/path', 'k % 7 = 0')
 *   SELECT * FROM graft_txlog_restore('/path', 3)
 *   SELECT * FROM graft_txlog_vacuum('/path', 5)
 *   SELECT * FROM graft_txlog_optimize('/path', 'a', 'b', 8, true)
 *
 * Each returns one summary row (version, op, n_segments). The builder
 * resolves LITERAL arguments eagerly (loud messages) but the WRITE runs at
 * EXECUTION time through a proper command node — `EXPLAIN` shows the plan
 * without committing anything, exactly the RunnableCommand discipline; the
 * exec memoizes its run so repeated actions on ONE Dataset commit once
 * (each new `spark.sql(...)` invocation is intentionally a new commit).
 */
case class TxLogProcedureNode(procName: String, outAttrs: Seq[Attribute],
    run: () => Seq[Row]) extends LeafNode {
  override def output: Seq[Attribute] = outAttrs
  override def computeStats(): Statistics = Statistics(sizeInBytes = 128L)

  /** The write runs ONCE per sql() invocation: the memo lives inside the
    * `run` CLOSURE (built once by [[TxLogProcedures.node]]), which every
    * clone of this node shares — each QueryExecution clones the analyzed
    * plan, so hanging the memo on the node itself would double-apply the
    * commit when count() and collect() hit the same Dataset. */
  def resultRows: Seq[InternalRow] = {
    val conv = CatalystTypeConverters.createToCatalystConverter(
      StructType(outAttrs.map(a => StructField(a.name, a.dataType, a.nullable))))
    run().map(r => conv(r).asInstanceOf[InternalRow])
  }
}

object TxLogProcedureStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: TxLogProcedureNode => TxLogProcedureExec(n) :: Nil
    case _ => Nil
  }
}

case class TxLogProcedureExec(node: TxLogProcedureNode) extends LeafExecNode {
  override def output: Seq[Attribute] = node.outAttrs
  override def nodeName: String = s"TxLogProcedure(${node.procName})"

  override protected def doExecute(): RDD[InternalRow] = {
    // downstream operators expect UnsafeRow — project before shipping
    val proj = UnsafeProjection.create(node.outAttrs.map(_.dataType).toArray)
    val rows = node.resultRows.map(r => proj(r).copy().asInstanceOf[InternalRow])
    session.sparkContext.parallelize(rows, 1)
  }
}

object TxLogProcedures {

  /** Thread-safe run-once cell (scala lazy val synchronization). */
  private final class Once(compute: () => Seq[Row]) {
    lazy val rows: Seq[Row] = compute()
  }

  private val summarySchema = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("op", StringType, nullable = false)(),
    AttributeReference("n_segments", LongType, nullable = false)())

  /** Idempotently make the planner able to see [[TxLogProcedureStrategy]]
    * on sessions built without `spark.sql.extensions`. */
  def ensureStrategy(spark: SparkSession): Unit = {
    val known = spark.sessionState.planner.strategies.exists(_ eq TxLogProcedureStrategy) ||
      spark.experimental.extraStrategies.exists(_ eq TxLogProcedureStrategy)
    if (!known)
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TxLogProcedureStrategy
  }

  /** Build a procedure node with an arbitrary one-row result schema —
    * the general CALL shape ([[node]] specializes it to the snapshot
    * summary; the follower procedures return (advanced, consumed_version,
    * action)). */
  def rowsNode(procName: String, attrs: Seq[Attribute])(
      op: SparkSession => Seq[Row]): LogicalPlan = {
    val spark = SparkSession.active
    ensureStrategy(spark)
    // the once-guard rides the closure, shared by every clone of the node
    val once = new Once(() => op(spark))
    TxLogProcedureNode(procName, attrs.map(_.newInstance()), () => once.rows)
  }

  /** The (advanced, consumed_version, action) schema of the follower
    * procedures. */
  val followSchema = Seq(
    AttributeReference("advanced", BooleanType, nullable = false)(),
    AttributeReference("consumed_version", LongType, nullable = false)(),
    AttributeReference("action", StringType, nullable = false)())

  /** The (batches_committed, replica_version) schema of
    * `graft_txlog_replicate`. */
  val replicateSchema = Seq(
    AttributeReference("batches_committed", LongType, nullable = false)(),
    AttributeReference("replica_version", LongType, nullable = false)())

  /** The (tag, version) schema of `graft_txlog_tag`. */
  val tagSchema = Seq(
    AttributeReference("tag", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())

  /** The (txn_id) schema of the atomic-publish procedures. */
  val txnSchema = Seq(
    AttributeReference("txn_id", StringType, nullable = false)())

  /** Build a procedure node that runs `op` at execution time and returns
    * its snapshot summary row. */
  def node(procName: String)(op: SparkSession => graft.io.TxSnapshot): LogicalPlan =
    rowsNode(procName, summarySchema) { spark =>
      val snap = op(spark)
      Seq(Row(snap.version, snap.op, snap.segments.size.toLong))
    }

  /** Shared body of the three follower procedures: run `follow`, then
    * derive (advanced, consumed_version, action) from the state table's
    * own high-water mark. */
  def followRows(dst: String, mark: () => Long)(follow: => Boolean): Seq[Row] = {
    val prior = if (graft.io.TxLog.exists(dst)) mark() else -1L
    val advanced = follow
    val action =
      if (!advanced) "caught_up" else if (prior < 0) "bootstrap" else "advance"
    Seq(Row(advanced, mark(), action))
  }
}
