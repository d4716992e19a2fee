package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, AttributeReference, AttributeSet, BindReferences, BoundReference, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

/**
 * Native point-in-time (AS-OF) join as a first-class Catalyst operator —
 * the whole-operator rung of the extension ladder: a custom [[LogicalPlan]]
 * node, a planner [[SparkStrategy]], and a [[SparkPlan]] that executes the
 * join as ONE co-partitioned, co-sorted per-partition merge pass.
 *
 * The composed implementation (graft.operators.AsOfJoin.asOf — union +
 * running-window fill) already hits the right COST shape (one shuffle, no
 * fan-out). What composition cannot express is the physical contract this
 * node states declaratively:
 *
 *  - `requiredChildDistribution` = ClusteredDistribution(keys) on BOTH
 *    children → EnsureRequirements co-partitions the two sides exactly like
 *    a sort-merge join (and elides the shuffle entirely when a side is
 *    already hash-partitioned on the key — the union trick always pays one
 *    full-width shuffle of BOTH sides through one exchange);
 *  - `requiredChildOrdering` = (keys, time) on both children → the match is
 *    a forward-only streaming merge with O(1) state (the single latest
 *    right row), no window buffer, no struct-packing of carried values;
 *  - left rows stream straight through: the left side's columns are never
 *    widened with the union's null-padded right columns, so the bytes that
 *    cross the wire are each side's own payload, nothing more.
 *
 * Semantics match [[graft.operators.AsOfJoin.asOf]] exactly (latest right
 * row with right.time <= left.time per key, equal-timestamp inclusive,
 * optional tolerance nulling stale matches, null left time → no match,
 * null keys group together like the window variant) — AsOfNativeSpec pins
 * bit-equality against the composed operator and the same DuckDB ASOF
 * oracle checks q146.
 *
 * Reference anchor: the reference engine has no as-of join at all
 * (SURVEY §2.2 absence category "joins beyond semi"); this is the 100 TB
 * enrichment-join design the blueprint calls for.
 */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    rightValues: Seq[Attribute],
    tolerance: Option[Long],
    outAttrs: Seq[Attribute])
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ outAttrs

  // the asof_<v> columns exist only here — tell the analyzer they are not
  // missing inputs, and downstream rules that they originate at this node
  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)

  override def maxRows: Option[Long] = left.maxRows

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] onto [[AsOfJoinExec]]; injected via
  * [[GraftExtensions]] (`injectPlannerStrategy`) and, for sessions built
  * without the extension, added idempotently to
  * `spark.experimental.extraStrategies` by [[AsOfJoinPlanBuilder.build]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, rv, tol, out) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, rv, tol, out) :: Nil
    case _ => Nil
  }
}

/**
 * Per-partition streaming merge. Both children arrive hash-clustered on the
 * join key and sorted by (key, time asc) — the exec walks the two sorted
 * iterators once, holding exactly one candidate right row (key, time,
 * value projection) at a time. Cost per partition is
 * O(|left| + |right|) with O(1) state — there is no pairwise candidate
 * generation anywhere, which is what makes the operator safe at 100 TB
 * where a range-join formulation explodes quadratically.
 */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    rightValues: Seq[Attribute],
    tolerance: Option[Long],
    outAttrs: Seq[Attribute])
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ outAttrs

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  // both sides cluster on the key: EnsureRequirements co-partitions them
  // (or skips the exchange for a side already partitioned compatibly)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  // left rows pass through in order, so both properties survive the join —
  // a downstream groupBy/window on the same key re-uses the exchange+sort
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending)

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val lKeyBound = leftKeys.map(a => BindReferences.bindReference(a: Expression, lOut))
    val rKeyBound = rightKeys.map(a => BindReferences.bindReference(a: Expression, rOut))
    val rValBound = rightValues.map(a => BindReferences.bindReference(a: Expression, rOut))
    val lTimeOrd = lOut.indexWhere(_.exprId == leftTime.exprId)
    val rTimeOrd = rOut.indexWhere(_.exprId == rightTime.exprId)
    val keyTypes = leftKeys.map(_.dataType)
    val nValues = rightValues.length
    val joinedRefs = (lOut ++ rightValues).zipWithIndex.map {
      case (a, i) => BoundReference(i, a.dataType, nullable = true)
    }
    val tol = tolerance

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyBound)
      val rKeyProj = UnsafeProjection.create(rKeyBound)
      val rValProj = UnsafeProjection.create(rValBound)
      val outProj = UnsafeProjection.create(joinedRefs)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val nullVals = new GenericInternalRow(nValues)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // the single candidate: latest right row consumed so far
        private var mKey: InternalRow = _
        private var mTime: Long = 0L
        private var mVals: InternalRow = _
        private var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTimeNull = l.isNullAt(lTimeOrd)
          val lTime = if (lTimeNull) Long.MinValue else l.getLong(lTimeOrd)
          // consume right rows that can no longer beat this left row's
          // position: strictly-smaller keys, or same key at time <= lTime.
          // A null left time sorts first within its key, so consuming only
          // strictly-smaller keys for it keeps the walk monotone.
          var advance = rHead != null
          while (advance) {
            val c = keyOrd.compare(rKeyProj(rHead), lKey)
            if (c < 0 || (c == 0 && !lTimeNull && rHead.getLong(rTimeOrd) <= lTime)) {
              mKey = rKeyProj(rHead).copy()
              mTime = rHead.getLong(rTimeOrd)
              mVals = rValProj(rHead).copy()
              rHead = if (rIter.hasNext) rIter.next() else null
              advance = rHead != null
            } else advance = false
          }
          val matched = !lTimeNull && mKey != null && keyOrd.compare(mKey, lKey) == 0 &&
            (tol.isEmpty || lTime - mTime <= tol.get)
          numOutputRows += 1
          outProj(joined(l, if (matched) mVals else nullVals))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level builder: resolves columns by name, gives the right side
  * fresh expression ids (self-join safety), type-checks, and wraps the
  * logical node back into a DataFrame. */
object AsOfJoinPlanBuilder {

  /** Idempotently make sure the planner can see [[AsOfJoinStrategy]]. */
  private def ensureStrategy(spark: classic.SparkSession): Unit = {
    val known = spark.sessionState.planner.strategies.exists(_ eq AsOfJoinStrategy)
    if (!known) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
  }

  def build(
      left: DataFrame, leftTimeCol: String,
      right: DataFrame, rightTimeCol: String,
      keyCols: Seq[String], valueCols: Seq[String],
      tolerance: Option[Long]): DataFrame = {
    require(keyCols.nonEmpty, "as-of join needs at least one key column")
    require(valueCols.nonEmpty, "no right-side value columns requested")
    val spark = left.sparkSession.asInstanceOf[classic.SparkSession]
    ensureStrategy(spark)

    // fail fast with the real schema in the message, before Spark's own
    // resolution error (which would name only one side's miss)
    def checkCols(df: DataFrame, names: Seq[String], side: String): Unit = {
      val have = df.columns.toSet
      val missing = names.filterNot(have)
      if (missing.nonEmpty) throw new IllegalArgumentException(
        s"$side side has no column ${missing.map(n => s"'$n'").mkString(", ")} " +
          s"(columns: ${df.columns.mkString(", ")})")
    }
    checkCols(left, keyCols :+ leftTimeCol, "left")
    checkCols(right, (keyCols :+ rightTimeCol) ++ valueCols, "right")

    // right side: drop unmatched-able rows, keep only what the join reads
    // (keys + time + values) so column pruning is explicit in the plan
    val rightPrep = right.filter(col(rightTimeCol).isNotNull)
      .select((keyCols :+ rightTimeCol).map(col) ++ valueCols.map(col): _*)

    val lPlan = left.queryExecution.analyzed
    val rAnalyzed = rightPrep.queryExecution.analyzed
    // fresh exprIds on the right side: a self-as-of (events vs its own
    // purchases — the q146 shape) would otherwise carry duplicate attribute
    // ids into one binary node, which the generic analyzer only
    // deduplicates for built-in Join nodes
    val aliases = rAnalyzed.output.map(a => Alias(a, a.name)())
    val rPlan = Project(aliases, rAnalyzed)
    val rOutput = aliases.map(_.toAttribute)

    def attrOf(out: Seq[Attribute], name: String, side: String): Attribute =
      out.filter(_.name == name) match {
        case Seq(a) => a
        case Seq() => throw new IllegalArgumentException(
          s"$side side has no column '$name' (columns: ${out.map(_.name).mkString(", ")})")
        case many => throw new IllegalArgumentException(
          s"$side side has ${many.size} columns named '$name' — disambiguate first")
      }

    val lKeys = keyCols.map(attrOf(lPlan.output, _, "left"))
    val rKeys = keyCols.map(attrOf(rOutput, _, "right"))
    val lTime = attrOf(lPlan.output, leftTimeCol, "left")
    val rTime = attrOf(rOutput, rightTimeCol, "right")
    val rVals = valueCols.map(attrOf(rOutput, _, "right"))

    lKeys.zip(rKeys).foreach { case (la, ra) =>
      require(la.dataType == ra.dataType,
        s"key '${la.name}' differs in type: left ${la.dataType} vs right ${ra.dataType}")
    }
    require(lTime.dataType == LongType && rTime.dataType == LongType,
      s"as-of time columns must be LongType epochs (cast first); got " +
        s"left ${lTime.dataType}, right ${rTime.dataType}")

    val outAttrs = valueCols.map { vc =>
      AttributeReference(s"asof_$vc", attrOf(rOutput, vc, "right").dataType,
        nullable = true)()
    }
    val node = AsOfJoinNode(lPlan, rPlan, lKeys, rKeys, lTime, rTime, rVals,
      tolerance, outAttrs)
    classic.Dataset.ofRows(spark, node)
  }
}
