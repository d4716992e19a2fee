package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Point-in-time (AS-OF) join: each left row picks up the most recent right
 * row with the same key and right.time <= left.time — the standard
 * enrichment for event streams against slowly-changing state.
 *
 * Spark has no built-in as-of join; the preference ladder says compose
 * built-ins before reaching for a custom SparkPlan, and the classic
 * union + sorted-window fill does exactly that:
 *
 *   1. tag both sides, union them on (key, time);
 *   2. one hash-partition by key + sort by (time, side) — right rows sort
 *      before left rows at equal timestamps, making the match inclusive;
 *   3. `last(col, ignoreNulls)` over the running frame carries each right
 *      value forward to every following left row;
 *   4. keep the left rows.
 *
 * ONE shuffle, no join fan-out, no per-key driver work — the same cost
 * shape as a groupBy, which is what makes it survive 100 TB (a naive
 * `left.time >= right.time` range join explodes quadratically). Skewed
 * keys behave like any skewed aggregation (AQE/salting apply).
 */
object AsOfJoin {

  /**
   * @param valueCols right-side columns to carry (each emitted as
   *                  `asof_<name>`, null when no right row precedes)
   * @param tolerance optional max allowed left.time - right.time, in the
   *                  time columns' own units (e.g. nanoseconds for long
   *                  epochs): a match older than this is nulled out, like
   *                  pandas.merge_asof's tolerance. Implemented as a
   *                  post-fill filter — the plan stays one shuffle.
   */
  def asOf(
      left: DataFrame, leftTime: String,
      right: DataFrame, rightTime: String,
      keyCols: Seq[String],
      valueCols: Seq[String],
      tolerance: Option[Long] = None): DataFrame = {
    require(keyCols.nonEmpty, "as-of join needs at least one key column")
    require(valueCols.nonEmpty, "no right-side value columns requested")

    val leftCols = left.columns.toSeq
    val sideCol = "__graft_is_left"
    val timeCol = "__graft_t"
    val packCol = "__graft_pack"

    // the right row's time AND values travel as ONE struct, so the window
    // fill picks the latest right ROW atomically — filling each value
    // column independently with last(ignoreNulls) would skip over a right
    // row whose value is NULL and resurrect an older (possibly
    // out-of-tolerance) value, which is not as-of semantics: the match is
    // the latest preceding ROW, null value and all (pandas merge_asof
    // agrees, as does the ASOF-join oracle)
    val taggedRight = right.select(
      keyCols.map(col) ++ Seq(
        col(rightTime).as(timeCol), lit(0).as(sideCol),
        struct(col(rightTime).as("t") +: valueCols.map(vc => col(vc).as(vc)): _*)
          .as(packCol)): _*)

    val taggedLeft = left
      .withColumn(timeCol, col(leftTime))
      .withColumn(sideCol, lit(1))

    // allowMissingColumns: the left side's missing pack slot becomes null
    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)

    // right (0) sorts before left (1) at equal time -> inclusive match
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(timeCol).asc, col(sideCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = unioned
      .withColumn(packCol, last(col(packCol), ignoreNulls = true).over(w))

    val stale = tolerance match {
      case None => col(packCol).isNull
      case Some(tol) =>
        col(packCol).isNull || (col(timeCol) - col(packCol)("t")) > tol
    }

    valueCols.foldLeft(filled.filter(col(sideCol) === 1))((df, vc) =>
        df.withColumn(s"asof_$vc", when(stale, lit(null)).otherwise(col(packCol)(vc))))
      .select((leftCols ++ valueCols.map(vc => s"asof_$vc")).map(col): _*)
  }

  /**
   * Skew-resistant as-of join, same semantics as [[asOf]] for NUMERIC
   * non-null time columns (e.g. epoch nanos).
   *
   * [[asOf]] windows by key alone, so one hot key (a user holding half the
   * events — routine in clickstream data) becomes one straggler partition
   * that a 1000-executor cluster waits on. This variant salts the window
   * with a TIME BUCKET, the as-of analogue of skew-join salting:
   *
   *   1. bucket every row by `floor((t - min) / width)` (width from one tiny
   *      min/max agg), window-fill per (key, bucket) — the hot key's sort is
   *      now spread over `buckets` partitions;
   *   2. reduce each (key, bucket) to its LAST right-side pack (a map-side-
   *      combining `max_by`), run the carry-forward over that tiny per-key
   *      bucket spine (≤ `buckets` rows per key, skew-proof by construction);
   *   3. join the strictly-earlier-bucket carry back on (key, bucket) —
   *      broadcast-sized — and take `coalesce(local fill, carry)`.
   *
   * Right rows in earlier buckets are strictly earlier in time, so
   * local-fill-else-carry reproduces exactly the latest-preceding-row
   * semantics, equal-timestamp inclusivity and tolerance included.
   */
  def asOfBucketed(
      left: DataFrame, leftTime: String,
      right: DataFrame, rightTime: String,
      keyCols: Seq[String],
      valueCols: Seq[String],
      tolerance: Option[Long] = None,
      buckets: Int = 64): DataFrame = {
    require(keyCols.nonEmpty, "as-of join needs at least one key column")
    require(valueCols.nonEmpty, "no right-side value columns requested")
    require(buckets >= 2, s"need at least 2 buckets, got $buckets")

    val leftCols = left.columns.toSeq
    val sideCol = "__graft_is_left"
    val timeCol = "__graft_t"
    val packCol = "__graft_pack"
    val bktCol = "__graft_bkt"
    val carryCol = "__graft_carry"

    val taggedRight = right.select(
      keyCols.map(col) ++ Seq(
        col(rightTime).as(timeCol), lit(0).as(sideCol),
        struct(col(rightTime).as("t") +: valueCols.map(vc => col(vc).as(vc)): _*)
          .as(packCol)): _*)
    val taggedLeft = left
      .withColumn(timeCol, col(leftTime))
      .withColumn(sideCol, lit(1))
    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)

    // bucket geometry from one 2-scalar aggregation (columnar min/max scan)
    val bounds = unioned.agg(min(col(timeCol)).cast("long"), max(col(timeCol)).cast("long")).head()
    if (bounds.isNullAt(0)) return asOf(left, leftTime, right, rightTime, keyCols, valueCols, tolerance)
    val mn = bounds.getLong(0)
    val width = math.max(1L, (bounds.getLong(1) - mn) / buckets + 1)
    val bucketed = unioned.withColumn(bktCol, ((col(timeCol).cast("long") - mn) / width).cast("int"))

    // 1. local fill within (key, bucket) — the skew-split window
    val wLocal = Window.partitionBy((keyCols :+ bktCol).map(col): _*)
      .orderBy(col(timeCol).asc, col(sideCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val localFilled = bucketed.withColumn(packCol, last(col(packCol), ignoreNulls = true).over(wLocal))

    // 2. per-(key, bucket) last right pack, then strictly-earlier carry over
    // the bucket spine (≤ `buckets` rows per key)
    val bucketLast = bucketed.filter(col(sideCol) === 0)
      .groupBy((keyCols :+ bktCol).map(col): _*)
      .agg(max_by(col(packCol), col(timeCol)).as(packCol))
    val wCarry = Window.partitionBy(keyCols.map(col): _*).orderBy(col(bktCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = bucketed.select((keyCols :+ bktCol).map(col): _*).distinct()
      .join(bucketLast, keyCols :+ bktCol, "left")
      .withColumn(carryCol, last(col(packCol), ignoreNulls = true).over(wCarry))
      .select((keyCols :+ bktCol).map(col) :+ col(carryCol): _*)

    // 3. slim (key, bucket) join back; earlier-bucket packs are strictly
    // older than every same-bucket right row, so local wins when present
    val filled = localFilled.join(carry, keyCols :+ bktCol, "left")
      .withColumn(packCol, coalesce(col(packCol), col(carryCol)))

    val stale = tolerance match {
      case None => col(packCol).isNull
      case Some(tol) =>
        col(packCol).isNull || (col(timeCol) - col(packCol)("t")) > tol
    }
    valueCols.foldLeft(filled.filter(col(sideCol) === 1))((df, vc) =>
        df.withColumn(s"asof_$vc", when(stale, lit(null)).otherwise(col(packCol)(vc))))
      .select((leftCols ++ valueCols.map(vc => s"asof_$vc")).map(col): _*)
  }

  /**
   * The same join as [[asOf]] executed by the NATIVE whole-operator plan
   * ([[org.apache.spark.sql.graft.AsOfJoinExec]]): both sides are
   * co-partitioned on the key and co-sorted on (key, time), then merged in
   * one forward-only pass with O(1) state per partition. Compared with the
   * composed union+window plan this shuffles each side's own payload only
   * (no null-padded union widening), keeps (key, time) partitioning+order
   * on its output for downstream reuse, and lets EnsureRequirements elide
   * a side's exchange when it is already clustered on the key.
   *
   * Requires LongType time columns (cast epochs first — the events table's
   * nanosAsLong `ts` is already right). Output schema and semantics are
   * bit-identical to [[asOf]] (AsOfNativeSpec pins it).
   */
  def asOfNative(
      left: DataFrame, leftTime: String,
      right: DataFrame, rightTime: String,
      keyCols: Seq[String],
      valueCols: Seq[String],
      tolerance: Option[Long] = None): DataFrame =
    org.apache.spark.sql.graft.AsOfJoinPlanBuilder.build(
      left, leftTime, right, rightTime, keyCols, valueCols, tolerance)
}
