package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType}

/** Bottom-k sketch state: up to ~2k (hashKey, serialized value) entries,
  * compacted back to the k smallest keys whenever it doubles. `bound`
  * tracks the current k-th-smallest key so callers can reject (and avoid
  * copying) rows that can never enter the answer. */
final class BottomKBuffer(val k: Int) {
  val items: ArrayBuffer[(Long, Array[Byte])] = ArrayBuffer.empty
  private var bound: Long = Long.MaxValue

  /** can `key` still make the bottom-k? (false -> skip the byte copy) */
  def admits(key: Long): Boolean = items.length < k || key < bound

  def add(key: Long, bytes: Array[Byte]): Unit = {
    items += ((key, bytes))
    if (items.length >= 2 * k) compact()
  }

  /** keep only the k smallest keys — entries beyond the k-th smallest can
    * never re-enter the final answer, so this loses nothing */
  def compact(): Unit = if (items.length > k) {
    val sorted = items.sortBy(_._1).take(k)
    items.clear()
    items ++= sorted
    bound = items.last._1
  }
}

/**
 * Exact-k per-group uniform sample as a `TypedImperativeAggregate`:
 * keep the k rows whose `xxhash64(seed, serializedValue)` is smallest
 * (bottom-k sampling). Properties that matter at cluster scale:
 *
 *  - **one shuffle**: runs as a partial aggregate (per-partition sketches)
 *    merged map-side, so per-group sampling costs the same as any groupBy —
 *    no global sort, no window, no second pass (SURVEY.md §4's "custom
 *    reservoir aggregate" north-star operator);
 *  - **mergeable**: bottom-k of a union = bottom-k of the merged bottom-k
 *    sketches, so partial/final aggregation is exact;
 *  - **deterministic & order-independent**: the hash key depends only on
 *    (seed, value bytes), never on row arrival order or partitioning —
 *    unlike classic reservoir sampling, re-running on a differently
 *    partitioned input yields the SAME sample;
 *  - caveat: duplicate rows hash identically, so heavy duplication skews
 *    selection; include a unique id column in the sampled struct when rows
 *    can repeat.
 *
 * Memory: O(k) per group (buffer compacts at 2k).
 */
case class BottomKSample(
    child: Expression,
    k: Int,
    seed: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKBuffer] with UnaryLike[Expression] {

  require(k > 0, s"k must be positive, got $k")

  @transient private lazy val proj = UnsafeProjection.create(Array[DataType](child.dataType))
  @transient private lazy val scratch = new Array[Any](1)

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bottom_k_sample"

  override def createAggregationBuffer(): BottomKBuffer = new BottomKBuffer(k)

  override def update(buffer: BottomKBuffer, input: InternalRow): BottomKBuffer = {
    val v = child.eval(input)
    if (v != null) {
      scratch(0) = v
      val row = proj(InternalRow.fromSeq(scratch.toSeq))
      // hash the projection's buffer IN PLACE; only admitted rows (rare once
      // the sketch is warm) pay the byte copy. The copy itself is mandatory
      // before storing: getBytes on the projection output can ALIAS its
      // reused buffer (no-copy fast path when buffer length == sizeInBytes),
      // and an aliased entry would be silently overwritten by the next row.
      val key = XXH64.hashUnsafeBytes(row.getBaseObject, row.getBaseOffset, row.getSizeInBytes, seed)
      if (buffer.admits(key)) buffer.add(key, row.copy().getBytes)
    }
    buffer
  }

  override def merge(buffer: BottomKBuffer, other: BottomKBuffer): BottomKBuffer = {
    other.items.foreach { case (key, bytes) => buffer.add(key, bytes) }
    buffer
  }

  override def eval(buffer: BottomKBuffer): Any = {
    buffer.compact()
    val winners = buffer.items.sortBy(_._1)
    val out = new Array[Any](winners.length)
    var i = 0
    winners.foreach { case (_, bytes) =>
      val row = new UnsafeRow(1)
      row.pointTo(bytes, bytes.length)
      out(i) = row.get(0, child.dataType)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: BottomKBuffer): Array[Byte] = {
    buffer.compact()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.items.length)
    buffer.items.foreach { case (key, bytes) =>
      out.writeLong(key); out.writeInt(bytes.length); out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(storageFormat: Array[Byte]): BottomKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(storageFormat))
    val buffer = new BottomKBuffer(k)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val key = in.readLong()
      val bytes = new Array[Byte](in.readInt())
      in.readFully(bytes)
      buffer.items += ((key, bytes))
      i += 1
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKSample =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKSample =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Double-keyed variant of [[BottomKBuffer]] for weighted keys. */
final class WeightedBottomKBuffer(val k: Int) {
  val items: ArrayBuffer[(Double, Array[Byte])] = ArrayBuffer.empty
  private var bound: Double = Double.PositiveInfinity

  def admits(key: Double): Boolean = items.length < k || key < bound

  def add(key: Double, bytes: Array[Byte]): Unit = {
    items += ((key, bytes))
    if (items.length >= 2 * k) compact()
  }

  def compact(): Unit = if (items.length > k) {
    val sorted = items.sortBy(_._1).take(k)
    items.clear()
    items ++= sorted
    bound = items.last._1
  }
}

/**
 * Weighted exact-k per-group sample without replacement (Efraimidis &
 * Spirakis A-ES, reformulated as an exponential race): item key =
 * -ln(u) / w with u a deterministic hash-uniform of the value — the k
 * smallest keys win, and an item's inclusion probability scales with its
 * weight. Same one-shuffle / mergeable / order-independent properties as
 * [[BottomKSample]]; rows with null or non-positive weight are excluded.
 */
case class WeightedBottomKSample(
    child: Expression,
    weight: Expression,
    k: Int,
    seed: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[WeightedBottomKBuffer]
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  require(k > 0, s"k must be positive, got $k")

  @transient private lazy val proj = UnsafeProjection.create(Array[DataType](child.dataType))
  @transient private lazy val scratch = new Array[Any](1)

  override def left: Expression = child
  override def right: Expression = weight
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bottom_k_sample_weighted"

  override def createAggregationBuffer(): WeightedBottomKBuffer = new WeightedBottomKBuffer(k)

  override def update(buffer: WeightedBottomKBuffer, input: InternalRow): WeightedBottomKBuffer = {
    val v = child.eval(input)
    val wRaw = weight.eval(input)
    if (v != null && wRaw != null) {
      val w = wRaw match {
        case n: java.lang.Number => n.doubleValue()
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
        case other => throw new IllegalArgumentException(
          s"bottom_k_sample_weighted: weight must be numeric, got ${other.getClass.getName}")
      }
      if (w > 0.0) {
        scratch(0) = v
        val row = proj(InternalRow.fromSeq(scratch.toSeq))
        val h = XXH64.hashUnsafeBytes(row.getBaseObject, row.getBaseOffset, row.getSizeInBytes, seed)
        // top 53 bits -> u in (0,1]; -ln(u)/w ~ Exp(rate w): smallest wins
        val u = ((h >>> 11) + 1).toDouble / (1L << 53).toDouble
        val key = -math.log(u) / w
        if (buffer.admits(key)) buffer.add(key, row.copy().getBytes)
      }
    }
    buffer
  }

  override def merge(buffer: WeightedBottomKBuffer, other: WeightedBottomKBuffer): WeightedBottomKBuffer = {
    other.items.foreach { case (key, bytes) => buffer.add(key, bytes) }
    buffer
  }

  override def eval(buffer: WeightedBottomKBuffer): Any = {
    buffer.compact()
    val winners = buffer.items.sortBy(_._1)
    val out = new Array[Any](winners.length)
    var i = 0
    winners.foreach { case (_, bytes) =>
      val row = new UnsafeRow(1)
      row.pointTo(bytes, bytes.length)
      out(i) = row.get(0, child.dataType)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: WeightedBottomKBuffer): Array[Byte] = {
    buffer.compact()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.items.length)
    buffer.items.foreach { case (key, bytes) =>
      out.writeDouble(key); out.writeInt(bytes.length); out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(storageFormat: Array[Byte]): WeightedBottomKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(storageFormat))
    val buffer = new WeightedBottomKBuffer(k)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val key = in.readDouble()
      val bytes = new Array[Byte](in.readInt())
      in.readFully(bytes)
      buffer.items += ((key, bytes))
      i += 1
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): WeightedBottomKSample =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): WeightedBottomKSample =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(child = l, weight = r)
}

/** Rank-keyed bottom-k buffer: entries carry an arbitrary orderable rank
  * value (compared with the Catalyst interpreted ordering for its type)
  * alongside the serialized (rank, payload) row bytes. */
final class RankedBottomKBuffer(val k: Int, ord: Ordering[Any]) {
  val items: ArrayBuffer[(Any, Array[Byte])] = ArrayBuffer.empty
  private var bound: Any = _ // null until the first compact

  /** can `key` still make the bottom-k? (false -> skip the byte copy) */
  def admits(key: Any): Boolean =
    items.length < k || bound == null || ord.lt(key, bound)

  def add(key: Any, bytes: Array[Byte]): Unit = {
    items += ((key, bytes))
    if (items.length >= 2 * k) compact()
  }

  def compact(): Unit = if (items.length > k) {
    val sorted = items.sortBy(_._1)(ord).take(k)
    items.clear()
    items ++= sorted
    bound = items.last._1
  }

  def sorted(): Seq[(Any, Array[Byte])] = {
    compact()
    items.sortBy(_._1)(ord).toSeq
  }
}

/**
 * Generic order-statistic sample: keep the k payload values whose RANK
 * expression is smallest — `bottom_k_by_rank(rank, payload, k)`. The rank
 * is any orderable Catalyst type (string, numeric, struct for
 * lexicographic multi-key ranks); ties beyond the rank are broken
 * arbitrarily, so pass a rank that is unique per row (e.g. a full md5 hex
 * of a unique key) when exact reproducibility matters.
 *
 * This is the PORTABLE cousin of [[BottomKSample]]: where that ranks by an
 * engine-internal xxhash of the row bytes, this one ranks by a caller
 * expression any engine can recompute — `md5(seed || id)` makes the
 * per-group sample replayable in standard SQL
 * (`QUALIFY row_number() OVER (PARTITION BY g ORDER BY md5(...)) <= k`),
 * which is what lets the driver hash-oracle per-group/weighted sampling.
 *
 * NULL semantics: rows whose rank (or payload) evaluates to NULL are
 * EXCLUDED, like SQL aggregates ignoring NULL inputs — note a window
 * `ORDER BY rank` formulation differs there (Spark ASC puts NULLS FIRST,
 * DuckDB NULLS LAST); for exact cross-engine replay use a non-null rank
 * or filter NULLs explicitly on both sides.
 * Same scale properties: one shuffle (partial sketches merge map-side),
 * O(k) memory per group, partition-layout-independent. It is also a
 * general top-k-per-group operator that avoids a per-group window sort.
 */
case class BottomKByRank(
    rank: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[RankedBottomKBuffer]
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  require(k > 0, s"k must be positive, got $k")

  @transient private lazy val ord =
    org.apache.spark.sql.catalyst.util.TypeUtils.getInterpretedOrdering(rank.dataType)
  @transient private lazy val proj =
    UnsafeProjection.create(Array[DataType](rank.dataType, payload.dataType))
  @transient private lazy val scratch = new Array[Any](2)

  override def left: Expression = rank
  override def right: Expression = payload
  override def dataType: DataType = ArrayType(payload.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bottom_k_by_rank"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    org.apache.spark.sql.catalyst.util.TypeUtils.checkForOrderingExpr(rank.dataType, prettyName)

  override def createAggregationBuffer(): RankedBottomKBuffer = new RankedBottomKBuffer(k, ord)

  override def update(buffer: RankedBottomKBuffer, input: InternalRow): RankedBottomKBuffer = {
    val r = rank.eval(input)
    val v = payload.eval(input)
    if (r != null && v != null && buffer.admits(r)) {
      // r may alias reused evaluation buffers (UTF8String over the input
      // row) — admits only COMPARES it, which is safe; the stored key is
      // re-read from our own copied row bytes below, so it never aliases.
      scratch(0) = r
      scratch(1) = v
      val bytes = proj(InternalRow.fromSeq(scratch.toSeq)).copy().getBytes
      val stored = new UnsafeRow(2)
      stored.pointTo(bytes, bytes.length)
      buffer.add(stored.get(0, rank.dataType), bytes)
    }
    buffer
  }

  override def merge(buffer: RankedBottomKBuffer, other: RankedBottomKBuffer): RankedBottomKBuffer = {
    other.items.foreach { case (key, bytes) => buffer.add(key, bytes) }
    buffer
  }

  override def eval(buffer: RankedBottomKBuffer): Any = {
    val winners = buffer.sorted()
    val out = new Array[Any](winners.length)
    var i = 0
    winners.foreach { case (_, bytes) =>
      val row = new UnsafeRow(2)
      row.pointTo(bytes, bytes.length)
      out(i) = row.get(1, payload.dataType)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: RankedBottomKBuffer): Array[Byte] = {
    buffer.compact()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.items.length)
    buffer.items.foreach { case (_, bytes) =>
      out.writeInt(bytes.length); out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(storageFormat: Array[Byte]): RankedBottomKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(storageFormat))
    val buffer = new RankedBottomKBuffer(k, ord)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val bytes = new Array[Byte](in.readInt())
      in.readFully(bytes)
      val row = new UnsafeRow(2)
      row.pointTo(bytes, bytes.length)
      buffer.items += ((row.get(0, rank.dataType), bytes))
      i += 1
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKByRank =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKByRank =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(rank = l, payload = r)
}

object BottomKSampleFunctions {
  /** Aggregate column: uniform deterministic sample of up to k values of e
    * per group. */
  def bottom_k_sample(e: Column, k: Int, seed: Long): Column =
    ColumnBridge.column(
      BottomKSample(ColumnBridge.expression(e), k, seed).toAggregateExpression())

  /** Aggregate column: weighted (A-ES) deterministic sample of up to k
    * values of e per group; inclusion probability scales with w. */
  def bottom_k_sample_weighted(e: Column, w: Column, k: Int, seed: Long): Column =
    ColumnBridge.column(
      WeightedBottomKSample(ColumnBridge.expression(e), ColumnBridge.expression(w), k, seed)
        .toAggregateExpression())

  /** Aggregate column: the k payload values with the smallest rank —
    * general top/bottom-k-per-group without a window sort; replayable in
    * any engine when the rank is a portable expression (md5). */
  def bottom_k_by_rank(rank: Column, payload: Column, k: Int): Column =
    ColumnBridge.column(
      BottomKByRank(ColumnBridge.expression(rank), ColumnBridge.expression(payload), k)
        .toAggregateExpression())
}
