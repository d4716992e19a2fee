package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries counter state: at most `k` (item -> lower-bound count)
  * entries. The classic frequent-items guarantee: after observing N items,
  * every item with true count > N/(k+1) is present, and each stored count
  * under-counts by at most N/(k+1). */
final class MisraGriesBuffer(val k: Int) {
  val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty

  def add(item: String, weight: Long = 1L): Unit = {
    counts.get(item) match {
      case Some(c) => counts.update(item, c + weight)
      case None if counts.size < k => counts.update(item, weight)
      case None =>
        // decrement-all by the new item's weight, capped at the minimum
        // counter (the batch form of the classic per-item decrement)
        val dec = math.min(weight, counts.valuesIterator.min)
        val dead = mutable.ArrayBuffer.empty[String]
        counts.mapValuesInPlace((_, c) => c - dec)
        counts.foreach { case (i, c) => if (c <= 0) dead += i }
        dead.foreach(counts.remove)
        val rest = weight - dec
        if (rest > 0 && counts.size < k) counts.update(item, rest)
    }
  }

  /** MG merge (Agarwal et al., PODS'12): sum counters, then shrink back to
    * k by subtracting the (k+1)-th largest count from every counter. Keeps
    * the additive-error guarantee over the combined stream. */
  def mergeFrom(other: MisraGriesBuffer): Unit = {
    other.counts.foreach { case (i, c) =>
      counts.update(i, counts.getOrElse(i, 0L) + c)
    }
    if (counts.size > k) {
      val sorted = counts.values.toArray
      java.util.Arrays.sort(sorted)
      val cut = sorted(sorted.length - k - 1) // (k+1)-th largest
      val dead = mutable.ArrayBuffer.empty[String]
      counts.mapValuesInPlace((_, c) => c - cut)
      counts.foreach { case (i, c) => if (c <= 0) dead += i }
      dead.foreach(counts.remove)
    }
  }
}

/**
 * Frequent-items (heavy-hitters) sketch as a `TypedImperativeAggregate`:
 * one pass, O(k) memory per group, mergeable across partitions — the
 * standard first pass for "most frequent tokens/domains/urls over 100 TB"
 * where an exact groupBy would shuffle the full corpus vocabulary.
 *
 * Counter VALUES depend on arrival order (inherent to Misra-Gries); the
 * GUARANTEE does not: every item with true count > N/(k+1) is returned,
 * regardless of partitioning. Production pattern (and the q106 gate
 * query): sketch -> candidate set -> exact recount of candidates only —
 * the final result is then exact and deterministic.
 *
 * Returns array<struct<item string, count bigint>>, count descending then
 * item ascending (count = lower bound on the true count).
 */
case class FrequentItems(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGriesBuffer] with UnaryLike[Expression] {

  require(k > 0, s"k must be positive, got $k")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("count", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "frequent_items"

  override def createAggregationBuffer(): MisraGriesBuffer = new MisraGriesBuffer(k)

  override def update(buffer: MisraGriesBuffer, input: InternalRow): MisraGriesBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: MisraGriesBuffer, other: MisraGriesBuffer): MisraGriesBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: MisraGriesBuffer): Any = {
    val sorted = buffer.counts.toArray.sortBy { case (i, c) => (-c, i) }
    new GenericArrayData(sorted.map { case (i, c) =>
      InternalRow(UTF8String.fromString(i), c)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: MisraGriesBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.counts.size)
    buffer.counts.foreach { case (i, c) =>
      val b = i.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(storageFormat: Array[Byte]): MisraGriesBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(storageFormat))
    val buffer = new MisraGriesBuffer(k)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      buffer.counts.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FrequentItems =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FrequentItems =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)

  /** n/(k+1): max under-count of any stored counter after n observations. */
  def maxError(n: Long): Long = n / (k + 1)
}

/**
 * Weighted Misra-Gries: counters accumulate an integer weight per row
 * instead of 1 — "heavy items by total weight" (bytes per domain, spend
 * per user). The guarantee generalizes verbatim: every item whose true
 * total weight exceeds W/(k+1) (W = total observed weight) survives any
 * partitioning. Rows with null/non-positive weight are ignored.
 */
case class FrequentItemsWeighted(
    child: Expression,
    weight: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGriesBuffer]
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  require(k > 0, s"k must be positive, got $k")

  override def left: Expression = child
  override def right: Expression = weight
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("weight", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "frequent_items_weighted"

  override def createAggregationBuffer(): MisraGriesBuffer = new MisraGriesBuffer(k)

  override def update(buffer: MisraGriesBuffer, input: InternalRow): MisraGriesBuffer = {
    val v = child.eval(input)
    val wRaw = weight.eval(input)
    if (v != null && wRaw != null) {
      val w = wRaw match {
        case n: java.lang.Number => n.longValue()
        case d: org.apache.spark.sql.types.Decimal => d.toLong
        case other => throw new IllegalArgumentException(
          s"weight must be numeric, got ${other.getClass.getName}")
      }
      if (w > 0) buffer.add(v.asInstanceOf[UTF8String].toString, w)
    }
    buffer
  }

  override def merge(buffer: MisraGriesBuffer, other: MisraGriesBuffer): MisraGriesBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: MisraGriesBuffer): Any = {
    val sorted = buffer.counts.toArray.sortBy { case (i, c) => (-c, i) }
    new GenericArrayData(sorted.map { case (i, c) =>
      InternalRow(UTF8String.fromString(i), c)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: MisraGriesBuffer): Array[Byte] =
    FrequentItems(child, k).serialize(buffer)
  override def deserialize(storageFormat: Array[Byte]): MisraGriesBuffer =
    FrequentItems(child, k).deserialize(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): FrequentItemsWeighted =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FrequentItemsWeighted =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(child = l, weight = r)
}

object FrequentItemsFunctions {
  /** Aggregate column: Misra-Gries heavy-hitters sketch of a string column
    * (k counters; every item with true count > N/(k+1) is returned). */
  def frequent_items(e: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column =
    ColumnBridge.column(
      FrequentItems(ColumnBridge.expression(e), k).toAggregateExpression())

  /** Weighted variant: heavy items by total integer weight. */
  def frequent_items_weighted(
      e: org.apache.spark.sql.Column, w: org.apache.spark.sql.Column,
      k: Int): org.apache.spark.sql.Column =
    ColumnBridge.column(
      FrequentItemsWeighted(ColumnBridge.expression(e), ColumnBridge.expression(w), k)
        .toAggregateExpression())
}
