package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, LongType}

/**
 * KMV / theta sketch (Bar-Yossef et al. 2002 "Counting distinct elements
 * in a data stream"; Dasgupta et al. 2016 "A framework for estimating
 * stream expression cardinalities" — the Apache DataSketches theta
 * family) as a mergeable `TypedImperativeAggregate` over LONG keys.
 *
 * Retains the k smallest distinct 64-bit key hashes. Below capacity the
 * sketch is EXACT (it simply holds every distinct hash); past capacity,
 * θ = (k-th smallest hash)/2^63 and distinct ≈ (k−1)/θ. The win over HLL
 * (q19's `approx_count_distinct`) is SET EXPRESSIONS: two sketches
 * restricted to min(θ_a, θ_b) are coordinated uniform samples of their
 * sets, so |A ∩ B| ≈ |{h ∈ A∩B : h < θ}| / θ — the segment-overlap
 * question HLL can only answer by inclusion-exclusion with error blowup.
 *
 * Merge = union of retained hashes, re-truncated to k smallest — exactly
 * associative/commutative, so partial aggregation map-side combines and
 * only k longs per group cross the wire. The key hash is splitmix64
 * (Steele et al., JDK SplittableRandom), deterministic across JVMs.
 */
final class ThetaBuffer(val k: Int) extends Serializable {
  require(k >= 16, s"k must be >= 16, got $k")

  // sorted distinct retained hashes, all non-negative (top bit cleared)
  val set = new java.util.TreeSet[java.lang.Long]()

  def addKey(key: Long): Unit = add(ThetaBuffer.hash(key))

  def add(h: Long): Unit = {
    if (set.size() < k) { set.add(h); () }
    else if (h < set.last()) {
      if (set.add(h)) { set.pollLast(); () }
    }
  }

  def mergeFrom(other: ThetaBuffer): Unit = {
    require(other.k == k, s"cannot merge theta sketches of k=${other.k} into k=$k")
    val it = other.set.iterator()
    while (it.hasNext) add(it.next())
  }

  /** Inclusion threshold as a fraction of the non-negative hash space:
    * 1.0 while exact, else (k-th smallest)/2^63. */
  def theta: Double =
    if (set.size() < k) 1.0
    else set.last().toDouble / ThetaBuffer.HashSpace

  def estimateDistinct: Double =
    if (set.size() < k) set.size().toDouble
    else (k - 1).toDouble / theta

  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + set.size() * 8)
    bb.putInt(k); bb.putInt(set.size())
    val it = set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }
}

object ThetaBuffer {
  private[graft] val HashSpace = math.pow(2.0, 63)

  /** splitmix64, top bit cleared so every retained hash is non-negative
    * and the θ fraction is a plain division. */
  private[graft] def hash(key: Long): Long = {
    var z = key + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z ^ (z >>> 31)) & Long.MaxValue
  }

  def deserialize(bytes: Array[Byte]): ThetaBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new ThetaBuffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) { buf.set.add(bb.getLong); i += 1 }
    buf
  }

  /** |A ∩ B| estimate: both samples cut to θ = min(θ_a, θ_b), count the
    * common survivors, scale by 1/θ. Exact when both sketches are below
    * capacity. */
  def intersectionEstimate(a: ThetaBuffer, b: ThetaBuffer): Double = {
    val th = math.min(a.theta, b.theta)
    val cut = (th * HashSpace).toLong
    val exact = th == 1.0
    var common = 0L
    val it = a.set.iterator()
    while (it.hasNext) {
      val h = it.next()
      if ((exact || h < cut) && b.set.contains(h)) common += 1
    }
    common.toDouble / th
  }

  /** |A ∪ B| estimate under the same coordinated-cut rule. */
  def unionEstimate(a: ThetaBuffer, b: ThetaBuffer): Double = {
    val th = math.min(a.theta, b.theta)
    val cut = (th * HashSpace).toLong
    val u = new java.util.TreeSet[java.lang.Long](a.set)
    u.addAll(b.set)
    val exact = th == 1.0
    var n = 0L
    val it = u.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (exact || h < cut) n += 1
    }
    n.toDouble / th
  }
}

/** Aggregate: theta sketch over a LONG key column, emitted serialized.
  * Query with [[ThetaBuffer.deserialize]] + the estimate helpers. */
case class ThetaSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ThetaBuffer]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  // the SQL registration (theta_sketch_agg) otherwise applies no
  // coercion: an INT/SMALLINT key would ClassCastException at runtime in
  // update(); ImplicitCast widens integral inputs to LONG at analysis
  // time and rejects non-castable types with an analysis error
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_sketch_agg"

  override def createAggregationBuffer(): ThetaBuffer = new ThetaBuffer(k)

  override def update(buffer: ThetaBuffer, input: InternalRow): ThetaBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.addKey(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: ThetaBuffer, other: ThetaBuffer): ThetaBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: ThetaBuffer): Any = buffer.serialize()
  override def serialize(buffer: ThetaBuffer): Array[Byte] = buffer.serialize()
  override def deserialize(storageFormat: Array[Byte]): ThetaBuffer =
    ThetaBuffer.deserialize(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object ThetaFunctions {
  /** Aggregate column: serialized theta sketch of a long key column. */
  def theta_sketch_agg(e: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column =
    ColumnBridge.column(
      ThetaSketchAgg(ColumnBridge.expression(e), k).toAggregateExpression())
}
