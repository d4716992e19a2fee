package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Count-Min sketch (Cormode & Muthukrishnan 2005, "An improved data stream
 * summary: the count-min sketch and its applications") as a mergeable
 * `TypedImperativeAggregate` — the frequency-ESTIMATE companion to the
 * Misra-Gries candidate sketch in [[FrequentItems]]: MG yields WHICH items
 * are heavy, CMS answers "how often did X occur" for ANY x, in
 * depth*width*8 bytes, one pass, any partitioning.
 *
 * Guarantees (depth d, width w, N observations): estimate >= true count
 * always (one-sided), and estimate <= true + (e/w)*N with probability
 * >= 1 - e^-d per query. Merging is elementwise addition, so partial
 * aggregation distributes perfectly (map-side combine collapses each
 * partition to one d*w table before the shuffle — the sketch, never the
 * stream, crosses the wire).
 *
 * Row indexes use Kirsch-Mitzenmacher double hashing (h1 + i*h2, 2006,
 * "Less hashing, same performance") over an FNV-1a 64 base hash — the
 * same discipline as [[BloomBuffer]], deterministic across JVMs.
 */
final class CountMinBuffer(val depth: Int, val width: Int) extends Serializable {
  require(depth > 0 && depth <= 32, s"depth must be in [1,32], got $depth")
  require(width > 0, s"width must be positive, got $width")
  require(depth.toLong * width <= (Int.MaxValue - 16) / 8,
    s"depth*width=$depth*$width exceeds the single-sketch ceiling " +
      s"(${(Int.MaxValue - 16) / 8} counters); shard the stream or shrink the sketch")

  val table = new Array[Long](depth * width)
  var total: Long = 0L

  def add(item: UTF8String, w: Long): Unit = {
    val (h1, h2) = CountMinBuffer.hash2(item)
    var i = 0
    while (i < depth) {
      val idx = i * width + CountMinBuffer.slot(h1, h2, i, width)
      table(idx) += w
      i += 1
    }
    total += w
  }

  def estimate(item: UTF8String): Long = {
    val (h1, h2) = CountMinBuffer.hash2(item)
    var est = Long.MaxValue
    var i = 0
    while (i < depth) {
      val c = table(i * width + CountMinBuffer.slot(h1, h2, i, width))
      if (c < est) est = c
      i += 1
    }
    est
  }

  def mergeFrom(other: CountMinBuffer): Unit = {
    require(other.depth == depth && other.width == width,
      s"cannot merge CMS of shape (${other.depth},${other.width}) into ($depth,$width)")
    var i = 0
    while (i < table.length) { table(i) += other.table(i); i += 1 }
    total += other.total
  }

  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(16 + table.length * 8)
    bb.putInt(depth); bb.putInt(width); bb.putLong(total)
    var i = 0
    while (i < table.length) { bb.putLong(table(i)); i += 1 }
    bb.array()
  }
}

object CountMinBuffer {
  /** FNV-1a 64 over the UTF-8 bytes, then a splitmix-style remix for the
    * second hash — two independent-enough 64-bit streams from one pass. */
  private[graft] def hash2(item: UTF8String): (Long, Long) = {
    val bytes = item.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
    var z = h + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (h, z ^ (z >>> 31))
  }

  private[graft] def slot(h1: Long, h2: Long, i: Int, width: Int): Int =
    (((h1 + i.toLong * h2) & Long.MaxValue) % width).toInt

  def deserialize(bytes: Array[Byte]): CountMinBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new CountMinBuffer(bb.getInt, bb.getInt)
    buf.total = bb.getLong
    var i = 0
    while (i < buf.table.length) { buf.table(i) = bb.getLong; i += 1 }
    buf
  }
}

/** Aggregate: CMS over a string column, emitted as the serialized sketch
  * (binary). Pair with [[CmsEstimate]] to query it. */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinBuffer] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "count_min_agg"

  override def createAggregationBuffer(): CountMinBuffer = new CountMinBuffer(depth, width)

  override def update(buffer: CountMinBuffer, input: InternalRow): CountMinBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String], 1L)
    buffer
  }

  override def merge(buffer: CountMinBuffer, other: CountMinBuffer): CountMinBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: CountMinBuffer): Any = buffer.serialize()
  override def serialize(buffer: CountMinBuffer): Array[Byte] = buffer.serialize()
  override def deserialize(storageFormat: Array[Byte]): CountMinBuffer =
    CountMinBuffer.deserialize(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)

  /** (e/width)*n: the additive over-count bound that holds per query with
    * probability >= 1 - e^-depth. */
  def errorBound(n: Long): Long = math.ceil(math.E / width * n).toLong
}

/**
 * Scalar probe: estimated count of `child` in a driver-collected sketch
 * (the [[BloomMightContain]] shape: bytes live in the expression, the
 * buffer deserializes ONCE lazily per task, and equality is content-based
 * so semantically identical probes unify under subexpression elimination).
 */
case class CmsEstimate(sketchBytes: Array[Byte], child: Expression)
  extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def dataType: DataType = LongType
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def prettyName: String = "cms_estimate"
  override def nullIntolerant: Boolean = true

  @transient private lazy val buffer = CountMinBuffer.deserialize(sketchBytes)

  override protected def nullSafeEval(v: Any): Any =
    buffer.estimate(v.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
    : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("cmsBuffer", buffer, classOf[CountMinBuffer].getName)
    defineCodeGen(ctx, ev, c => s"$ref.estimate($c)")
  }

  override def equals(other: Any): Boolean = other match {
    case e: CmsEstimate =>
      java.util.Arrays.equals(sketchBytes, e.sketchBytes) && child == e.child
    case _ => false
  }
  @transient private lazy val bytesHash = java.util.Arrays.hashCode(sketchBytes)
  override def hashCode(): Int = 31 * bytesHash + child.hashCode()

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object CountMinFunctions {
  /** Aggregate column: serialized CMS of a string column. */
  def count_min_agg(e: org.apache.spark.sql.Column, depth: Int, width: Int)
    : org.apache.spark.sql.Column =
    ColumnBridge.column(
      CountMinAgg(ColumnBridge.expression(e), depth, width).toAggregateExpression())

  /** Scalar column: estimated count of `e` in a collected sketch. */
  def cms_estimate(sketch: Array[Byte], e: org.apache.spark.sql.Column)
    : org.apache.spark.sql.Column =
    ColumnBridge.column(CmsEstimate(sketch, ColumnBridge.expression(e)))
}
