package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, LongType}

/**
 * EXACT segment-membership bitmap as a mergeable `TypedImperativeAggregate`
 * — the exact-tier sibling of [[ThetaSketchAgg]] (which answers the same
 * overlap questions approximately in O(k) space). Audience/segment overlap
 * ("how many users did BOTH a purchase and a page_view?") is the classic
 * OLAP bitmap workload; the theta sketch is the 100 TB default, the bitmap
 * is the exact answer while a segment's key universe stays RAM-shaped.
 *
 * Structure is the two-level chunked layout of Roaring bitmaps (Chambi,
 * Kaser, Godin, Lemire, "Better bitmap performance with Roaring bitmaps",
 * Software: Practice & Experience 2016): keys split into a 48-bit chunk id
 * (`key >>> 16`, non-negative for every long incl. negatives) and a 16-bit
 * low part; each chunk holds either a sorted char array (sparse, <= 4096
 * entries = at most 8 KB) or a 65536-bit bitset (dense, exactly 8 KB), so
 * a container never exceeds 8 KB + object overhead and worst-case space is
 * ~2 bits per representable key in a populated chunk range.
 *
 * Merge = per-chunk union (array∪array upgrades past 4096; bitset ops are
 * word-wise OR) — associative/commutative, so partial aggregation map-side
 * combines and each group ships one compressed buffer, not its raw keys.
 * Set-op CARDINALITIES (and/or/andnot) walk the two chunk maps without
 * materializing a result bitmap.
 *
 * Scale shape: the aggregate output relation is |segments| rows; pairwise
 * overlap matrices cross-join THAT relation (segment-count-bounded, the
 * q224 cross-source-matrix discipline), never the fact table. A segment of
 * n distinct dense keys costs ~n/8 bytes serialized; at 1e9 users that is
 * ~128 MB per segment — past that, [[ThetaFunctions.theta_sketch_agg]] is
 * the documented escalation.
 */
final class BitmapBuffer extends Serializable {
  import BitmapBuffer._

  // chunk id (key >>> 16) -> container; TreeMap so serialization and
  // pairwise walks see both maps in the same sorted order
  val chunks = new java.util.TreeMap[Long, AnyRef]()

  def add(key: Long): Unit = {
    val hi = key >>> 16
    val lo = (key & 0xffffL).toInt
    chunks.get(hi) match {
      case null =>
        val a = new ArrayChunk(); a.add(lo)
        chunks.put(hi, a); ()
      case a: ArrayChunk =>
        if (a.add(lo) && a.size > SparseMax) chunks.put(hi, a.toBits)
        ()
      case b: Array[Long] =>
        b(lo >>> 6) |= 1L << (lo & 63)
    }
  }

  def mergeFrom(other: BitmapBuffer): Unit = {
    val it = other.chunks.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      chunks.get(e.getKey) match {
        case null =>
          chunks.put(e.getKey, copyChunk(e.getValue)); ()
        case mine =>
          chunks.put(e.getKey, unionChunk(mine, e.getValue)); ()
      }
    }
  }

  def cardinality: Long = {
    var n = 0L
    val it = chunks.values().iterator()
    while (it.hasNext) n += chunkSize(it.next())
    n
  }

  def serialize(): Array[Byte] = {
    var bytes = 4
    val sz = chunks.entrySet().iterator()
    while (sz.hasNext) {
      bytes += 8 + 1 + 4 + (sz.next().getValue match {
        case a: ArrayChunk => a.size * 2
        case _: Array[Long] => BitsBytes
      })
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(chunks.size())
    val it = chunks.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey)
      e.getValue match {
        case a: ArrayChunk =>
          bb.put(TagArray); bb.putInt(a.size)
          var i = 0
          while (i < a.size) { bb.putChar(a.vals(i)); i += 1 }
        case b: Array[Long] =>
          bb.put(TagBits); bb.putInt(BitsWords)
          var i = 0
          while (i < BitsWords) { bb.putLong(b(i)); i += 1 }
      }
    }
    bb.array()
  }
}

object BitmapBuffer {
  /** array container upgrade threshold: past 4096 entries the 8 KB bitset
    * is smaller than the char array would grow (the Roaring constant). */
  val SparseMax = 4096
  val BitsWords = 1024
  val BitsBytes = BitsWords * 8
  val TagArray: Byte = 0
  val TagBits: Byte = 1

  /** sorted unsigned-16-bit set with amortized-doubling insert. */
  final class ArrayChunk extends Serializable {
    var vals: Array[Char] = new Array[Char](8)
    var size: Int = 0

    /** true iff newly inserted. */
    def add(lo: Int): Boolean = {
      val c = lo.toChar
      var l = 0; var r = size - 1
      while (l <= r) {
        val m = (l + r) >>> 1
        if (vals(m) < c) l = m + 1
        else if (vals(m) > c) r = m - 1
        else return false
      }
      if (size == vals.length) vals = java.util.Arrays.copyOf(vals, size * 2)
      System.arraycopy(vals, l, vals, l + 1, size - l)
      vals(l) = c
      size += 1
      true
    }

    def toBits: Array[Long] = {
      val b = new Array[Long](BitsWords)
      var i = 0
      while (i < size) { val lo = vals(i).toInt; b(lo >>> 6) |= 1L << (lo & 63); i += 1 }
      b
    }
  }

  def chunkSize(c: AnyRef): Long = c match {
    case a: ArrayChunk => a.size.toLong
    case b: Array[Long] =>
      var n = 0L; var i = 0
      while (i < BitsWords) { n += java.lang.Long.bitCount(b(i)); i += 1 }
      n
  }

  def copyChunk(c: AnyRef): AnyRef = c match {
    case a: ArrayChunk =>
      val cp = new ArrayChunk()
      cp.vals = java.util.Arrays.copyOf(a.vals, math.max(8, a.size))
      cp.size = a.size
      cp
    case b: Array[Long] => java.util.Arrays.copyOf(b, BitsWords)
  }

  /** union into a fresh-or-reused container (never aliases `right`). */
  def unionChunk(left: AnyRef, right: AnyRef): AnyRef = (left, right) match {
    case (a: ArrayChunk, b: ArrayChunk) =>
      var i = 0
      while (i < b.size) { a.add(b.vals(i).toInt); i += 1 }
      if (a.size > SparseMax) a.toBits else a
    case (a: ArrayChunk, b: Array[Long]) =>
      val bits = java.util.Arrays.copyOf(b, BitsWords)
      var i = 0
      while (i < a.size) { val lo = a.vals(i).toInt; bits(lo >>> 6) |= 1L << (lo & 63); i += 1 }
      bits
    case (a: Array[Long], b: ArrayChunk) =>
      var i = 0
      while (i < b.size) { val lo = b.vals(i).toInt; a(lo >>> 6) |= 1L << (lo & 63); i += 1 }
      a
    case (a: Array[Long], b: Array[Long]) =>
      var i = 0
      while (i < BitsWords) { a(i) |= b(i); i += 1 }
      a
  }

  def deserialize(bytes: Array[Byte]): BitmapBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new BitmapBuffer()
    val nChunks = bb.getInt
    var c = 0
    while (c < nChunks) {
      val hi = bb.getLong
      val tag = bb.get()
      val n = bb.getInt
      if (tag == TagArray) {
        val a = new ArrayChunk()
        a.vals = new Array[Char](math.max(8, n))
        var i = 0
        while (i < n) { a.vals(i) = bb.getChar; i += 1 }
        a.size = n
        buf.chunks.put(hi, a)
      } else {
        val b = new Array[Long](BitsWords)
        var i = 0
        while (i < n) { b(i) = bb.getLong; i += 1 }
        buf.chunks.put(hi, b)
      }
      c += 1
    }
    buf
  }

  // ---- set-op cardinalities over serialized bitmaps (no result bitmap is
  // materialized; a coordinated walk of the two sorted chunk maps) ----

  private def chunkAndCount(x: AnyRef, y: AnyRef): Long = (x, y) match {
    case (a: ArrayChunk, b: ArrayChunk) =>
      var i = 0; var j = 0; var n = 0L
      while (i < a.size && j < b.size) {
        if (a.vals(i) < b.vals(j)) i += 1
        else if (a.vals(i) > b.vals(j)) j += 1
        else { n += 1; i += 1; j += 1 }
      }
      n
    case (a: ArrayChunk, b: Array[Long]) =>
      var i = 0; var n = 0L
      while (i < a.size) {
        val lo = a.vals(i).toInt
        if ((b(lo >>> 6) & (1L << (lo & 63))) != 0) n += 1
        i += 1
      }
      n
    case (a: Array[Long], b: ArrayChunk) => chunkAndCount(b, a)
    case (a: Array[Long], b: Array[Long]) =>
      var i = 0; var n = 0L
      while (i < BitsWords) { n += java.lang.Long.bitCount(a(i) & b(i)); i += 1 }
      n
  }

  def andCardinality(a: BitmapBuffer, b: BitmapBuffer): Long = {
    var n = 0L
    val it = a.chunks.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val other = b.chunks.get(e.getKey)
      if (other != null) n += chunkAndCount(e.getValue, other)
    }
    n
  }

  def orCardinality(a: BitmapBuffer, b: BitmapBuffer): Long =
    a.cardinality + b.cardinality - andCardinality(a, b)

  /** |A \ B| */
  def andNotCardinality(a: BitmapBuffer, b: BitmapBuffer): Long =
    a.cardinality - andCardinality(a, b)

  // static entry points for generated code (deserialize once per input row;
  // the input relation is segment-level, i.e. tiny — see class doc)
  def andCount(a: Array[Byte], b: Array[Byte]): Long =
    andCardinality(deserialize(a), deserialize(b))
  def orCount(a: Array[Byte], b: Array[Byte]): Long =
    orCardinality(deserialize(a), deserialize(b))
  def andNotCount(a: Array[Byte], b: Array[Byte]): Long =
    andNotCardinality(deserialize(a), deserialize(b))
  def count(a: Array[Byte]): Long = deserialize(a).cardinality
}

/** Aggregate: exact membership bitmap over a LONG key column, emitted
  * serialized. Query with the `bitmap_*_count` expressions. */
case class BitmapAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BitmapBuffer]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  // ImplicitCast widens INT/SMALLINT keys to LONG at analysis time (the
  // ThetaSketchAgg coercion rationale)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bitmap_agg"

  override def createAggregationBuffer(): BitmapBuffer = new BitmapBuffer()

  override def update(buffer: BitmapBuffer, input: InternalRow): BitmapBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: BitmapBuffer, other: BitmapBuffer): BitmapBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: BitmapBuffer): Any = buffer.serialize()
  override def serialize(buffer: BitmapBuffer): Array[Byte] = buffer.serialize()
  override def deserialize(storageFormat: Array[Byte]): BitmapBuffer =
    BitmapBuffer.deserialize(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** bitmap_count(bitmap) -> exact cardinality. */
case class BitmapCount(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bitmap_count"
  override def nullSafeEval(v: Any): Any =
    BitmapBuffer.count(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"org.apache.spark.sql.graft.BitmapBuffer.count($v)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Shared shape of the pairwise cardinality expressions: two serialized
  * bitmaps in, one exact long out, codegen'd as a static helper call so the
  * enclosing stage stays inside WholeStageCodegen. */
sealed abstract class BitmapPairCount(fn: String)
  extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = s"bitmap_${fn.toLowerCase}_count"
  override def nullSafeEval(a: Any, b: Any): Any = fn match {
    case "And" => BitmapBuffer.andCount(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    case "Or" => BitmapBuffer.orCount(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    case _ => BitmapBuffer.andNotCount(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.BitmapBuffer.${fn.head.toLower}${fn.tail}Count($a, $b)")
}

/** bitmap_and_count(a, b) -> |A ∩ B| exact. */
case class BitmapAndCount(left: Expression, right: Expression)
  extends BitmapPairCount("And") {
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** bitmap_or_count(a, b) -> |A ∪ B| exact. */
case class BitmapOrCount(left: Expression, right: Expression)
  extends BitmapPairCount("Or") {
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** bitmap_andnot_count(a, b) -> |A \ B| exact. */
case class BitmapAndNotCount(left: Expression, right: Expression)
  extends BitmapPairCount("AndNot") {
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object BitmapFunctions {
  import org.apache.spark.sql.Column

  /** Aggregate column: serialized exact membership bitmap of a long key. */
  def bitmap_agg(e: Column): Column =
    ColumnBridge.column(BitmapAgg(ColumnBridge.expression(e)).toAggregateExpression())
  def bitmap_count(e: Column): Column =
    ColumnBridge.column(BitmapCount(ColumnBridge.expression(e)))
  def bitmap_and_count(a: Column, b: Column): Column =
    ColumnBridge.column(BitmapAndCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def bitmap_or_count(a: Column, b: Column): Column =
    ColumnBridge.column(BitmapOrCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def bitmap_andnot_count(a: Column, b: Column): Column =
    ColumnBridge.column(BitmapAndNotCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
