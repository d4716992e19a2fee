package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Content-defined chunking (CDC) as a codegen kernel: split a document into
 * variable-size chunks whose BOUNDARIES are a function of the local content
 * (a Gear rolling hash hitting a zero mask), not of absolute offsets. The
 * property that makes it the chunk-level dedup primitive for code/doc
 * corpora: an insertion or deletion only perturbs the chunks that overlap
 * the edit — boundaries (and therefore chunk hashes) RE-ALIGN right after
 * it, so near-identical documents share almost all chunk hashes, where
 * fixed-width chunking ([[graft.ext.TextStats.chunkText]]) would shift
 * every subsequent chunk. Algorithm follows the Gear/FastCDC family (Xia et
 * al., USENIX ATC'16) in its plain form: per-byte `fp = (fp << 1) + G[b]`,
 * boundary when `len >= minLen && (fp & mask) == 0`, forced at `maxLen`.
 *
 * The gear table derives from SplitMix64 at a FIXED seed, so chunk hashes
 * are stable across sessions/engines — safe to persist and join against
 * later ingests. Works on the UTF-8 BYTES of the string (offsets/lengths
 * are byte-based).
 */
object CdcAlgo {
  /** Deterministic 256-entry gear table (SplitMix64, fixed seed). */
  val gear: Array[Long] = {
    var x = 0x9E3779B97F4A7C15L
    Array.fill(256) {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
  }

  /** Chunk rows (startByte, lenBytes, xxhash64 of the chunk's bytes).
    * Concatenated chunks exactly tile the input; empty input -> no chunks. */
  def chunks(text: UTF8String, minLen: Int, maxLen: Int, maskBits: Int): ArrayData = {
    val n = text.numBytes()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val mask = (1L << maskBits) - 1
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var start = 0
    var fp = 0L
    var i = 0
    while (i < n) {
      val b = org.apache.spark.unsafe.Platform.getByte(base, off + i) & 0xFF
      fp = (fp << 1) + gear(b)
      val len = i - start + 1
      if ((len >= minLen && (fp & mask) == 0L) || len >= maxLen || i == n - 1) {
        val h = XXH64.hashUnsafeBytes(base, off + start, len, 0L)
        out += InternalRow(start.toLong, len.toLong, h)
        start = i + 1
        fp = 0L
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** cdc_chunks(text) -> array<struct<start bigint, len bigint, hash bigint>>. */
case class CdcChunks(child: Expression, minLen: Int, maxLen: Int, maskBits: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(minLen > 0 && maxLen >= minLen,
    s"need 0 < minLen <= maxLen, got ($minLen, $maxLen)")
  require(maskBits > 0 && maskBits < 48, s"maskBits must be in [1,47], got $maskBits")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("start", LongType, nullable = false),
      StructField("len", LongType, nullable = false),
      StructField("hash", LongType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cdc_chunks"

  override def nullSafeEval(v: Any): Any =
    CdcAlgo.chunks(v.asInstanceOf[UTF8String], minLen, maxLen, maskBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"org.apache.spark.sql.graft.CdcAlgo.chunks($v, $minLen, $maxLen, $maskBits)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object CdcFunctions {
  import org.apache.spark.sql.Column

  /** Content-defined chunks of a text column (byte offsets, stable gear
    * table — hashes are persistable across sessions). */
  def cdc_chunks(e: Column, minLen: Int, maxLen: Int, maskBits: Int): Column =
    ColumnBridge.column(CdcChunks(ColumnBridge.expression(e), minLen, maxLen, maskBits))
}
