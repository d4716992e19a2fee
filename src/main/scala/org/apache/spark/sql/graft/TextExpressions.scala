package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * SimHash fingerprint algorithm (Charikar 2002), operating on a document's
 * token array. Static helper so the codegen'd expression below emits a
 * single call and stays inside WholeStageCodegen.
 */
object SimHashAlgo {
  /** 64-bit SimHash of a token array: per token, xxhash64 its UTF-8 bytes;
    * each of the 64 bit positions votes +1/-1; sign of the vote total sets
    * the output bit. Near-duplicate docs land within small hamming radius. */
  def simhash64(tokens: ArrayData, seed: Long): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val s = tokens.getUTF8String(t)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), seed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** xxhash64 of a single UTF8String (for rolling/fingerprint use). */
  def hashString(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), seed)
}

/** Catalyst expression: simhash64(tokens array<string>) -> long. */
case class SimHash64(child: Expression, seed: Long) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(v: Any): Any =
    SimHashAlgo.simhash64(v.asInstanceOf[ArrayData], seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"org.apache.spark.sql.graft.SimHashAlgo.simhash64($a, ${seed}L)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextExpressionFunctions {
  def simhash64(tokens: Column, seed: Long = 0L): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens), seed))
}
