package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}

/**
 * Hilbert space-filling-curve index as a codegen kernel — the
 * better-locality sibling of the Morton key in [[graft.io.ZOrder]].
 *
 * Both curves interleave the clustering dimensions so parquet row groups
 * get tight min/max envelopes on every dimension at once; the difference
 * is the walk: consecutive Hilbert positions are ALWAYS axis-neighbors
 * (Manhattan distance exactly 1 — HilbertSpec enumerates a full grid and
 * pins it), while the Z-curve takes long diagonal jumps at power-of-two
 * seams. Tighter steps mean row-group envelopes hug smaller boxes, so a
 * range probe skips more groups — which is why Delta/Iceberg grew
 * HILBERT alongside ZORDER for their OPTIMIZE layouts.
 *
 * Algorithm: Skilling's axes->transpose transform ("Programming the
 * Hilbert curve", AIP Conf. Proc. 707, 2004 — public domain pseudocode,
 * reproduced in every lakehouse implementation), then an MSB-first bit
 * interleave of the transposed axes into one long. Inputs are
 * pre-quantized bucket ordinals in [0, 2^bits); n*bits must fit a
 * non-negative long (<= 63 bits).
 */
object HilbertAlgo {

  /** Hilbert index of `xs` (each in [0, 2^bits)); xs is NOT mutated. */
  def index(bits: Int, xs: Array[Long]): Long = {
    val n = xs.length
    val x = new Array[Long](n)
    System.arraycopy(xs, 0, x, 0, n)
    // Skilling: axes -> transpose (in place on the copy)
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) { if ((x(n - 1) & q) != 0) t ^= q - 1; q >>= 1 }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // transpose -> scalar: MSB-first interleave across axes
    var out = 0L
    var j = bits - 1
    while (j >= 0) {
      i = 0
      while (i < n) { out = (out << 1) | ((x(i) >>> j) & 1L); i += 1 }
      j -= 1
    }
    out
  }
}

/** hilbert_index(x0, x1, ...) over pre-bucketed long ordinals -> long. */
case class HilbertIndex(children: Seq[Expression], bits: Int) extends Expression {
  require(children.nonEmpty, "hilbert_index needs at least one coordinate")
  require(bits > 0 && children.length * bits <= 63,
    s"need 0 < dims*bits <= 63, got ${children.length} dims x $bits bits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val bad = children.find(_.dataType != LongType)
    if (bad.isEmpty) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hilbert_index expects LongType coordinates, got ${bad.get.dataType}")
  }

  // callers pre-coalesce NULL buckets to 0 (same contract as the Morton
  // key); a stray null coordinate maps to bucket 0 rather than poisoning
  // the whole key
  override def eval(input: InternalRow): Any = {
    val xs = new Array[Long](children.length)
    var i = 0
    while (i < children.length) {
      val v = children(i).eval(input)
      xs(i) = if (v == null) 0L else v.asInstanceOf[Long]
      i += 1
    }
    HilbertAlgo.index(bits, xs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("hilbertCoords")
    val fills = evals.zipWithIndex.map { case (e, i) =>
      e.code.toString + s"\n$arr[$i] = ${e.isNull} ? 0L : ${e.value};"
    }.mkString("\n")
    ev.copy(
      code = code"""
        |long[] $arr = new long[${children.length}];
        |$fills
        |long ${ev.value} =
        |  org.apache.spark.sql.graft.HilbertAlgo.index($bits, $arr);
        |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

object HilbertFunctions {
  /** Hilbert curve position of pre-bucketed long ordinals (each in
    * [0, 2^bits)); null ordinals land in bucket 0. */
  def hilbert_index(bits: Int, coords: Column*): Column =
    ColumnBridge.column(HilbertIndex(coords.map(ColumnBridge.expression), bits))
}
