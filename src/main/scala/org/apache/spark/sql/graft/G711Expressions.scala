package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * ITU-T G.711 expansion as a codegen Catalyst expression: the SQL-surface
 * twin of [[graft.ext.Multimodal.G711Codec]] (which mapPartitions-decodes
 * whole WAV containers). This one expands a BINARY column of raw code
 * bytes to `array<int>` linear samples through a 256-entry LUT — one
 * table load per byte inside whole-stage codegen, the fastest shape a
 * per-byte transcode can take, and it composes with the array HOFs
 * (`aggregate`/`transform`) for SQL-side audio math.
 */
object G711Algo {
  val MuLawLut: Array[Int] =
    Array.tabulate(256)(graft.ext.Multimodal.G711Codec.mulawExpand)
  val ALawLut: Array[Int] =
    Array.tabulate(256)(graft.ext.Multimodal.G711Codec.alawExpand)

  def expand(codes: Array[Byte], mulaw: Boolean): ArrayData = {
    val lut = if (mulaw) MuLawLut else ALawLut
    val out = new Array[Int](codes.length)
    var i = 0
    while (i < codes.length) { out(i) = lut(codes(i) & 0xFF); i += 1 }
    new GenericArrayData(out)
  }
}

/** g711_expand(codes, 'mulaw'|'alaw') -> array<int> linear samples. */
case class G711Expand(child: Expression, mulaw: Boolean)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "g711_expand"

  override def nullSafeEval(v: Any): Any =
    G711Algo.expand(v.asInstanceOf[Array[Byte]], mulaw)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"org.apache.spark.sql.graft.G711Algo.expand($v, $mulaw)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object G711Functions {
  import org.apache.spark.sql.Column

  /** Expand G.711 code bytes to linear int samples ("mulaw" or "alaw"). */
  def g711_expand(codes: Column, law: String): Column = {
    require(law == "mulaw" || law == "alaw", s"law must be 'mulaw' or 'alaw', got '$law'")
    ColumnBridge.column(G711Expand(ColumnBridge.expression(codes), law == "mulaw"))
  }
}
