package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Jaro and Jaro-Winkler string similarity (Winkler 1990, "String comparator
 * metrics and enhanced decision rules in the Fellegi-Sunter model of record
 * linkage") as codegen scalar expressions — the record-linkage scorer that
 * complements the edit-distance PassJoin ([[graft.operators.FuzzyJoin]]):
 * Jaro-Winkler favors shared prefixes, the natural metric for names/titles.
 *
 * Semantics mirror the rapidfuzz reference implementation (the one DuckDB
 * wraps), including evaluation ORDER of the floating-point combination, so
 * the doubles are reproducible across engines:
 *   jaro = (m/|a| + m/|b| + (m - floor(t/2))/m) / 3       (0 when m = 0)
 *   jw   = jaro > 0.7 ? jaro + prefix * 0.1 * (1 - jaro) : jaro, prefix <= 4
 * Matching window is floor(max/2) - 1 (>= 0); an empty side scores 0.
 * Comparison is per UTF-16 code unit on the JVM — identical to byte-wise
 * for ASCII inputs; document non-ASCII divergence rather than decoding.
 */
object JaroWinklerAlgo {

  def jaro(a: UTF8String, b: UTF8String): Double = {
    val s = a.toString
    val t = b.toString
    val la = s.length
    val lb = t.length
    // either-empty (including both-empty) scores 0 — the DuckDB/guarded
    // convention, diverging from rapidfuzz's both-empty = 1: an empty name
    // "perfectly matching" another empty name is the wrong linkage signal
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val flagsA = new Array[Boolean](la)
    val flagsB = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!flagsB(j) && t.charAt(j) == s.charAt(i)) {
          flagsA(i) = true
          flagsB(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // half-transpositions: flagged chars out of order, halved (floor)
    var halfT = 0
    var j = 0
    i = 0
    while (i < la) {
      if (flagsA(i)) {
        while (!flagsB(j)) j += 1
        if (s.charAt(i) != t.charAt(j)) halfT += 1
        j += 1
      }
      i += 1
    }
    val trans = halfT / 2
    var sim = 0.0
    sim += m.toDouble / la.toDouble
    sim += m.toDouble / lb.toDouble
    sim += (m.toDouble - trans.toDouble) / m.toDouble
    sim / 3.0
  }

  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val j = jaro(a, b)
    if (j > 0.7) {
      val s = a.toString
      val t = b.toString
      val max = math.min(4, math.min(s.length, t.length))
      var prefix = 0
      while (prefix < max && s.charAt(prefix) == t.charAt(prefix)) prefix += 1
      j + prefix.toDouble * 0.1 * (1.0 - j)
    } else j
  }
}

case class JaroSimilarity(left: Expression, right: Expression)
  extends BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def prettyName: String = "jaro_similarity"
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerAlgo.jaro(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
    : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val algo = JaroWinklerAlgo.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, (a, b) => s"$algo.jaro($a, $b)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class JaroWinklerSimilarity(left: Expression, right: Expression)
  extends BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def prettyName: String = "jaro_winkler_similarity"
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerAlgo.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
    : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val algo = JaroWinklerAlgo.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, (a, b) => s"$algo.jaroWinkler($a, $b)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object JaroFunctions {
  def jaro_similarity(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column)
    : org.apache.spark.sql.Column =
    ColumnBridge.column(JaroSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def jaro_winkler_similarity(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column)
    : org.apache.spark.sql.Column =
    ColumnBridge.column(JaroWinklerSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
