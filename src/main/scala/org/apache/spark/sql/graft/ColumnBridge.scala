package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridge into `private[sql]` Column <-> Catalyst Expression conversion
 * (Spark 4.x moved Column onto ColumnNode; ExpressionUtils is the classic
 * back-door). Living under `org.apache.spark.sql` grants package access —
 * the standard pattern for third-party Catalyst extension libraries.
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
