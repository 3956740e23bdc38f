package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to the private[sql] Column<->Expression converters (Spark
  * 4 moved Column onto ColumnNode; classic.ExpressionUtils is the sanctioned
  * internal mapping). Only this object lives inside the spark namespace; all
  * engine code stays in graft.*. */
object Bridge {
  def column(e: Expression): Column     = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
