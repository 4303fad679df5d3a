package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark's private[sql] Column <-> Expression conversions
  * (org.apache.spark.sql.classic.ExpressionUtils). Lives under
  * org.apache.spark.sql so the access modifier admits it — the standard
  * pattern for Catalyst extensions built outside the Spark tree. */
object Bridge {
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
}
