package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ⇄ Expression converters so graft
  * can wrap its native Catalyst expressions as user-facing Columns. Lives in
  * an `org.apache.spark.sql` subpackage purely for access; contains no logic.
  * (Same approach as every SparkSessionExtensions-based library that ships
  * custom expressions.) */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
