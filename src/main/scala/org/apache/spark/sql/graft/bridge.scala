package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ⇄ Expression converters and the
  * session FunctionRegistry so graft can wrap its native Catalyst
  * expressions as user-facing Columns and SQL functions. Lives in an
  * `org.apache.spark.sql` subpackage purely for access; contains no logic.
  * (Same approach as every SparkSessionExtensions-based library that ships
  * custom expressions.) */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Idempotent function registration on a live session (the non-extensions
    * path; `GraftExtensions` covers session construction time). */
  def registerFunction(spark: SparkSession, id: FunctionIdentifier,
                       info: ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(id, info, builder)
}
