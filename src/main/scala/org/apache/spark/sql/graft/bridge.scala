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

  /** Eager ColumnNode → catalyst conversion. `expression` defers via a lazy
    * `ColumnNodeExpression` wrapper, which the analyzer only unwraps at plan
    * roots — an expression RETURNED FROM a FunctionRegistry builder keeps the
    * wrapper into codegen and dies there if it contains e.g. a `Column.fn`
    * UnresolvedFunction node. This converts the whole tree up front; nested
    * unresolved functions become plain catalyst UnresolvedFunction, which the
    * fixed-point analyzer resolves normally. */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Idempotent function registration on a live session (the non-extensions
    * path; `GraftExtensions` covers session construction time). */
  def registerFunction(spark: SparkSession, id: FunctionIdentifier,
                       info: ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(id, info, builder)
}
