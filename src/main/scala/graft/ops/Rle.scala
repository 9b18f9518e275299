package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Run-length encoding ops (polars rle / rle_id,
  * crates/polars-ops/src/series/ops/rle.rs). Two window passes — a change
  * flag from lag(), then a running sum — because SQL forbids nesting one
  * window function inside another.
  */
object Rle {

  /** Adds `as` = 0-based run id that increments whenever `value` changes
    * along (partition, order). */
  def withRunId(df: DataFrame, value: Column, partition: Seq[Column],
                order: Seq[Column], as: String = "run_id"): DataFrame = {
    val w = (if (partition.nonEmpty) Window.partitionBy(partition: _*) else Window.partitionBy())
      .orderBy(order: _*)
    val flagged = df.withColumn("__chg",
      when(value <=> lag(value, 1).over(w), lit(0L)).otherwise(lit(1L)))
    flagged
      .withColumn(as,
        sum(col("__chg")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
      .drop("__chg")
  }

  /** polars rle(): collapse to one row per run: (value, run length, run id). */
  def rle(df: DataFrame, value: Column, partition: Seq[Column],
          order: Seq[Column]): DataFrame = {
    val withId = withRunId(df, value, partition, order)
    withId.groupBy((partition :+ col("run_id")): _*)
      .agg(first(value).as("value"), count(lit(1)).as("len"))
  }
}
