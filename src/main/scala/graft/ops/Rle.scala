package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Run-length encoding ops (polars rle / rle_id,
  * crates/polars-ops/src/series/ops/rle.rs). Two window passes — a change
  * flag from lag(), then a running sum — because SQL forbids nesting one
  * window function inside another.
  *
  * With partition keys both passes are ordinary keyed windows (one shuffle).
  * Keyless, a bare `Window.orderBy` would be a single task; instead the
  * frame gets a distributed global row number ([[Distributed.withRowNumber]]),
  * the lag comes from an equi-join on rn−1, and the running sum of change
  * flags is a distributed prefix sum — every stage shuffle-bounded.
  */
object Rle {

  /** Adds `as` = 0-based run id that increments whenever `value` changes
    * along (partition, order). */
  def withRunId(df: DataFrame, value: Column, partition: Seq[Column],
                order: Seq[Column], as: String = "run_id"): DataFrame =
    if (partition.nonEmpty) {
      val w = Window.partitionBy(partition: _*).orderBy(order: _*)
      // presence flag guards the first row: a null first value must start
      // run 0, not match the null lag (null <=> null is true) — keeps the
      // keyed and keyless branches in agreement
      val flagged = df.withColumn("__chg",
        when(lag(lit(1), 1).over(w).isNull, lit(1L))
          .otherwise(when(value <=> lag(value, 1).over(w), lit(0L)).otherwise(lit(1L))))
      flagged
        .withColumn(as,
          sum(col("__chg")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
        .drop("__chg")
    } else {
      val numbered = Distributed.withRowNumber(df, "__rn", order)
      val prev = numbered.select((col("__rn") + 1).as("__rn"), value.as("__prev"))
      val flagged = numbered.join(prev, Seq("__rn"), "left")
        .withColumn("__chg",
          when(col("__rn") > 1 && value <=> col("__prev"), lit(0L)).otherwise(lit(1L)))
        .drop("__prev")
      Distributed.withPrefixSum(flagged, col("__chg"), Seq(col("__rn")), as)
        .withColumn(as, col(as) - 1)
        .drop("__chg", "__rn")
    }

  /** polars rle(): collapse to one row per run: (value, run length, run id). */
  def rle(df: DataFrame, value: Column, partition: Seq[Column],
          order: Seq[Column]): DataFrame = {
    val withId = withRunId(df, value, partition, order)
    withId.groupBy((partition :+ col("run_id")): _*)
      .agg(first(value).as("value"), count(lit(1)).as("len"))
  }
}
