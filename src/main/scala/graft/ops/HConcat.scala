package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Horizontal concat (polars executors/hconcat.rs): zip two frames by row
  * position. Spark has no positional zip at the DataFrame level, so both
  * sides get a row_number over an explicit order and join on it. One shuffle
  * per side (the global row_number is a single-partition sort at small scale;
  * at 100 TB callers should zip on a real key instead — this op exists for
  * API parity).
  */
object HConcat {
  def byOrder(left: DataFrame, right: DataFrame,
              leftOrder: Column, rightOrder: Column): DataFrame = {
    val l = left.withColumn("__zip", row_number().over(Window.orderBy(leftOrder)))
    val r = right.withColumn("__zip", row_number().over(Window.orderBy(rightOrder)))
    l.join(r, Seq("__zip"), "full").drop("__zip")
  }
}
