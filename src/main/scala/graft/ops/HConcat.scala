package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Horizontal concat (polars executors/hconcat.rs): zip two frames by row
  * position. Spark has no positional zip at the DataFrame level, so both
  * sides get a global row number along an explicit order — computed with the
  * range-partitioned scan in [[Distributed]] (NOT a keyless window) — and
  * join on it. Cost at scale: one range shuffle + totals pass per side plus
  * the zip join; when a real shared key exists, join on that instead.
  */
object HConcat {
  def byOrder(left: DataFrame, right: DataFrame,
              leftOrder: Column, rightOrder: Column): DataFrame = {
    val l = Distributed.withRowNumber(left, "__zip", Seq(leftOrder))
    val r = Distributed.withRowNumber(right, "__zip", Seq(rightOrder))
    l.join(r, Seq("__zip"), "full").drop("__zip")
  }
}
