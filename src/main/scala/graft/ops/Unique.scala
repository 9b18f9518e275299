package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** polars unique(keep=first/last/none) — reference `UniqueKeepStrategy`
  * (crates/polars-core/src/frame/mod.rs:60-70). Spark's dropDuplicates is
  * keep=any; first/last need an explicit order column (SURVEY §7.1), none is
  * a group-count filter. All variants are single-shuffle on the subset keys.
  */
object Unique {

  def keep(df: DataFrame, subset: Seq[String], keep: String, orderCol: Column): DataFrame =
    keep match {
      case "any" =>
        if (subset.isEmpty) df.dropDuplicates() else df.dropDuplicates(subset)
      case "first" | "last" =>
        val ord = if (keep == "first") orderCol.asc else orderCol.desc
        val w = Window.partitionBy(subset.map(col): _*).orderBy(ord)
        df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
      case "none" =>
        val w = Window.partitionBy(subset.map(col): _*)
        df.withColumn("__cnt", count(lit(1)).over(w)).filter(col("__cnt") === 1).drop("__cnt")
      case other => throw new IllegalArgumentException(s"unknown keep strategy: $other")
    }
}
