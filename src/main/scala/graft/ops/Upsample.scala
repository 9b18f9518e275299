package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** polars upsample (crates/polars-time/src/upsample.rs): densify a time
  * series to a regular grid, then left-join the observations back. The grid
  * is generated per group with `sequence()` + explode — distributed, no
  * driver loop.
  */
object Upsample {
  /** every: an interval expression e.g. expr`INTERVAL 1 HOUR` via
    * `expr("interval 1 hour")`. */
  def upsample(df: DataFrame, ts: String, everySql: String, by: Seq[String]): DataFrame = {
    val grid = df.groupBy(by.map(col): _*)
      .agg(min(col(ts)).as("__lo"), max(col(ts)).as("__hi"))
      .select(by.map(col) :+
        explode(sequence(col("__lo"), col("__hi"), expr(everySql))).as(ts): _*)
    grid.join(df, by :+ ts, "left")
  }
}
