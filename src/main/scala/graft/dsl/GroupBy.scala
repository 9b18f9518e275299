package graft.dsl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Polars `group_by(...)` context. All aggs map to Spark's hash aggregate
  * (partial map-side combine + final after shuffle) — the distributed
  * equivalent of the reference's streaming partial/final aggregation
  * (crates/polars-stream/src/nodes/group_by.rs).
  *
  * Polars allows arbitrary expressions inside `.agg(...)`; the same holds
  * here because Spark agg accepts any Column over aggregate functions
  * (e.g. `sum(when(cond, x))` for `col(x).filter(cond).sum()`,
  * `slice(sort_array(collect_list(x)), 1, 3)` for `col(x).sort().head(3)`).
  */
final class GroupBy(df: DataFrame, keys: Seq[Column]) {

  def agg(exprs: Column*): LazyFrame =
    LazyFrame(df.groupBy(keys: _*).agg(exprs.head, exprs.tail: _*))

  /** polars group_by(maintain_order=true).agg(...): result rows in order of
    * each group's first appearance along `orderCol`. Spark's hash aggregate
    * is unordered, so the order is reconstructed from min(orderCol) per
    * group — one extra tiny agg column plus a sort of the (small) result,
    * not a sort of the input. */
  def aggOrdered(orderCol: Column, exprs: Column*): LazyFrame =
    LazyFrame(df.groupBy(keys: _*)
      .agg(exprs.head, (exprs.tail :+ min(orderCol).as("__first_seen")): _*)
      .orderBy(col("__first_seen"))
      .drop("__first_seen"))

  def count(name: String = "count"): LazyFrame =
    LazyFrame(df.groupBy(keys: _*).agg(org.apache.spark.sql.functions.count(lit(1)).as(name)))

  /** polars group_by().head(n): per-group top-n by explicit order. */
  def head(n: Int, orderBy: Column*): LazyFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys: _*).orderBy(orderBy: _*)
    LazyFrame(df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n).drop("__rn"))
  }

  /** polars group_by().tail(n): per-group last-n by explicit order. */
  def tail(n: Int, orderBy: Column*): LazyFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys: _*).orderBy(orderBy.map(_.desc): _*)
    LazyFrame(df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n).drop("__rn"))
  }

  /** polars group_by().agg(col(x).implode()) — group values to a list with a
    * deterministic (sorted) order, since Spark collect order is unstable. */
  def implodeSorted(valueCol: String, as: String): LazyFrame =
    LazyFrame(df.groupBy(keys: _*).agg(sort_array(collect_list(col(valueCol))).as(as)))

  /** General fallback for arbitrary per-group computation
    * (polars group_by().map_groups) — prefer agg() whenever expressible. */
  def mapGroups[K: org.apache.spark.sql.Encoder, T: org.apache.spark.sql.Encoder](
      keyFn: org.apache.spark.sql.Row => K)(fn: (K, Iterator[org.apache.spark.sql.Row]) => T): org.apache.spark.sql.Dataset[T] =
    df.groupByKey(keyFn).mapGroups(fn)

  /** polars group_by().apply returning a frame per group (any row count):
    * the fully general UDTF-shaped escape hatch. One shuffle on the key;
    * each group is streamed to the function, not materialized by Spark, so
    * memory is bounded by what `fn` itself retains. */
  def flatMapGroups[K: org.apache.spark.sql.Encoder, T: org.apache.spark.sql.Encoder](
      keyFn: org.apache.spark.sql.Row => K)(
      fn: (K, Iterator[org.apache.spark.sql.Row]) => IterableOnce[T]): org.apache.spark.sql.Dataset[T] =
    df.groupByKey(keyFn).flatMapGroups((k: K, it: Iterator[org.apache.spark.sql.Row]) => fn(k, it).iterator)
}
