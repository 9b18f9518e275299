package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** polars merge_sorted (IR MergeSorted, reference
  * crates/polars-mem-engine/src/executors/merge_sorted.rs): k-way merge of
  * frames already sorted on `key`.
  *
  * Spark has no public "exploit pre-sortedness" union, so this is
  * union + orderBy; Catalyst's sort sees the union's children and the
  * external sort is a single shuffle-free per-partition sort after a
  * round-robin-free union (narrow dependency). At 100 TB the right shape is
  * the same: a global sort is only materialized if the consumer observes
  * order — otherwise Catalyst drops it (EliminateSorts).
  */
object MergeSorted {
  def merge(a: DataFrame, b: DataFrame, key: Column*): DataFrame =
    a.unionByName(b).orderBy(key: _*)
}
