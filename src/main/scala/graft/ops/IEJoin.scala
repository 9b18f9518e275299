package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed inequality join (polars `join_where` with pure inequality
  * predicates; reference implements the IEJoin paper single-node,
  * `crates/polars-ops/src/frame/join/iejoin/`).
  *
  * Spark-first shape: a BroadcastNestedLoopJoin ships one ENTIRE side to
  * every task — the memory wall at 100 TB. Instead, grid-partition on the
  * first inequality's attribute (Okcan & Riedewald theta-join grid, pruned
  * by the IEJoin observation that for `a.x < b.x` only upper-triangle cells
  * can produce matches):
  *
  *   1. k range blocks from approx quantiles of BOTH sides' x (balanced);
  *   2. left block i fans out to cells {(i,j) : j ≥ i}, right block j to
  *      {(i,j) : i ≤ j} (mirrored for `>`): every candidate pair meets in
  *      EXACTLY one cell, and ~half the grid is pruned before it exists;
  *   3. one shuffle each side on cell id, then an ordinary EQUI-join on the
  *      cell id with the original predicates as residual join filters.
  *
  * Per-task memory is one (n/k × n/k) cell — bounded by k, no broadcast —
  * and the equi-join shape means AQE's skew-split applies to hot cells.
  * Replication factor is ≤ k per row (choose k ≈ √parallelism). Degenerate
  * single-value domains collapse to one cell (= the unavoidable cross
  * check) rather than failing.
  */
object IEJoin {

  /** Inner join on `lx op rx [AND residual]`. `op` ∈ {<, <=, >, >=};
    * `residual` may be any further predicate over both sides' columns
    * (lit(true) for none). Column names must be disjoint across sides,
    * as in any Spark join followed by by-name selection. */
  def join(left: DataFrame, right: DataFrame,
           lx: Column, op: String, rx: Column,
           residual: Column = lit(true), buckets: Int = 16): DataFrame = {
    require(Set("<", "<=", ">", ">=")(op), s"op must be an inequality, got '$op'")

    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val bounds = left.select(lx.cast("double").as("__graft_x"))
      .unionAll(right.select(rx.cast("double").as("__graft_x")))
      .na.drop()
      .stat.approxQuantile("__graft_x", probs, 0.001)
      .distinct.sorted
    val k = bounds.length + 1

    // block = #bounds <= x, as a codegen-friendly comparison chain
    def blk(c: Column): Column =
      bounds.foldLeft(lit(0)) { (acc, b) =>
        acc + when(c.cast("double") >= lit(b), 1).otherwise(0)
      }

    val lessLike = op.startsWith("<")
    // cell id = i * k + j for (left block i, right block j)
    val lcells = left.filter(lx.isNotNull)
      .withColumn("__graft_lb", blk(lx))
      .withColumn("__graft_cl", explode(
        if (lessLike) // j in [i, k): contiguous ids
          sequence(col("__graft_lb") * (k + 1), col("__graft_lb") * k + lit(k - 1))
        else          // j in [0, i]
          sequence(col("__graft_lb") * k, col("__graft_lb") * (k + 1))))
      .drop("__graft_lb")
    val rcells = right.filter(rx.isNotNull)
      .withColumn("__graft_rb", blk(rx))
      .withColumn("__graft_i", explode(
        if (lessLike) sequence(lit(0), col("__graft_rb"))   // i in [0, j]
        else sequence(col("__graft_rb"), lit(k - 1))))      // i in [j, k)
      .withColumn("__graft_cr", col("__graft_i") * k + col("__graft_rb"))
      .drop("__graft_i", "__graft_rb")

    val pred1 = op match {
      case "<"  => lx < rx
      case "<=" => lx <= rx
      case ">"  => lx > rx
      case ">=" => lx >= rx
    }
    lcells
      .join(rcells, col("__graft_cl") === col("__graft_cr") && pred1 && residual)
      .drop("__graft_cl", "__graft_cr")
  }
}
