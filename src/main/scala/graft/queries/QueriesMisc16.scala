package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import util._

/** Round-13 batch: the last two API micro-tails from the r12 verdict —
  * rolling_rank_by (py-polars/src/polars/expr/expr.py rolling rank over a
  * VALUE window, the rank sibling of win_rolling_median_by's RANGE-frame
  * median) and bottom_k_by (expr.py, the ascending dual of top_k_by).
  */
object QueriesMisc16 {

  val queries: Map[String, Q] = Map(

    // rolling_rank_by: the rank (method="min") of the current row's value
    // among all values in (v − 50000.00, v] of its group — the reference's
    // default closed="right" window (rolling_rank_by in expr.py: the frame
    // is (t − window_size, t], EXCLUSIVE lower bound), expressed on
    // integer-cent keys as RANGE BETWEEN (window−1) PRECEDING AND CURRENT
    // ROW. A RANGE frame gives the value window; min-rank = frame count −
    // peer (tie) count + 1 — two window counts over the SAME
    // partitioning+ordering, so Spark plans ONE Window operator (one
    // shuffle, one sort), nothing per-row quadratic. Integer-cent keys make
    // the frame bounds exact cross-engine. The bottom_k_by tail rides the
    // same key: ascending TakeOrderedAndProject on an expression key
    // (per-partition heap + driver k-merge, never a global sort — same
    // plan family PlanSpec pins for bottomK/topK).
    "win_rolling_rank_by" -> ((s, d) => {
      val cents = round(col("o_totalprice") * 100, 0).cast("long")
      val base = t(s, d, "orders").filter(col("o_custkey") <= 500)
        .select(col("o_orderkey"), col("o_custkey"), cents.as("cents"))
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("cents"))
        .rangeBetween(-(5000000L - 1), 0L)
      val peers = Window.partitionBy(col("o_custkey")).orderBy(col("cents"))
        .rangeBetween(0L, 0L)
      val ranked = base.select(lit("rank").as("tag"),
        col("o_orderkey").as("k"), col("o_custkey").as("grp"),
        (count(lit(1)).over(w) - count(lit(1)).over(peers) + 1).as("v"))
      val bottomBy = lf(s, d, "customer")
        .bottomK(10, length(col("c_name")) * col("c_acctbal"), col("c_custkey"))
        .select(lit("bottom_by").as("tag"), col("c_custkey").as("k"),
          lit(null).cast("long").as("grp"),
          round(length(col("c_name")) * col("c_acctbal") * 100).cast("long")
            .as("v"))
      ranked.unionAll(bottomBy.df).orderBy(col("tag"), col("k"))
    })
  )

  val oracle: Map[String, String] = Map(
    "win_rolling_rank_by" ->
      """WITH t AS (
        | SELECT o_orderkey, o_custkey,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        | FROM orders WHERE o_custkey <= 500),
        |r AS (
        | SELECT 'rank' AS tag, o_orderkey AS k, o_custkey AS grp,
        |  count(*) OVER (PARTITION BY o_custkey ORDER BY cents
        |    RANGE BETWEEN 4999999 PRECEDING AND CURRENT ROW)
        |  - count(*) OVER (PARTITION BY o_custkey ORDER BY cents
        |    RANGE BETWEEN CURRENT ROW AND CURRENT ROW) + 1 AS v
        | FROM t),
        |b AS (
        | SELECT 'bottom_by' AS tag, c_custkey AS k, CAST(NULL AS BIGINT) AS grp,
        |  CAST(round(length(c_name) * c_acctbal * 100) AS BIGINT) AS v
        | FROM customer ORDER BY length(c_name) * c_acctbal, c_custkey LIMIT 10)
        |SELECT * FROM r UNION ALL SELECT * FROM b ORDER BY tag, k""".stripMargin
  )
}
