package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.dsl.LazyFrame
import graft.queries.util._
import graft.{functions => gf}

/** Window-function battery (SURVEY §2.6): rank family, shift/diff, cumulative
  * aggregates, fixed and time-based rolling windows, fills, rle, top-k per
  * group. Every ORDER BY inside a window carries a unique tie-break column so
  * both engines resolve ties identically.
  */
object QueriesWindow {

  private val wCust = Window.partitionBy(col("o_custkey"))
    .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
  private val wUser = Window.partitionBy(col("user_id"))
    .orderBy(col("ts").asc, col("event_id").asc)

  val queries: Map[String, Q] = Map(
    "win_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      t(s, d, "customer").select(
        col("c_custkey"), col("c_nationkey"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        row_number().over(w).as("rn"),
        ntile(4).over(w).as("quartile"),
        // integer-scaled round: round(x, 4) diverged at sf1 on exact
        // half-ties (Spark HALF_UPs the shortest decimal repr, DuckDB
        // rounds x*1e4 in binary — 0.25375 → .2538 vs .2537); scale-0
        // round agrees between the engines on every double
        (round(percent_rank().over(w) * 10000) / 10000).as("prnk"),
        (round(cume_dist().over(w) * 10000) / 10000).as("cdist"))
        .orderBy(col("c_custkey"))
    }),

    "win_shift_diff" -> ((s, d) =>
      t(s, d, "events").filter(col("user_id") <= 20).select(
        col("event_id"), col("user_id"),
        round(lag(col("value"), 1).over(wUser), 4).as("prev_value"),
        round(lead(col("value"), 1).over(wUser), 4).as("next_value"),
        round(gf.diff(col("value"), wUser), 4).as("diff"),
        round(gf.pctChange(col("value"), wUser), 4).as("pct_change"))
        .orderBy(col("event_id"))),

    "win_cumulative" -> ((s, d) =>
      t(s, d, "orders").filter(col("o_custkey") <= 100).select(
        col("o_orderkey"), col("o_custkey"),
        round(gf.cumSum(col("o_totalprice"), wCust), 2).as("cum_spend"),
        round(gf.cumMax(col("o_totalprice"), wCust), 2).as("cum_max"),
        round(gf.cumMin(col("o_totalprice"), wCust), 2).as("cum_min"),
        gf.cumCount(col("o_orderkey"), wCust).as("cum_n"))
        .orderBy(col("o_orderkey"))),

    "win_rolling_rows" -> ((s, d) =>
      t(s, d, "events").filter(col("user_id") <= 20).select(
        col("event_id"), col("user_id"),
        round(avg(col("value")).over(wUser.rowsBetween(-2, 0)), 4).as("avg3"),
        round(sum(col("value")).over(wUser.rowsBetween(-2, 0)), 4).as("sum3"),
        round(min(col("value")).over(wUser.rowsBetween(-2, 0)), 4).as("min3"))
        .orderBy(col("event_id"))),

    // time-based rolling (polars rolling_*_by): RANGE over epoch micros.
    "win_rolling_time" -> ((s, d) => {
      val wt = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(-3600L * 1000000L, 0)
      t(s, d, "events").filter(col("user_id") <= 20).select(
        col("event_id"), col("user_id"),
        round(sum(col("value")).over(wt), 4).as("sum_1h"),
        count(lit(1)).over(wt).as("n_1h"))
        .orderBy(col("event_id"))
    }),

    // forward fill over synthetic nulls (error rows hide their value).
    "win_fill_forward" -> ((s, d) => {
      val base = t(s, d, "events").filter(col("user_id") <= 20)
        .withColumn("v", when(col("event_type") === "error", lit(null)).otherwise(col("value")))
      base.select(col("event_id"), col("user_id"),
        round(gf.forwardFill(col("v"), wUser), 4).as("filled"),
        round(gf.backwardFill(col("v"), wUser), 4).as("bfilled"))
        .orderBy(col("event_id"))
    }),

    // run-length id over the event_type sequence per user.
    "win_rle_id" -> ((s, d) =>
      graft.ops.Rle.withRunId(
        t(s, d, "events").filter(col("user_id") <= 10),
        col("event_type"), Seq(col("user_id")), Seq(col("ts"), col("event_id")))
        .select(col("event_id"), col("user_id"), col("event_type"), col("run_id"))
        .orderBy(col("event_id"))),

    // top-2 orders per customer by price (h2oai q8 shape).
    "win_topk_group" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"), col("rn"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // is_first_distinct along event time.
    "win_first_distinct" -> ((s, d) =>
      t(s, d, "events").filter(col("user_id") <= 10).select(
        col("event_id"),
        gf.isFirstDistinct(col("event_type"),
          struct(col("ts"), col("event_id"))).as("is_first"))
        .orderBy(col("event_id"))),

    // global aggregate as window (polars .sum().over() with no partition):
    // the total comes from a broadcast aggregate, not a keyless window —
    // same values, but the plan distributes at any scale
    "win_global_share" -> ((s, d) => {
      val spend = t(s, d, "orders").filter(col("o_custkey") <= 100)
        .groupBy(col("o_custkey")).agg(sum(col("o_totalprice")).as("spend"))
      val total = spend.agg(sum(col("spend")).as("__tot"))
      spend.crossJoin(broadcast(total))
        .select(col("o_custkey"),
          round(col("spend"), 2).as("spend"),
          round(col("spend") / col("__tot"), 6).as("share"))
        .orderBy(col("o_custkey"))
    })
  )

  val oracle: Map[String, String] = Map(
    "win_rank" ->
      """SELECT c_custkey, c_nationkey,
        | (rank() OVER w)::INT AS rnk, (dense_rank() OVER w)::INT AS drnk,
        | (row_number() OVER w)::INT AS rn, (ntile(4) OVER w)::INT AS quartile,
        | round(percent_rank() OVER w * 10000) / 10000 AS prnk,
        | round(cume_dist() OVER w * 10000) / 10000 AS cdist
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "win_shift_diff" ->
      """SELECT event_id, user_id,
        | round(lag(value) OVER w, 4) AS prev_value,
        | round(lead(value) OVER w, 4) AS next_value,
        | round(value - lag(value) OVER w, 4) AS diff,
        | round(value / lag(value) OVER w - 1, 4) AS pct_change
        |FROM events WHERE user_id <= 20
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,

    "win_cumulative" ->
      """SELECT o_orderkey, o_custkey,
        | round(sum(o_totalprice) OVER w, 2) AS cum_spend,
        | round(max(o_totalprice) OVER w, 2) AS cum_max,
        | round(min(o_totalprice) OVER w, 2) AS cum_min,
        | count(o_orderkey) OVER w AS cum_n
        |FROM orders WHERE o_custkey <= 100
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,

    "win_rolling_rows" ->
      """SELECT event_id, user_id,
        | round(avg(value) OVER w, 4) AS avg3,
        | round(sum(value) OVER w, 4) AS sum3,
        | round(min(value) OVER w, 4) AS min3
        |FROM events WHERE user_id <= 20
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "win_rolling_time" ->
      """SELECT event_id, user_id,
        | round(sum(value) OVER w, 4) AS sum_1h,
        | count(*) OVER w AS n_1h
        |FROM events WHERE user_id <= 20
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "win_fill_forward" ->
      """SELECT event_id, user_id,
        | round(last_value(v IGNORE NULLS) OVER
        |  (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS filled,
        | round(first_value(v IGNORE NULLS) OVER
        |  (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), 4) AS bfilled
        |FROM (SELECT event_id, user_id, ts,
        |  CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
        |  FROM events WHERE user_id <= 20)
        |ORDER BY event_id""".stripMargin,

    "win_rle_id" ->
      """SELECT event_id, user_id, event_type,
        | CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - 1 AS run_id
        |FROM (SELECT event_id, user_id, ts, event_type,
        |  CASE WHEN event_type IS NOT DISTINCT FROM lag(event_type)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |   THEN 0 ELSE 1 END AS chg
        |  FROM events WHERE user_id <= 10)
        |ORDER BY event_id""".stripMargin,

    "win_topk_group" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice,2) AS o_totalprice, rn::INT AS rn
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey
        |   ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders)
        |WHERE rn <= 2 ORDER BY o_custkey, rn""".stripMargin,

    "win_first_distinct" ->
      """SELECT event_id,
        | row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) = 1 AS is_first
        |FROM events WHERE user_id <= 10
        |ORDER BY event_id""".stripMargin,

    "win_global_share" ->
      """WITH s AS (SELECT o_custkey, sum(o_totalprice) AS spend
        | FROM orders WHERE o_custkey <= 100 GROUP BY 1)
        |SELECT o_custkey, round(spend,2) AS spend,
        | round(spend / sum(spend) OVER (), 6) AS share
        |FROM s ORDER BY o_custkey""".stripMargin
  )
}
