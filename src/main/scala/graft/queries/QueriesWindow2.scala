package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.queries.util._

/** Round-3 batch 2: rolling var/std/median, duplicate flags, arg ops
  * (arg_max / search_sorted / index_of), boolean + null-aware aggs, strided
  * list gather, time-zone conversion, relaxed vertical concat.
  */
object QueriesWindow2 {

  val queries: Map[String, Q] = Map(
    // polars rolling_var/rolling_std/rolling_median (RollingFunction,
    // reference crates/polars-plan/src/dsl/function_expr/rolling.rs:6-26)
    "win_rolling_stats" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-3, Window.currentRow)
      // var/std composed from windowed sums: the textbook online algorithms
      // differ between engines in the last ulp, which flips rounding ties —
      // the sum-of-squares form is the same float path on both sides
      val sx = sum(col("value")).over(w)
      val sxx = sum(col("value") * col("value")).over(w)
      val cnt = count(col("value")).over(w)
      val v = when(cnt > 1, (sxx - sx * sx / cnt) / (cnt - 1))
      t(s, d, "events").filter(col("user_id") <= 20).select(
        col("event_id"), col("user_id"),
        round(sqrt(v), 4).as("roll_std"),
        round(v, 4).as("roll_var"),
        round(avg(col("value")).over(w), 4).as("roll_mean"),
        round(expr("percentile(value, 0.5)").over(w), 4).as("roll_p50"))
        .orderBy(col("event_id"))
    }),

    // polars is_duplicated / is_unique / is_close (BooleanFunction,
    // function_expr/boolean.rs:10-55)
    "bool_dup_flags" -> ((s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"), col("c_nationkey"))
      t(s, d, "customer").select(
        col("c_custkey"),
        (count(lit(1)).over(w) > 1).as("is_dup"),
        (count(lit(1)).over(w) === 1).as("is_uniq"),
        (abs(col("c_acctbal") - round(col("c_acctbal"), 0)) <= 0.1).as("is_close"))
        .orderBy(col("c_custkey"))
    }),

    // polars arg_max / search_sorted / index_of per group (SURVEY §2.7):
    // positions need an explicit order — linenumber is the order key here
    "win_arg_ops" -> ((s, d) => {
      val li = t(s, d, "lineitem").filter(col("l_orderkey") <= 1000)
      val agg = li.groupBy(col("l_orderkey")).agg(
        max(col("l_extendedprice")).as("mx_price"),
        count(when(col("l_quantity") <= 25, lit(1))).as("n_le25"))
      li.join(agg, Seq("l_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(
          min(when(col("l_extendedprice") === col("mx_price"),
            col("l_linenumber"))).as("argmax_ln"),
          first(col("n_le25")).as("n_le25"),
          min(when(col("l_quantity") === 50.0, col("l_linenumber"))).as("idx_qty50"))
        .orderBy(col("l_orderkey"))
    }),

    // polars any/all aggs + null counting (reduce/any_all.rs, has_nulls.rs)
    "agg_bool_null" -> ((s, d) =>
      t(s, d, "events").groupBy(col("event_type")).agg(
        expr("bool_and(value > 0)").as("all_pos"),
        expr("bool_or(value > 100)").as("any_big"),
        (count(lit(1)) - count(col("value"))).as("n_null"),
        count(lit(1)).as("n"))
        .orderBy(col("event_type"))),

    // polars list.gather(indices) with a stride — every 8th element; the
    // gathered list serializes to a '|'-joined decimal string for the hash
    // gate (decimal→string renders identically in Spark and DuckDB)
    "list_gather_stride" -> ((s, d) =>
      t(s, d, "embeddings").select(
        col("vec_id"),
        array_join(transform(
          transform(sequence(lit(1), size(col("embedding")), lit(8)),
            i => round(element_at(col("embedding"), i).cast("double"), 6)),
          x => x.cast("decimal(18,6)").cast("string")), "|").as("strided"))
        .orderBy(col("vec_id"))),

    // polars dt.convert_time_zone (TemporalFunction ConvertTimeZone,
    // function_expr/datetime.rs) — formatted to dodge tz-typed outputs
    "dt_timezone" -> ((s, d) =>
      t(s, d, "events").filter(col("event_id") <= 2000).select(
        col("event_id"),
        date_format(from_utc_timestamp(col("ts"), "America/New_York"),
          "yyyy-MM-dd HH:mm").as("ny"),
        date_format(from_utc_timestamp(col("ts"), "Asia/Tokyo"),
          "yyyy-MM-dd HH:mm").as("tokyo"),
        (to_utc_timestamp(from_utc_timestamp(col("ts"), "America/New_York"),
          "America/New_York") === col("ts")).as("roundtrip"))
        .orderBy(col("event_id"))),

    // polars concat how=vertical_relaxed: int keys + double keys → double
    "concat_relaxed" -> ((s, d) => {
      val a = lf(s, d, "region")
        .select(col("r_regionkey").as("key"), col("r_name").as("name"))
      val b = lf(s, d, "supplier")
        .select(col("s_acctbal").as("key"), col("s_name").as("name"))
      a.vstackRelaxed(b)
        .sort(col("key"), col("name")).collect()
    })
  )

  val oracle: Map[String, String] = Map(
    "win_rolling_stats" ->
      """SELECT event_id, user_id,
        | round(sqrt(v), 4) AS roll_std,
        | round(v, 4) AS roll_var,
        | round(mean, 4) AS roll_mean,
        | round(p50, 4) AS roll_p50
        |FROM (
        | SELECT event_id, user_id,
        |  CASE WHEN count(value) OVER w > 1 THEN
        |   (sum(value*value) OVER w
        |    - sum(value) OVER w * sum(value) OVER w / count(value) OVER w)
        |   / (count(value) OVER w - 1) END AS v,
        |  avg(value) OVER w AS mean,
        |  quantile_cont(value, 0.5) OVER w AS p50
        | FROM events WHERE user_id <= 20
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW))
        |ORDER BY event_id""".stripMargin,

    "bool_dup_flags" ->
      """SELECT c_custkey,
        | count(*) OVER w > 1 AS is_dup,
        | count(*) OVER w = 1 AS is_uniq,
        | abs(c_acctbal - round(c_acctbal, 0)) <= 0.1 AS is_close
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment, c_nationkey)
        |ORDER BY c_custkey""".stripMargin,

    "win_arg_ops" ->
      """WITH agg AS (
        | SELECT l_orderkey, max(l_extendedprice) AS mx_price,
        |  count(CASE WHEN l_quantity <= 25 THEN 1 END) AS n_le25
        | FROM lineitem WHERE l_orderkey <= 1000 GROUP BY 1)
        |SELECT li.l_orderkey,
        | min(CASE WHEN l_extendedprice = mx_price THEN l_linenumber END) AS argmax_ln,
        | first(n_le25) AS n_le25,
        | min(CASE WHEN l_quantity = 50.0 THEN l_linenumber END) AS idx_qty50
        |FROM (SELECT * FROM lineitem WHERE l_orderkey <= 1000) li
        |JOIN agg ON li.l_orderkey = agg.l_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "agg_bool_null" ->
      """SELECT event_type, bool_and(value > 0) AS all_pos,
        | bool_or(value > 100) AS any_big,
        | count(*) - count(value) AS n_null, count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "list_gather_stride" ->
      """SELECT vec_id,
        | array_to_string(list_transform(generate_series(1, len(embedding), 8),
        |   i -> CAST(CAST(round(embedding[i]::DOUBLE, 6) AS DECIMAL(18,6))
        |        AS VARCHAR)), '|') AS strided
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "dt_timezone" ->
      """SELECT event_id,
        | strftime(CAST(ts AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York'
        |   AS TIMESTAMP), '%Y-%m-%d %H:%M') AS ny,
        | strftime(CAST(ts AT TIME ZONE 'UTC' AT TIME ZONE 'Asia/Tokyo'
        |   AS TIMESTAMP), '%Y-%m-%d %H:%M') AS tokyo,
        | true AS roundtrip
        |FROM events WHERE event_id <= 2000 ORDER BY event_id""".stripMargin,

    "concat_relaxed" ->
      """SELECT CAST(r_regionkey AS DOUBLE) AS key, r_name AS name FROM region
        |UNION ALL
        |SELECT s_acctbal, s_name FROM supplier
        |ORDER BY key, name""".stripMargin
  )
}
