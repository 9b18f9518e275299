package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.dsl.LazyFrame
import graft.queries.util._
import graft.{functions => gf}

/** Second-wave coverage: hopping windows, upsample, interpolation, cum_prod,
  * value_counts, one-hot, en/decoding, calendar parts, diagonal concat, and
  * the SQL frontend (spark.sql passthrough).
  */
object QueriesExtra {

  val queries: Map[String, Q] = Map(
    // hopping window: 1h period sliding every 30min — each row lands in 2.
    "agg_dynamic_hop" -> ((s, d) =>
      lf(s, d, "events")
        .groupByDynamic(col("ts"), every = "30 minutes", period = Some("1 hour"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
        .sort(col("_window_start")).collect()
        .select(col("_window_start"), col("n"), col("sum_value"))),

    "upsample_grid" -> ((s, d) => {
      val ev = t(s, d, "events").filter(col("user_id") <= 5)
        .select(col("user_id"), col("ts"), col("value"))
      val up = graft.ops.Upsample.upsample(ev, "ts", "interval 30 minutes", Seq("user_id"))
      up.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_grid"), count(col("value")).as("n_obs"))
        .orderBy(col("user_id"))
    }),

    // linear interpolation of interior nulls along event order.
    "win_interpolate" -> ((s, d) => {
      val base = t(s, d, "events").filter(col("user_id") <= 10)
        .withColumn("v", when(col("event_type") === "error", lit(null)).otherwise(col("value")))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))))
      val w = Window.partitionBy(col("user_id")).orderBy(col("rn"))
      base.select(col("event_id"), col("user_id"),
        round(gf.interpolateLinear(col("v"), col("rn"), w), 6).as("interp"))
        .orderBy(col("event_id"))
    }),

    // cum_prod via exp∘sum∘log (identical float path on both engines).
    "win_cumprod" -> ((s, d) => {
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"))
      t(s, d, "lineitem").filter(col("l_orderkey") <= 500).select(
        col("l_orderkey"), col("l_linenumber"),
        round(gf.cumProdPositive(lit(1.0) + col("l_discount"), w), 8).as("growth"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    "misc_value_counts" -> ((s, d) => {
      val n = t(s, d, "orders").count()
      t(s, d, "orders").groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .withColumn("proportion", round(col("n") / lit(n.toDouble), 6))
        .orderBy(col("n").desc, col("o_orderpriority"))
    }),

    "misc_to_dummies" -> ((s, d) =>
      t(s, d, "lineitem").filter(col("l_orderkey") <= 1000).select(
        col("l_orderkey"), col("l_linenumber"),
        when(col("l_returnflag") === "A", 1).otherwise(0).as("rf_A"),
        when(col("l_returnflag") === "N", 1).otherwise(0).as("rf_N"),
        when(col("l_returnflag") === "R", 1).otherwise(0).as("rf_R"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    "str_encode" -> ((s, d) =>
      t(s, d, "region").select(
        col("r_regionkey"),
        hex(col("r_name").cast("binary")).as("hx"),
        base64(col("r_name").cast("binary")).as("b64"),
        md5(col("r_name")).as("digest"),
        sha2(col("r_name").cast("binary"), 256).as("sha"))
        .orderBy(col("r_regionkey"))),

    "dt_parts_calendar" -> ((s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        weekofyear(col("o_orderdate")).as("iso_week"),
        dayofweek(col("o_orderdate")).as("dow_sun1"),
        date_trunc("week", col("o_orderdate")).as("week_start"),
        (year(col("o_orderdate")) % 4 === 0 &&
          (year(col("o_orderdate")) % 100 =!= 0 || year(col("o_orderdate")) % 400 === 0))
          .as("is_leap"))
        .orderBy(col("o_orderkey"))),

    // diagonal concat: union frames with disjoint columns, null-filled.
    "concat_diagonal" -> ((s, d) => {
      val a = lf(s, d, "region").selectNames("r_regionkey", "r_name")
      val b = lf(s, d, "nation").selectNames("n_nationkey", "n_name")
      a.vstack(b)
        .sort(col("r_regionkey").asc_nulls_last, col("n_nationkey").asc_nulls_last)
        .collect()
    }),

    // SQL frontend — TPC-H Q6 shape through spark.sql (polars SQLContext ≈
    // free via Catalyst; SURVEY §3.3).
    "sql_tpch_q6" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(
        """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
          |FROM lineitem
          |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          |  AND l_shipdate < TIMESTAMP '1997-01-01'
          |  AND l_discount BETWEEN 0.04 AND 0.08 AND l_quantity < 24""".stripMargin)
    }),

    // seeded distributed sample — the RNG is engine-specific, so the key
    // emits oracle-checkable INVARIANTS of the sample instead of its raw
    // counts: exact per-group totals (DuckDB agrees), the sampled fraction
    // within ±3pp of the requested 10%, the without-replacement subset
    // proof (no row's sampled multiplicity exceeds its base multiplicity —
    // robust even where the synthetic data carries duplicate rows), and
    // determinism (two draws with the same seed produce identical counts
    // AND identical key-hash sums). The oracle expects literal TRUE for
    // each boolean, so any violation hashes red.
    "misc_sample_seeded" -> ((s, d) => {
      val keys = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      val kc = keys.map(col)
      val gcols = col("l_returnflag") +: kc
      val base = t(s, d, "lineitem").select(gcols: _*)
      def draw(tag: String) =
        base.sample(withReplacement = false, 0.1, seed = 42)
          .groupBy(col("l_returnflag")).agg(
            count(lit(1)).as(s"n_$tag"),
            // widen before summing: a long-typed sum of 64-bit hashes
            // overflows under ANSI mode (Spark 4 default)
            sum(xxhash64(kc: _*).cast("decimal(38,0)")).as(s"hs_$tag"))
      val sampPer = base.sample(withReplacement = false, 0.1, seed = 42)
        .groupBy(gcols: _*).agg(count(lit(1)).as("c_s"))
      val basePer = base.groupBy(gcols: _*).agg(count(lit(1)).as("c_b"))
      val subset = sampPer
        .join(basePer, "l_returnflag" +: keys)
        .groupBy(col("l_returnflag"))
        .agg(sum(when(col("c_s") > col("c_b"), 1).otherwise(0)).as("viol"))
      val totals = base.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_total"))
      // LEFT joins from totals: a group whose draw is empty must still
      // emit its row (with frac_ok=false reporting the violation) rather
      // than vanish and fail the oracle's ROW count; hs compares null-safe
      totals.join(draw("a"), Seq("l_returnflag"), "left")
        .join(draw("b"), Seq("l_returnflag"), "left")
        .join(subset, Seq("l_returnflag"), "left")
        .select(col("l_returnflag"), col("n_total"),
          (coalesce(col("n_a"), lit(0L)) >= col("n_total") * 0.07 &&
            coalesce(col("n_a"), lit(0L)) <= col("n_total") * 0.13).as("frac_ok"),
          (coalesce(col("viol"), lit(0L)) === 0).as("subset_ok"),
          (coalesce(col("n_a"), lit(0L)) === coalesce(col("n_b"), lit(0L)) &&
            col("hs_a") <=> col("hs_b")).as("deterministic"))
        .orderBy(col("l_returnflag"))
    })
  )

  val oracle: Map[String, String] = Map(
    "agg_dynamic_hop" ->
      """WITH e AS (SELECT epoch_us(ts) AS us, value FROM events),
        | x AS (SELECT make_timestamp((us // 1800000000 - j) * 1800000000) AS ws, value
        |   FROM e, unnest([0, 1]) AS t(j)
        |   WHERE (us // 1800000000 - j) * 1800000000 > us - 3600000000)
        |SELECT ws AS _window_start, count(*) AS n, round(sum(value),4) AS sum_value
        |FROM x GROUP BY 1 ORDER BY 1""".stripMargin,

    "upsample_grid" ->
      """WITH bounds AS (
        | SELECT user_id, min(ts) AS mn, max(ts) AS mx FROM events
        | WHERE user_id <= 5 GROUP BY 1),
        |grid AS (
        | SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 30 MINUTES)) AS ts
        | FROM bounds)
        |SELECT g.user_id, count(*) AS n_grid, count(e.value) AS n_obs
        |FROM grid g LEFT JOIN (SELECT user_id, ts, value FROM events WHERE user_id <= 5) e
        | ON g.user_id = e.user_id AND g.ts = e.ts
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "win_interpolate" ->
      """WITH base AS (
        | SELECT event_id, user_id, ts,
        |  CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        | FROM events WHERE user_id <= 10),
        |f AS (
        | SELECT event_id, user_id, v, rn,
        |  last_value(v IGNORE NULLS) OVER wb AS pv,
        |  last_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS) OVER wb AS pp,
        |  first_value(v IGNORE NULLS) OVER wa AS nv,
        |  first_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS) OVER wa AS np
        | FROM base
        | WINDOW wb AS (PARTITION BY user_id ORDER BY rn
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  wa AS (PARTITION BY user_id ORDER BY rn
        |   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_id, user_id,
        | round(CASE WHEN v IS NOT NULL THEN v
        |  WHEN pv IS NOT NULL AND nv IS NOT NULL
        |   THEN pv + (nv - pv) * (CAST(rn AS DOUBLE) - pp) / (np - pp) END, 6) AS interp
        |FROM f ORDER BY event_id""".stripMargin,

    "win_cumprod" ->
      """SELECT l_orderkey, l_linenumber,
        | round(exp(sum(ln(1.0 + l_discount)) OVER (PARTITION BY l_orderkey
        |   ORDER BY l_linenumber
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 8) AS growth
        |FROM lineitem WHERE l_orderkey <= 500 ORDER BY 1, 2""".stripMargin,

    "misc_value_counts" ->
      """SELECT o_orderpriority, count(*) AS n,
        | round(count(*) / (SELECT count(*) FROM orders), 6) AS proportion
        |FROM orders GROUP BY 1 ORDER BY n DESC, o_orderpriority""".stripMargin,

    "misc_to_dummies" ->
      """SELECT l_orderkey, l_linenumber,
        | CASE WHEN l_returnflag='A' THEN 1 ELSE 0 END AS rf_A,
        | CASE WHEN l_returnflag='N' THEN 1 ELSE 0 END AS rf_N,
        | CASE WHEN l_returnflag='R' THEN 1 ELSE 0 END AS rf_R
        |FROM lineitem WHERE l_orderkey <= 1000 ORDER BY 1, 2""".stripMargin,

    "str_encode" ->
      """SELECT r_regionkey, hex(r_name) AS hx, base64(r_name::BLOB) AS b64,
        | md5(r_name) AS digest, sha256(r_name) AS sha
        |FROM region ORDER BY r_regionkey""".stripMargin,

    "dt_parts_calendar" ->
      """SELECT o_orderkey, CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
        | CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow_sun1,
        | CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS week_start,
        | (year(o_orderdate) % 4 = 0 AND
        |   (year(o_orderdate) % 100 <> 0 OR year(o_orderdate) % 400 = 0)) AS is_leap
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "concat_diagonal" ->
      """SELECT r_regionkey, r_name, NULL::INTEGER AS n_nationkey, NULL::VARCHAR AS n_name
        |FROM region
        |UNION ALL
        |SELECT NULL, NULL, n_nationkey, n_name FROM nation
        |ORDER BY r_regionkey NULLS LAST, n_nationkey NULLS LAST""".stripMargin,

    "sql_tpch_q6" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.04 AND 0.08 AND l_quantity < 24""".stripMargin,

    // the invariant form: the oracle checks exact per-group totals and
    // expects literal TRUE for every sample property (fraction band, no
    // duplicates, seed determinism) — any violation hashes red
    "misc_sample_seeded" ->
      """SELECT l_returnflag, count(*) AS n_total, TRUE AS frac_ok,
        | TRUE AS subset_ok, TRUE AS deterministic
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
