package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.dsl.LazyFrame
import graft.queries.util._
import graft.{functions => gf}

/** Aggregation / group-by battery (SURVEY §2.5). Every query pairs with a
  * DuckDB oracle; doubles are rounded so cross-engine float summation order
  * can't flip the hash. All outputs carry a total deterministic ORDER BY.
  */
object QueriesAgg {

  val queries: Map[String, Q] = Map(
    // TPC-H Q1 — the M0 flagship slice: scan → filter → groupBy/agg → sort.
    // The money sums are EXACT integer summation (the sql_tpch_q5 r11
    // recipe, hit again by the r12 sf100 sweep at lineitem=600M): a float
    // SUM over that many rows carries last-ulp order jitter that crosses
    // cent-rounding boundaries. price/discount/tax are fixed-decimal data,
    // so each term is an exact cent-scaled long (scale 1e2/1e4/1e6), the
    // sum is order-independent, and both engines combine IDENTICAL
    // integers — no final round needed.
    //
    // r13 (verdict task 2): EVERY accumulator is now a codegen-fast long —
    // the decimal(38,0) sum_charge accumulator (2.45× DuckDB at sf100) is
    // replaced by a hi/lo split at bit 25: per-row charge ≤ ~1.2e11 fits a
    // long trivially; sum(charge >> 25) and sum(charge & (2^25-1)) each
    // stay far under 2^63 (lo ≤ rows·2^25 → long overflow only past
    // ~sf300,000). Exactness contract: the reconstruct hi*2^25 + lo is the
    // SAME scalar double expression on both engines over IDENTICAL long
    // inputs, so the emitted value is bit-identical cross-engine and
    // order-independent at ANY sf. It equals the true sum correctly
    // rounded while both long sums stay ≤ 2^53 (to ~sf300 per group);
    // past that the lo-cast rounds first, so the result can sit an ulp or
    // two from the true sum — still deterministic, still cross-engine
    // identical (the r13 claim of exact-to-sf5,000,000 overstated this;
    // 2^25 being a power of two makes hi*2^25 exact to ~sf5e6, but lo
    // crosses 2^53 much earlier).
    // The disc_price sum gets the same split (a single long sum overflows
    // at ~sf16,000 — fine for 100 GB, not for 100 TB). ANSI throws loudly
    // on any overflow, never wraps. The scaled terms are pre-projected
    // once per row (one round+cast per source column, not per aggregate).
    "agg_tpch_q1" -> ((s, d) => {
      val loMask = lit((1L << 25) - 1)
      val hiMul  = (1L << 25).toDouble
      lf(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .withColumns(
          "__c"  -> round(col("l_extendedprice") * 100).cast("long"),
          "__df" -> round((lit(1) - col("l_discount")) * 100).cast("long"),
          "__tf" -> round((lit(1) + col("l_tax")) * 100).cast("long"),
          "__dc" -> round(col("l_discount") * 100).cast("long"))
        .withColumns("__dp" -> (col("__c") * col("__df")))
        .withColumns("__ch" -> (col("__dp") * col("__tf")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          (sum(col("__c")).cast("double") / 100).as("sum_base_price"),
          ((sum(shiftright(col("__dp"), 25)).cast("double") * hiMul
            + sum(col("__dp").bitwiseAND(loMask)).cast("double")) / 1e4)
            .as("sum_disc_price"),
          ((sum(shiftright(col("__ch"), 25)).cast("double") * hiMul
            + sum(col("__ch").bitwiseAND(loMask)).cast("double")) / 1e6)
            .as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          ((round((sum(col("__c")).cast("double") / 100 /
            count(lit(1))) * 1e4)) / 1e4).as("avg_price"),
          ((round((sum(col("__dc")).cast("double") / 100 /
            count(lit(1))) * 1e4)) / 1e4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .sort(col("l_returnflag"), col("l_linestatus")).collect()
    }),

    // h2oai q2 shape: sum by two keys (same exact-cents discipline).
    "agg_sum_two_keys" -> ((s, d) =>
      lf(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
          (sum(round(col("l_extendedprice") * 100).cast("long"))
            .cast("double") / 100).as("sum_price"))
        .sort(col("l_returnflag"), col("l_linestatus")).collect()),

    "agg_stats" -> ((s, d) =>
      lf(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          round(min(col("o_totalprice")), 2).as("min_price"),
          round(max(col("o_totalprice")), 2).as("max_price"),
          round(avg(col("o_totalprice")), 4).as("avg_price"),
          round(stddev_samp(col("o_totalprice")), 4).as("std_price"),
          round(var_samp(col("o_totalprice")), 4).as("var_price"),
          count(lit(1)).as("n"))
        .sort(col("o_orderpriority")).collect()),

    // Two exact NDVs over one grouping. A single groupBy with two
    // countDistinct columns forces Catalyst's Expand — the input TRIPLES
    // before the first shuffle (19.5 s over 600M rows at sf100, 4.6×
    // DuckDB; r12 verdict task 1). Splitting into per-column partial-
    // distinct aggregates kills Expand but pays a scan + pair-shuffle per
    // column (14.8 s). The one-pass shape: [[graft.functions.ndvAgg]]
    // (TypedImperativeAggregate over an open-addressing long set) computes
    // both exact NDVs in ONE scan, shuffling each task's distinct values
    // once — measured 8.46 s min on the same data, 2.8× same-host DuckDB,
    // and TIED by Spark's own HLL plan (8.41 s), so the residual is the
    // scan+shuffle floor, not the aggregate (SCALE.md §Aggregations
    // records the full variant table, the final-merge concentration
    // caveat, and the HLL recipe for when a few-percent error is
    // acceptable), plan pinned Expand-free in PlanSpec.
    "agg_count_distinct" -> ((s, d) =>
      lf(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(gf.ndvAgg(col("l_partkey")).as("ndv_part"),
          gf.ndvAgg(col("l_suppkey")).as("ndv_supp"),
          count(lit(1)).as("n"))
        .sort(col("l_returnflag")).collect()),

    // HLL sketch — the estimate itself is engine-specific, so the key emits
    // oracle-checkable INVARIANTS instead of the raw sketch: the exact NDV
    // (DuckDB computes the same number) and a boolean asserting the sketch
    // landed within 5% of it. The sketch runs at rsd=0.01 so the 5% band is
    // a 5-sigma bound (Spark's DEFAULT rsd is 0.05 — a 1-sigma band there
    // would deterministically miss on ~1/3 of datasets); the oracle expects
    // literal TRUE, so a drifting sketch hashes red.
    "agg_approx_ndv" -> ((s, d) =>
      lf(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey"), 0.01).as("approx"),
          countDistinct(col("l_partkey")).as("exact_ndv"))
        .collect()
        .select(col("l_returnflag"), col("exact_ndv"),
          (abs(col("approx") - col("exact_ndv")) /
            col("exact_ndv") < 0.05).as("within5"))
        .orderBy(col("l_returnflag"))),

    "agg_median_quantile" -> ((s, d) =>
      lf(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(round(median(col("l_quantity")), 4).as("med_qty"),
          round(percentile(col("l_extendedprice"), lit(0.9)), 4).as("p90_price"),
          round(percentile(col("l_extendedprice"), lit(0.25)), 4).as("p25_price"))
        .sort(col("l_returnflag")).collect()),

    // arbitrary expression inside agg: col.filter(cond).sum() polars-style.
    "agg_conditional" -> ((s, d) =>
      lf(s, d, "lineitem")
        .groupBy(col("l_linestatus"))
        .agg(
          round(sum(when(col("l_discount") > 0.05, col("l_extendedprice"))), 2).as("disc_price"),
          count(when(col("l_quantity") >= 25, lit(1))).as("n_bulk"),
          round(avg(when(col("l_returnflag") === "R", col("l_quantity"))), 4).as("avg_returned_qty"))
        .sort(col("l_linestatus")).collect()),

    // min_by/max_by with a unique ordering key → deterministic.
    "agg_minmax_by" -> ((s, d) =>
      lf(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          max_by(col("o_orderkey"), col("o_totalprice") * lit(1000000) + col("o_orderkey")).as("max_price_key"),
          min_by(col("o_orderkey"), col("o_totalprice") * lit(1000000) + col("o_orderkey")).as("min_price_key"))
        .sort(col("o_orderpriority")).collect()),

    // grouping sets — free upside vs reference (polars rejects ROLLUP).
    "agg_rollup" -> ((s, d) =>
      LazyFrame(t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
          count(lit(1)).as("n")))
        .sort(col("l_returnflag"), col("l_linestatus")).collect()),

    // implode (collect_list) with deterministic order → string for hashing.
    "agg_implode" -> ((s, d) =>
      lf(s, d, "orders")
        .filter(col("o_custkey") <= 50)
        .groupBy(col("o_custkey"))
        .agg(concat_ws(",", sort_array(collect_list(col("o_orderkey")))).as("order_keys"),
          count(lit(1)).as("n"))
        .sort(col("o_custkey")).collect()),

    // mode with deterministic tie-break (most frequent, then smallest value).
    "agg_mode" -> ((s, d) => {
      val counts = t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus")).count()
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("count").desc, col("l_linestatus").asc)
      counts.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("l_returnflag"), col("l_linestatus").as("mode_status"))
        .orderBy(col("l_returnflag"))
    }),

    // group_by_dynamic → tumbling window() (SURVEY §2.5 time group-by).
    "agg_dynamic_1h" -> ((s, d) =>
      lf(s, d, "events")
        .groupByDynamic(col("ts"), "1 hour")
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
        .sort(col("_window_start")).collect()
        .select(col("_window_start"), col("n"), col("sum_value"))),

    // per-group skew/kurtosis (reference reduce kernels skew_kurtosis).
    "agg_skew_kurt" -> ((s, d) =>
      lf(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(round(skewness(col("l_extendedprice")), 4).as("skew_price"),
          round(kurtosis(col("l_extendedprice")), 4).as("kurt_price"))
        .sort(col("l_returnflag")).collect())
  )

  val oracle: Map[String, String] = Map(
    // hi/lo long split at bit 25 mirrors the Spark side exactly: both
    // engines sum identical integers, reconstruct hi*2^25 (a power of two
    // — the double multiply is exact) + lo with one correctly-rounded add,
    // so the doubles are bit-identical.
    "agg_tpch_q1" ->
      """WITH t AS (
        | SELECT l_returnflag, l_linestatus, l_quantity,
        |  CAST(round(l_extendedprice*100) AS BIGINT) AS c,
        |  CAST(round(l_extendedprice*100) AS BIGINT)
        |    * CAST(round((1-l_discount)*100) AS BIGINT) AS dp,
        |  CAST(round(l_extendedprice*100) AS BIGINT)
        |    * CAST(round((1-l_discount)*100) AS BIGINT)
        |    * CAST(round((1+l_tax)*100) AS BIGINT) AS ch,
        |  CAST(round(l_discount*100) AS BIGINT) AS dc
        | FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02')
        |SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | CAST(sum(c) AS DOUBLE)/100 AS sum_base_price,
        | (CAST(sum(dp >> 25) AS DOUBLE) * 33554432
        |   + CAST(sum(dp & 33554431) AS DOUBLE))/10000 AS sum_disc_price,
        | (CAST(sum(ch >> 25) AS DOUBLE) * 33554432
        |   + CAST(sum(ch & 33554431) AS DOUBLE))/1000000 AS sum_charge,
        | round(avg(l_quantity),4) AS avg_qty,
        | round(CAST(sum(c) AS DOUBLE)/100/count(*) * 1e4)/1e4 AS avg_price,
        | round(CAST(sum(dc) AS DOUBLE)/100/count(*) * 1e4)/1e4 AS avg_disc,
        | count(*) AS count_order
        |FROM t
        |GROUP BY l_returnflag, l_linestatus ORDER BY 1, 2""".stripMargin,

    "agg_sum_two_keys" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty,
        | CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100
        |   AS sum_price
        |FROM lineitem GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "agg_stats" ->
      """SELECT o_orderpriority, round(min(o_totalprice),2) AS min_price,
        | round(max(o_totalprice),2) AS max_price,
        | round(avg(o_totalprice),4) AS avg_price,
        | round(stddev_samp(o_totalprice),4) AS std_price,
        | round(var_samp(o_totalprice),4) AS var_price,
        | count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "agg_count_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS ndv_part,
        | count(DISTINCT l_suppkey) AS ndv_supp, count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    // the invariant form: exact NDV matches across engines; the oracle's
    // literal TRUE forces Spark's HLL estimate to sit within 5% of exact
    "agg_approx_ndv" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_ndv,
        | TRUE AS within5
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "agg_median_quantile" ->
      """SELECT l_returnflag, round(median(l_quantity),4) AS med_qty,
        | round(quantile_cont(l_extendedprice, 0.9),4) AS p90_price,
        | round(quantile_cont(l_extendedprice, 0.25),4) AS p25_price
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "agg_conditional" ->
      """SELECT l_linestatus,
        | round(sum(CASE WHEN l_discount > 0.05 THEN l_extendedprice END),2) AS disc_price,
        | count(CASE WHEN l_quantity >= 25 THEN 1 END) AS n_bulk,
        | round(avg(CASE WHEN l_returnflag = 'R' THEN l_quantity END),4) AS avg_returned_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "agg_minmax_by" ->
      """SELECT o_orderpriority,
        | max_by(o_orderkey, o_totalprice*1000000 + o_orderkey) AS max_price_key,
        | min_by(o_orderkey, o_totalprice*1000000 + o_orderkey) AS min_price_key
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "agg_rollup" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty,
        | count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,

    "agg_implode" ->
      """SELECT o_custkey, string_agg(o_orderkey, ',' ORDER BY o_orderkey) AS order_keys,
        | count(*) AS n
        |FROM orders WHERE o_custkey <= 50 GROUP BY 1 ORDER BY 1""".stripMargin,

    "agg_mode" ->
      """WITH c AS (
        | SELECT l_returnflag, l_linestatus, count(*) AS cnt FROM lineitem GROUP BY 1,2)
        |SELECT l_returnflag, l_linestatus AS mode_status FROM (
        | SELECT l_returnflag, l_linestatus,
        |  row_number() OVER (PARTITION BY l_returnflag ORDER BY cnt DESC, l_linestatus) AS rn
        | FROM c) WHERE rn = 1 ORDER BY 1""".stripMargin,

    "agg_dynamic_1h" ->
      """SELECT date_trunc('hour', ts) AS _window_start, count(*) AS n,
        | round(sum(value),4) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // DuckDB skewness/kurtosis are sample-corrected; Spark's are population
    // moments — invert the bias correction (kurtosis_pop matches directly).
    "agg_skew_kurt" ->
      """SELECT l_returnflag,
        | round(skewness(l_extendedprice) * (count(*) - 2)
        |   / sqrt(count(*) * (count(*) - 1.0)), 4) AS skew_price,
        | round(kurtosis_pop(l_extendedprice), 4) AS kurt_price
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
