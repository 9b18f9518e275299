package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.queries.util._
import graft.{functions => gf}

/** Round-3 batch 5: offset dynamic windows (group_by_dynamic offset/StartBy,
  * §2.5), pad/zfill/multi-replace strings (§2.9), cum_fold (§2.11), and
  * time-decayed ewm_mean_by (§2.6).
  */
object QueriesMisc5 {

  val queries: Map[String, Q] = Map(

    // group_by_dynamic with a non-aligned origin (DynamicGroupOptions.offset
    // / StartBy::WindowBound, crates/polars-time/src/group_by/dynamic.rs):
    // hourly windows anchored at :30
    "agg_dynamic_offset" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour", "1 hour", "30 minutes"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sv"))
        .select(col("window.start").as("w_start"), col("n"), col("sv"))
        .orderBy(col("w_start"))),

    // polars str.zfill / pad_start / pad_end / replace_many / strip_chars
    "str_pad_fill" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        gf.zfill(col("p_partkey").cast("string"), 8).as("zf"),
        lpad(col("p_brand"), 12, "*").as("padl"),
        rpad(col("p_brand"), 12, ".").as("padr"),
        gf.replaceMany(col("p_type"), Seq("PROMO" -> "P~", "BRUSHED" -> "B~"))
          .as("repl"),
        gf.stripChars(col("p_name"), "aeiou").as("strip"),
        gf.stripCharsStart(col("p_name"), "aeiou").as("strip_s"),
        gf.stripCharsEnd(col("p_name"), "aeiou").as("strip_e"))
        .orderBy(col("p_partkey"))),

    // polars cum_fold (FunctionExpr mod.rs:319-340): running fold across
    // columns, intermediate accumulators kept
    "misc_cum_fold" -> ((s, d) => {
      val f1 = col("l_quantity")
      val f2 = f1 + col("l_extendedprice")
      val f3 = f2 + col("l_tax")
      t(s, d, "lineitem").filter(col("l_orderkey") <= 1000).select(
        col("l_orderkey"), col("l_linenumber"),
        round(f1, 4).as("f1"), round(f2, 4).as("f2"), round(f3, 4).as("f3"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // polars round_sig_figs (RoundSF): dynamic-scale rounding via the
    // scaled-integer form (exact in both engines, see text_quality note)
    "math_round_sig" -> ((s, d) => {
      val x = col("l_extendedprice")
      val y = pow(lit(10.0), floor(log10(abs(x))) - 2) // 3 significant figures
      t(s, d, "lineitem").filter(col("l_orderkey") <= 2000).select(
        col("l_orderkey"), col("l_linenumber"),
        when(x === 0, lit(0.0)).otherwise(round(x / y, 0) * y).as("sig3"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // polars str.to_decimal (§2.9): string → exact decimal, arithmetic in
    // decimal (no double drift); retailprice is 1-2dp so the double→string
    // shortest form parses exactly in both engines. Output re-renders as the
    // canonical fixed-scale string: the comparator reads Spark's parquet
    // decimals as Decimal objects but DuckDB's as floats, which hash apart
    // even when values agree (the r3 red row).
    "str_to_decimal" -> ((s, d) => {
      val dec = col("p_retailprice").cast("string").cast("decimal(12,2)")
      t(s, d, "part").select(
        col("p_partkey"), dec.cast("string").as("dec"),
        (dec * 2).cast("decimal(13,2)").cast("string").as("dec2"))
        .orderBy(col("p_partkey"))
    }),

    // polars str.extract_all + strip_prefix/strip_suffix (§2.9 Strings).
    // Matches are [a-z]{5,} so '|' can't occur in them — the joined string
    // is an injective encoding (driver comparator can't hash array cells).
    "str_extract_all" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        array_join(regexp_extract_all(col("p_name"), lit("[a-z]{5,}"), lit(0)), "|")
          .as("long_words"),
        regexp_replace(col("p_type"), "^STANDARD ", "").as("no_prefix"),
        regexp_replace(col("p_brand"), "#\\d+$", "").as("no_suffix"))
        .orderBy(col("p_partkey"))),

    // polars list.count_matches (§2.9 List): occurrences of a value per list
    "list_count_matches" -> ((s, d) =>
      t(s, d, "lineitem").filter(col("l_orderkey") <= 500)
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(col("l_linenumber"))).as("lns"))
        .select(col("l_orderkey"),
          size(filter(col("lns"), x => x === 1)).as("n_ones"),
          size(filter(col("lns"), x => x > 3)).as("n_gt3"))
        .orderBy(col("l_orderkey"))),

    // polars dt.combine (date + time parts → timestamp) and days_in_month
    "dt_combine" -> ((s, d) =>
      t(s, d, "orders").filter(col("o_orderkey") <= 2000).select(
        col("o_orderkey"),
        make_timestamp(
          year(col("o_orderdate")), month(col("o_orderdate")),
          dayofmonth(col("o_orderdate")), lit(12), lit(30), lit(15.0))
          .as("combined"),
        dayofmonth(last_day(col("o_orderdate").cast("date"))).as("days_in_month"))
        .orderBy(col("o_orderkey"))),

    // TPC-H Q14 (promo revenue share by shipped month) through spark.sql —
    // broadcast-able part join + conditional aggregation
    "sql_tpch_q14" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("lineitem")
      t(s, d, "part").createOrReplaceTempView("part")
      s.sql(
        """SELECT round(100.00 * sum(CASE WHEN p_type LIKE 'PROMO%'
          |  THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
          |  / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
          |FROM lineitem JOIN part ON l_partkey = p_partkey
          |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin)
    }),

    // TPC-H Q10 shape (returned-item revenue by customer, top 20)
    "sql_tpch_q10" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("lineitem")
      t(s, d, "orders").createOrReplaceTempView("orders")
      t(s, d, "customer").createOrReplaceTempView("customer")
      t(s, d, "nation").createOrReplaceTempView("nation")
      s.sql(
        """SELECT c_custkey, c_name, n_name,
          | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
          |FROM customer
          |JOIN orders ON c_custkey = o_custkey
          |JOIN lineitem ON l_orderkey = o_orderkey
          |JOIN nation ON c_nationkey = n_nationkey
          |WHERE l_returnflag = 'R'
          |GROUP BY c_custkey, c_name, n_name
          |ORDER BY revenue DESC, c_custkey
          |LIMIT 20""".stripMargin)
    }),

    // polars binary namespace (bin.encode/decode/len, §2.9): text → binary
    // payload, hex/base64 encodings, byte length — the binary-column surface
    // multimodal payloads ride on
    "bin_ops" -> ((s, d) =>
      t(s, d, "documents").filter(col("doc_id") < 100).select(
        col("doc_id"),
        hex(col("text").cast("binary")).as("hx"),
        // Spark base64 is MIME-chunked (CRLF every 76 chars); strip to the
        // single-line standard form DuckDB produces
        regexp_replace(base64(col("text").cast("binary")), "[\\r\\n]", "").as("b64"),
        octet_length(col("text")).as("nbytes"),
        length(col("text")).as("nchars"))
        .orderBy(col("doc_id"))),

    // polars top_k in agg context via the TypedImperativeAggregate
    // (graft.functions.TopKAgg): k-bounded state per group, no window sort
    // k-bounded arrays serialize to '|'-joined decimal strings for the hash
    // gate (decimal→string renders identically in Spark and DuckDB)
    "agg_topk_values" -> ((s, d) => {
      val ser = (c: org.apache.spark.sql.Column) =>
        array_join(transform(c, x => x.cast("decimal(18,2)").cast("string")), "|")
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(gf.topKAgg(col("l_quantity"), 5).as("top5"),
          gf.topKAgg(col("l_extendedprice"), 3, descending = false).as("bottom3"))
        .select(col("l_returnflag"), ser(col("top5")).as("top5"),
          ser(col("bottom3")).as("bottom3"))
        .orderBy(col("l_returnflag"))
    }),

    // polars ewm_mean_by (series/ops/ewm_by.rs): decay by actual time
    // distance, not row count — weight 0.5^(Δt minutes) over a 1 h trailing
    // range window; the collect-then-fold stays bounded by the range frame
    "win_ewm_by" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("tm"))
        .rangeBetween(-3600000000L, 0L)
      t(s, d, "events").filter(col("user_id") <= 20)
        .select(col("event_id"), col("user_id"), col("value"),
          unix_micros(col("ts")).as("tm"))
        .withColumn("hist", collect_list(struct(col("tm").as("t"), col("value").as("v"))).over(w))
        .select(col("event_id"), col("user_id"),
          round(
            aggregate(col("hist"), lit(0.0), (acc, e) =>
              acc + e.getField("v") * pow(lit(0.5),
                (col("tm") - e.getField("t")) / lit(60000000.0))) /
            aggregate(col("hist"), lit(0.0), (acc, e) =>
              acc + pow(lit(0.5), (col("tm") - e.getField("t")) / lit(60000000.0))),
            4).as("ewm_t"))
        .orderBy(col("event_id"))
    })
  )

  val oracle: Map[String, String] = Map(

    "agg_dynamic_offset" ->
      """SELECT time_bucket(INTERVAL 1 HOUR, ts, INTERVAL 30 MINUTE) AS w_start,
        |       count(*) AS n, round(sum(value), 4) AS sv
        |FROM events GROUP BY 1 ORDER BY w_start""".stripMargin,

    "str_pad_fill" ->
      """SELECT p_partkey,
        | lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS zf,
        | lpad(p_brand, 12, '*') AS padl,
        | rpad(p_brand, 12, '.') AS padr,
        | replace(replace(p_type, 'PROMO', 'P~'), 'BRUSHED', 'B~') AS repl,
        | regexp_replace(regexp_replace(p_name, '^[aeiou]+', ''), '[aeiou]+$', '') AS strip,
        | regexp_replace(p_name, '^[aeiou]+', '') AS strip_s,
        | regexp_replace(p_name, '[aeiou]+$', '') AS strip_e
        |FROM part ORDER BY p_partkey""".stripMargin,

    "misc_cum_fold" ->
      """SELECT l_orderkey, l_linenumber,
        | round(l_quantity, 4) AS f1,
        | round(l_quantity + l_extendedprice, 4) AS f2,
        | round(l_quantity + l_extendedprice + l_tax, 4) AS f3
        |FROM lineitem WHERE l_orderkey <= 1000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "math_round_sig" ->
      """SELECT l_orderkey, l_linenumber,
        | CASE WHEN l_extendedprice = 0 THEN 0.0
        |      ELSE round(l_extendedprice / power(10.0, floor(log10(abs(l_extendedprice))) - 2))
        |           * power(10.0, floor(log10(abs(l_extendedprice))) - 2) END AS sig3
        |FROM lineitem WHERE l_orderkey <= 2000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "str_to_decimal" ->
      """SELECT p_partkey,
        | CAST(CAST(CAST(p_retailprice AS VARCHAR) AS DECIMAL(12,2)) AS VARCHAR) AS dec,
        | CAST(CAST(CAST(CAST(p_retailprice AS VARCHAR) AS DECIMAL(12,2)) * 2
        |      AS DECIMAL(13,2)) AS VARCHAR) AS dec2
        |FROM part ORDER BY p_partkey""".stripMargin,

    "str_extract_all" ->
      """SELECT p_partkey,
        | coalesce(array_to_string(regexp_extract_all(p_name, '[a-z]{5,}'), '|'), '')
        |   AS long_words,
        | regexp_replace(p_type, '^STANDARD ', '') AS no_prefix,
        | regexp_replace(p_brand, '#\d+$', '') AS no_suffix
        |FROM part ORDER BY p_partkey""".stripMargin,

    "list_count_matches" ->
      """WITH g AS (
        |  SELECT l_orderkey, list_sort(list(l_linenumber)) AS lns
        |  FROM lineitem WHERE l_orderkey <= 500 GROUP BY l_orderkey)
        |SELECT l_orderkey,
        | CAST(len(list_filter(lns, x -> x = 1)) AS INTEGER) AS n_ones,
        | CAST(len(list_filter(lns, x -> x > 3)) AS INTEGER) AS n_gt3
        |FROM g ORDER BY l_orderkey""".stripMargin,

    "dt_combine" ->
      """SELECT o_orderkey,
        | make_timestamp(year(o_orderdate), month(o_orderdate),
        |   day(o_orderdate), 12, 30, 15.0) AS combined,
        | CAST(day(last_day(CAST(o_orderdate AS DATE))) AS INTEGER) AS days_in_month
        |FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey""".stripMargin,

    "sql_tpch_q14" ->
      """SELECT round(100.00 * sum(CASE WHEN p_type LIKE 'PROMO%'
        |  THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
        |  / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin,

    "sql_tpch_q10" ->
      """SELECT c_custkey, c_name, n_name,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,

    "bin_ops" ->
      """SELECT doc_id,
        | upper(hex(encode(text))) AS hx,
        | to_base64(encode(text)) AS b64,
        | octet_length(encode(text))::INT AS nbytes,
        | length(text)::INT AS nchars
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin,

    "agg_topk_values" ->
      """SELECT l_returnflag,
        | array_to_string(list_transform((list_sort(list(l_quantity), 'DESC'))[1:5],
        |   x -> CAST(CAST(x AS DECIMAL(18,2)) AS VARCHAR)), '|') AS top5,
        | array_to_string(list_transform((list_sort(list(l_extendedprice), 'ASC'))[1:3],
        |   x -> CAST(CAST(x AS DECIMAL(18,2)) AS VARCHAR)), '|') AS bottom3
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "win_ewm_by" ->
      """WITH base AS (
        | SELECT event_id, user_id, value, epoch_us(ts) AS tm
        | FROM events WHERE user_id <= 20),
        |h AS (
        | SELECT event_id, user_id, value, tm,
        |  array_agg(struct_pack(t := tm, v := value)) OVER
        |    (PARTITION BY user_id ORDER BY tm
        |     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS hist
        | FROM base)
        |SELECT event_id, user_id,
        | round(
        |  list_sum(list_transform(hist, e -> e.v * power(0.5, (tm - e.t) / 60000000.0)))
        |  / list_sum(list_transform(hist, e -> power(0.5, (tm - e.t) / 60000000.0))),
        |  4) AS ewm_t
        |FROM h ORDER BY event_id""".stripMargin
  )
}
