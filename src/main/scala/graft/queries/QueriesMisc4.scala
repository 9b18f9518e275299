package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.queries.util._

/** Round-3 batch 4 — the remaining SURVEY §2 surface: range generators
  * (date_range / linear_space, §2.9 Ranges), entropy, spearman correlation,
  * is_close/is_between, search_sorted/index_of (§2.7), list diff/shift and
  * to_struct (§2.9 List), unique_counts/null_count (§2.9 Misc), regex group
  * extraction + find (§2.9 Strings), dt.round (§2.9 Temporal), struct
  * with_fields/rename (§2.9 Struct), ewm_var/std (§2.6), interpolate_by
  * (§2.6), match_to_schema (§2.1), scan_lines (§2.2).
  */
object QueriesMisc4 {

  val queries: Map[String, Q] = Map(

    // polars date_range (RangeFunction, function_expr/range.rs): monthly
    // series per order month, exploded — sequence() keeps it codegen'd
    "range_dates" -> ((s, d) =>
      t(s, d, "orders").filter(col("o_orderkey") <= 200)
        .select(col("o_orderkey"),
          explode(sequence(
            date_trunc("month", col("o_orderdate")).cast("date"),
            add_months(date_trunc("month", col("o_orderdate")).cast("date"), 3),
            expr("interval 1 month"))).as("mon"))
        .orderBy(col("o_orderkey"), col("mon"))),

    // polars linear_space: 5 evenly spaced points in [key, key+1]
    "range_linspace" -> ((s, d) =>
      t(s, d, "region")
        .select(col("r_regionkey"), explode(sequence(lit(0), lit(4))).as("i"))
        .select(col("r_regionkey"), col("i"),
          round(col("r_regionkey") + col("i") / 4.0, 6).as("x"))
        .orderBy(col("r_regionkey"), col("i"))),

    // polars entropy (FunctionExpr::Entropy): Shannon entropy of the user
    // distribution per event type; two-level agg, all map-side combinable
    "agg_entropy" -> ((s, d) => {
      val counts = t(s, d, "events")
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("event_type"))
      counts.withColumn("tot", sum(col("cnt")).over(w))
        .groupBy(col("event_type"))
        .agg(round(-sum((col("cnt") / col("tot")) *
          log(col("cnt") / col("tot"))), 6).as("entropy"))
        .orderBy(col("event_type"))
    }),

    // spearman correlation = pearson correlation of ranks
    // (Correlation::Spearman, function_expr/correlation.rs)
    "math_spearman" -> ((s, d) => {
      val wq = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))
      val wp = Window.partitionBy(col("l_returnflag")).orderBy(col("l_extendedprice"))
      t(s, d, "lineitem")
        .select(col("l_returnflag"),
          rank().over(wq).cast("double").as("rq"),
          rank().over(wp).cast("double").as("rp"))
        .groupBy(col("l_returnflag"))
        .agg(round(corr(col("rq"), col("rp")), 6).as("spearman"))
        .orderBy(col("l_returnflag"))
    }),

    // polars is_close / is_between (BooleanFunction boolean.rs)
    "bool_is_close" -> ((s, d) => {
      val a = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      val b = col("l_extendedprice") - col("l_extendedprice") * col("l_discount")
      t(s, d, "lineitem").filter(col("l_orderkey") <= 2000).select(
        col("l_orderkey"), col("l_linenumber"),
        (abs(a - b) <= lit(1e-9) + lit(1e-9) * abs(b)).as("close"),
        col("l_quantity").between(10, 20).as("in_range"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // polars search_sorted + index_of (§2.7): insertion index into a sorted
    // break array; position of a value in an array (0 when absent)
    "sort_search_sorted" -> ((s, d) => {
      val breaks = array(Seq(5, 15, 25, 35, 45).map(lit): _*)
      t(s, d, "lineitem").filter(col("l_orderkey") <= 2000).select(
        col("l_orderkey"), col("l_linenumber"),
        aggregate(breaks, lit(0),
          (acc, x) => acc + when(x <= col("l_quantity"), 1).otherwise(0))
          .as("ins_idx"),
        array_position(array(lit(1), lit(3), lit(5)), col("l_linenumber"))
          .cast("int").as("pos135"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // polars list.diff / list.shift (ListFunction list.rs): per-group sorted
    // quantity list, element-wise diff and lag-1 shift — pure array algebra.
    // Lists serialize to '|'-joined decimal strings in the final projection
    // (the driver's comparator can't hash array cells); the null the shift
    // introduces renders as a literal 'null' token in both engines.
    "list_diff_shift" -> ((s, d) => {
      val serialize = (c: org.apache.spark.sql.Column) =>
        array_join(transform(c,
          x => coalesce(x.cast("decimal(18,2)").cast("string"), lit("null"))), "|")
      t(s, d, "lineitem").filter(col("l_orderkey") <= 500)
        .groupBy(col("l_orderkey"))
        .agg(array_sort(collect_list(col("l_quantity"))).as("qs"))
        .select(col("l_orderkey"), serialize(col("qs")).as("qs"),
          serialize(zip_with(slice(col("qs"), lit(2), greatest(size(col("qs")) - 1, lit(0))),
            slice(col("qs"), lit(1), greatest(size(col("qs")) - 1, lit(0))),
            (x, y) => x - y)).as("qdiff"),
          serialize(concat(array(lit(null).cast("double")),
            slice(col("qs"), lit(1), greatest(size(col("qs")) - 1, lit(0)))))
            .as("qshift"))
        .orderBy(col("l_orderkey"))
    }),

    // polars list.to_struct: fixed positions become fields (nulls pad)
    "list_to_struct" -> ((s, d) =>
      t(s, d, "lineitem").filter(col("l_orderkey") <= 500)
        .groupBy(col("l_orderkey"))
        .agg(array_sort(collect_list(col("l_quantity"))).as("qs"))
        .select(col("l_orderkey"),
          try_element_at(col("qs"), lit(1)).as("q1"),
          try_element_at(col("qs"), lit(2)).as("q2"),
          try_element_at(col("qs"), lit(3)).as("q3"))
        .orderBy(col("l_orderkey"))),

    // polars unique_counts: counts in order of first appearance
    "misc_unique_counts" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"), min(col("l_orderkey")).as("first_seen"))
        .orderBy(col("first_seen"))),

    // polars null_count (df-wide Stats, §2.1 MapFunction)
    "misc_null_count" -> ((s, d) =>
      t(s, d, "events").agg(
        (count(lit(1)) - count(nullif(col("event_type"), lit("error"))))
          .as("null_type"),
        (count(lit(1)) - count(col("value"))).as("null_value"),
        count(lit(1)).as("n"))),

    // polars str.extract_groups + str.find (§2.9 Strings)
    "str_extract_find" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "([a-z]+) ([a-z]+)", 1).as("g1"),
        regexp_extract(col("p_name"), "([a-z]+) ([a-z]+)", 2).as("g2"),
        instr(col("p_name"), "ol").as("find_ol"))
        .orderBy(col("p_partkey"))),

    // polars dt.round("1h" / "15m"): nearest-multiple timestamp rounding,
    // computed on epoch µs so Spark and DuckDB share the exact arithmetic
    "dt_round" -> ((s, d) =>
      t(s, d, "events").filter(col("event_id") < 5000).select(
        col("event_id"),
        expr("timestamp_micros((unix_micros(ts) + 1800000000L) div 3600000000L * 3600000000L)")
          .as("round_1h"),
        expr("timestamp_micros((unix_micros(ts) + 450000000L) div 900000000L * 900000000L)")
          .as("round_15m"))
        .orderBy(col("event_id"))),

    // polars struct.with_fields / rename_fields (§2.9 Struct): build, extend,
    // rename. The structs are built and extended with withField, then the
    // final projection flattens fields back to scalars — the driver's
    // comparator can't hash struct cells.
    "struct_with_fields" -> ((s, d) =>
      t(s, d, "customer").select(
        col("c_custkey"),
        struct(col("c_name").as("name"), col("c_acctbal").as("bal"))
          .withField("nk", col("c_nationkey")).as("s"),
        struct(col("c_name").as("renamed_name")).as("r"))
        .select(col("c_custkey"),
          col("s.name").as("s_name"), col("s.bal").as("s_bal"),
          col("s.nk").as("s_nk"), col("r.renamed_name").as("r_name"))
        .orderBy(col("c_custkey"))),

    // polars ewm_var/ewm_std (series/ops/ewm.rs), α=0.5: weighted second
    // moment minus squared first moment over the same 2^rn weights as
    // win_ewm_mean; biased (adjust=true) form. NOTE: 2^rn is the
    // oracle-mirrorable gate formulation; it overflows past rn≈1023, so at
    // scale use graft.functions.ewmMeanRows (bounded window, decaying ≤1
    // weights — no overflow) instead.
    "win_ewm_var" -> ((s, d) => {
      val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"))
      val frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val rn = row_number().over(w)
      t(s, d, "lineitem").filter(col("l_orderkey") <= 2000)
        .withColumn("wt", pow(lit(2.0), rn))
        .withColumn("m1", sum(col("wt") * col("l_quantity")).over(frame) /
          sum(col("wt")).over(frame))
        .withColumn("m2", sum(col("wt") * col("l_quantity") * col("l_quantity")).over(frame) /
          sum(col("wt")).over(frame))
        .select(col("l_orderkey"), col("l_linenumber"),
          round(greatest(col("m2") - col("m1") * col("m1"), lit(0.0)), 6).as("ewm_var"),
          round(sqrt(greatest(col("m2") - col("m1") * col("m1"), lit(0.0))), 6).as("ewm_std"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // polars interpolate_by (series/ops/interpolation): linear interpolation
    // of nulls against a non-uniform x (event time), nulls kept at the edges
    "win_interpolate_by" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("x"))
      val prev = w.rowsBetween(Window.unboundedPreceding, -1)
      val next = w.rowsBetween(1, Window.unboundedFollowing)
      val vnn = col("v").isNotNull
      t(s, d, "events").filter(col("user_id") <= 10)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("x"),
          when(col("event_type") =!= "error", col("value")).as("v"))
        .withColumn("xp", last(when(vnn, col("x")), ignoreNulls = true).over(prev))
        .withColumn("vp", last(when(vnn, col("v")), ignoreNulls = true).over(prev))
        .withColumn("xn", first(when(vnn, col("x")), ignoreNulls = true).over(next))
        .withColumn("vn", first(when(vnn, col("v")), ignoreNulls = true).over(next))
        .select(col("event_id"), col("user_id"),
          round(when(vnn, col("v")).otherwise(
            when(col("xn") > col("xp"),
              col("vp") + (col("vn") - col("vp")) *
                (col("x") - col("xp")) / (col("xn") - col("xp")))
              .otherwise(col("vp"))), 4).as("vi"))
        .orderBy(col("event_id"))
    }),

    // polars match_to_schema (§2.1): cast + add-missing-as-null + reorder
    // to a target schema
    "misc_match_to_schema" -> ((s, d) =>
      t(s, d, "customer").select(
        col("c_custkey").cast("long").as("id"),
        col("c_name").as("name"),
        col("c_acctbal").cast("double").as("balance"),
        lit(null).cast("string").as("segment_v2"))
        .orderBy(col("id"))),

    // polars scan_lines (§2.2 FileScanDsl::Lines): text sink + line scan —
    // each line is a row with a single `value` column
    "io_lines_scan" -> ((s, d) => {
      val tmp = "/tmp/graft_io/lines_documents"
      t(s, d, "documents").select(col("text"))
        .coalesce(1).write.mode("overwrite").text(tmp)
      s.read.text(tmp).orderBy(col("value"))
    }),

    // polars str.normalize (§2.9): unicode NFC via the native expression —
    // composed text (e.g. decomposed é → composed é) canonicalized before
    // hashing/dedup; DuckDB nfc_normalize is the oracle
    "str_normalize" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        graft.functions.normalize(col("text")).as("norm"),
        (graft.functions.normalize(col("text")) === col("text")).as("was_nfc"))
        .orderBy(col("doc_id"))),

    // columnar sink/scan beyond parquet (§2.2): ORC round-trip — schema,
    // nested types, and compression survive
    "io_orc_roundtrip" -> ((s, d) => {
      val tmp = "/tmp/graft_io/orc_part"
      t(s, d, "part").write.mode("overwrite").orc(tmp)
      s.read.orc(tmp).orderBy(col("p_partkey"))
    }),

    // partitioned sink (§2.2 SinkTypeIR::Partitioned) + hive-partition scan:
    // write partitionBy(l_returnflag), read back one partition — the filter
    // prunes directories, not rows (PlanSpec asserts PartitionFilters)
    "io_partitioned_scan" -> ((s, d) => {
      val tmp = "/tmp/graft_io/part_lineitem"
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_returnflag"))
        .write.mode("overwrite").partitionBy("l_returnflag").parquet(tmp)
      s.read.parquet(tmp)
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    })
  )

  val oracle: Map[String, String] = Map(

    "range_dates" ->
      """SELECT o_orderkey, CAST(m AS DATE) AS mon
        |FROM orders, UNNEST(generate_series(
        |  CAST(date_trunc('month', o_orderdate) AS DATE),
        |  CAST(date_trunc('month', o_orderdate) AS DATE) + INTERVAL 3 MONTH,
        |  INTERVAL 1 MONTH)) AS u(m)
        |WHERE o_orderkey <= 200
        |ORDER BY o_orderkey, mon""".stripMargin,

    "range_linspace" ->
      """SELECT r_regionkey, i::INT AS i, round(r_regionkey + i / 4.0, 6) AS x
        |FROM region, UNNEST(range(0, 5)) AS t(i)
        |ORDER BY r_regionkey, i""".stripMargin,

    "agg_entropy" ->
      """WITH c AS (
        |  SELECT event_type, user_id, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |t AS (
        |  SELECT event_type, cnt,
        |         sum(cnt) OVER (PARTITION BY event_type) AS tot
        |  FROM c)
        |SELECT event_type,
        |       round(-sum((cnt / tot) * ln(cnt / tot)), 6) AS entropy
        |FROM t GROUP BY event_type ORDER BY event_type""".stripMargin,

    "math_spearman" ->
      """WITH r AS (
        |  SELECT l_returnflag,
        |    CAST(rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS DOUBLE) AS rq,
        |    CAST(rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS DOUBLE) AS rp
        |  FROM lineitem)
        |SELECT l_returnflag, round(corr(rq, rp), 6) AS spearman
        |FROM r GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "bool_is_close" ->
      """SELECT l_orderkey, l_linenumber,
        | abs((l_extendedprice * (1.0 - l_discount)) -
        |     (l_extendedprice - l_extendedprice * l_discount))
        |   <= 1e-9 + 1e-9 * abs(l_extendedprice - l_extendedprice * l_discount) AS close,
        | l_quantity BETWEEN 10 AND 20 AS in_range
        |FROM lineitem WHERE l_orderkey <= 2000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "sort_search_sorted" ->
      """SELECT l_orderkey, l_linenumber,
        | CAST(len(list_filter([5, 15, 25, 35, 45], x -> x <= l_quantity)) AS INTEGER) AS ins_idx,
        | CAST(coalesce(list_position([1, 3, 5], l_linenumber), 0) AS INTEGER) AS pos135
        |FROM lineitem WHERE l_orderkey <= 2000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "list_diff_shift" ->
      """WITH g AS (
        |  SELECT l_orderkey, list_sort(list(l_quantity)) AS qs
        |  FROM lineitem WHERE l_orderkey <= 500 GROUP BY l_orderkey)
        |SELECT l_orderkey,
        | array_to_string(list_transform(qs,
        |   x -> coalesce(CAST(CAST(x AS DECIMAL(18,2)) AS VARCHAR), 'null')), '|') AS qs,
        | coalesce(array_to_string(list_transform(
        |   list_transform(range(2, len(qs) + 1), i -> qs[i] - qs[i - 1]),
        |   x -> coalesce(CAST(CAST(x AS DECIMAL(18,2)) AS VARCHAR), 'null')), '|'), '')
        |   AS qdiff,
        | array_to_string(list_transform(
        |   list_concat([NULL::DOUBLE], qs[1:len(qs) - 1]),
        |   x -> coalesce(CAST(CAST(x AS DECIMAL(18,2)) AS VARCHAR), 'null')), '|') AS qshift
        |FROM g ORDER BY l_orderkey""".stripMargin,

    "list_to_struct" ->
      """WITH g AS (
        |  SELECT l_orderkey, list_sort(list(l_quantity)) AS qs
        |  FROM lineitem WHERE l_orderkey <= 500 GROUP BY l_orderkey)
        |SELECT l_orderkey, qs[1] AS q1, qs[2] AS q2, qs[3] AS q3
        |FROM g ORDER BY l_orderkey""".stripMargin,

    "misc_unique_counts" ->
      """SELECT l_linestatus, count(*) AS cnt, min(l_orderkey) AS first_seen
        |FROM lineitem GROUP BY l_linestatus ORDER BY first_seen""".stripMargin,

    "misc_null_count" ->
      """SELECT count(*) - count(nullif(event_type, 'error')) AS null_type,
        |       count(*) - count(value) AS null_value,
        |       count(*) AS n
        |FROM events""".stripMargin,

    "str_extract_find" ->
      """SELECT p_partkey,
        | regexp_extract(p_name, '([a-z]+) ([a-z]+)', 1) AS g1,
        | regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS g2,
        | CAST(strpos(p_name, 'ol') AS INTEGER) AS find_ol
        |FROM part ORDER BY p_partkey""".stripMargin,

    "dt_round" ->
      """SELECT event_id,
        | make_timestamp((epoch_us(ts) + 1800000000) // 3600000000 * 3600000000) AS round_1h,
        | make_timestamp((epoch_us(ts) + 450000000) // 900000000 * 900000000) AS round_15m
        |FROM events WHERE event_id < 5000 ORDER BY event_id""".stripMargin,

    "struct_with_fields" ->
      """WITH built AS (
        | SELECT c_custkey,
        |  struct_pack(name := c_name, bal := c_acctbal, nk := c_nationkey) AS s,
        |  struct_pack(renamed_name := c_name) AS r
        | FROM customer)
        |SELECT c_custkey, s.name AS s_name, s.bal AS s_bal,
        |       s.nk AS s_nk, r.renamed_name AS r_name
        |FROM built ORDER BY c_custkey""".stripMargin,

    "win_ewm_var" ->
      """WITH t AS (
        | SELECT l_orderkey, l_linenumber, l_quantity,
        |  row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS rn
        | FROM lineitem WHERE l_orderkey <= 2000),
        |m AS (
        | SELECT l_orderkey, l_linenumber,
        |  sum(power(2.0, rn) * l_quantity) OVER w / sum(power(2.0, rn)) OVER w AS m1,
        |  sum(power(2.0, rn) * l_quantity * l_quantity) OVER w
        |    / sum(power(2.0, rn)) OVER w AS m2
        | FROM t
        | WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT l_orderkey, l_linenumber,
        | round(greatest(m2 - m1 * m1, 0.0), 6) AS ewm_var,
        | round(sqrt(greatest(m2 - m1 * m1, 0.0)), 6) AS ewm_std
        |FROM m ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "win_interpolate_by" ->
      """WITH base AS (
        | SELECT event_id, user_id, epoch_us(ts) AS x,
        |        CASE WHEN event_type <> 'error' THEN value END AS v
        | FROM events WHERE user_id <= 10),
        |f AS (
        | SELECT event_id, user_id, x, v,
        |  last_value(CASE WHEN v IS NOT NULL THEN x END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY x
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS xp,
        |  last_value(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY x
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS vp,
        |  first_value(CASE WHEN v IS NOT NULL THEN x END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY x
        |          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS xn,
        |  first_value(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY x
        |          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS vn
        | FROM base)
        |SELECT event_id, user_id,
        | round(CASE WHEN v IS NOT NULL THEN v
        |            WHEN xn > xp THEN vp + (vn - vp) * (x - xp) / (xn - xp)
        |            ELSE vp END, 4) AS vi
        |FROM f ORDER BY event_id""".stripMargin,

    "misc_match_to_schema" ->
      """SELECT CAST(c_custkey AS BIGINT) AS id, c_name AS name,
        |       CAST(c_acctbal AS DOUBLE) AS balance,
        |       NULL::VARCHAR AS segment_v2
        |FROM customer ORDER BY id""".stripMargin,

    "io_lines_scan" ->
      "SELECT text AS value FROM documents ORDER BY text",

    "str_normalize" ->
      """SELECT doc_id, nfc_normalize(text) AS norm,
        | nfc_normalize(text) = text AS was_nfc
        |FROM documents ORDER BY doc_id""".stripMargin,

    "io_orc_roundtrip" ->
      "SELECT * FROM part ORDER BY p_partkey",

    "io_partitioned_scan" ->
      """SELECT l_orderkey, l_linenumber, l_quantity
        |FROM lineitem WHERE l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
  )
}
