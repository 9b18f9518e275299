package graft.queries

import org.apache.spark.sql.functions._
import graft.queries.util._

/** Round-3 scalar-surface widening (SURVEY §2.9 gaps): string slice/pad/
  * split/case/base-conversion, calendar-saturating offsets, duration parts,
  * bitwise ops, list ops (sort/position/enumerate), struct→JSON, repeat_by.
  * All pure `org.apache.spark.sql.functions` composition — codegen'd, no UDFs.
  */
object QueriesScalar2 {

  val queries: Map[String, Q] = Map(
    // polars str.slice/head/tail + pad/repeat/translate/find
    // (reference crates/polars-plan/src/dsl/function_expr/strings.rs:9-139)
    "str_slice_ops" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        expr("left(p_name, 3)").as("l3"),
        expr("right(p_name, 4)").as("r4"),
        translate(col("p_type"), "AEIOU", "aeiou").as("tr"),
        repeat(col("p_brand"), 2).as("rep"),
        ascii(col("p_name")).as("asc"),
        instr(col("p_name"), "a").as("ins"),
        rpad(col("p_brand"), 12, ".").as("rp"))
        .orderBy(col("p_partkey"))),

    // polars str.split_exact / splitn / extract_all / join
    "str_split_part" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        element_at(split(col("p_name"), " "), 1).as("part1"),
        coalesce(try_element_at(split(col("p_name"), " "), lit(2)), lit("")).as("part2"),
        size(split(col("p_name"), " ")).as("n_parts"),
        array_join(regexp_extract_all(col("p_name"), lit("[aeiou]+"), lit(0)), "").as("vowels"),
        array_join(split(col("p_name"), " "), "_").as("joined"))
        .orderBy(col("p_partkey"))),

    // polars str.to_titlecase → initcap (rest-of-word lowercased)
    "str_case_title" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        initcap(col("p_name")).as("title"),
        upper(col("p_type")).as("up"),
        lower(col("p_brand")).as("lo"))
        .orderBy(col("p_partkey"))),

    // polars str.to_integer(base)/hex round-trip + bin
    "str_conv_base" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        hex(col("p_partkey")).as("hx"),
        conv(hex(col("p_partkey")), 16, 10).cast("long").as("back"),
        bin(col("p_partkey")).as("b2"))
        .orderBy(col("p_partkey"))),

    // polars dt.offset_by with saturating month arithmetic (SURVEY §2.9
    // Temporal gaps: "1mo_saturating") + month_start/month_end
    "dt_offset_by" -> ((s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        add_months(col("o_orderdate").cast("date"), 1).as("plus_1mo"),
        date_sub(col("o_orderdate").cast("date"), 1).as("minus_1d"),
        date_add(col("o_orderdate").cast("date"), 7).as("plus_1w"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        last_day(col("o_orderdate").cast("date")).as("month_end"),
        dayofmonth(last_day(col("o_orderdate").cast("date"))).as("days_in_month"))
        .orderBy(col("o_orderkey"))),

    // polars duration total_days/hours/minutes/seconds/milliseconds between
    // consecutive events per user (dsl/function_expr/datetime.rs duration parts)
    "dt_duration_parts" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, d, "events").filter(col("user_id") <= 20)
        .withColumn("next_ts", lead(col("ts"), 1).over(w))
        .select(
          col("event_id"), col("user_id"),
          (unix_micros(col("next_ts")) - unix_micros(col("ts"))).as("dur_us"),
          ((unix_micros(col("next_ts")) - unix_micros(col("ts"))) / lit(1000L))
            .cast("long").as("dur_ms"),
          ((unix_micros(col("next_ts")) - unix_micros(col("ts"))) / lit(1000000L))
            .cast("long").as("dur_sec"),
          ((unix_micros(col("next_ts")) - unix_micros(col("ts"))) / lit(60000000L))
            .cast("long").as("dur_min"))
        .orderBy(col("event_id"))
    }),

    // polars bitwise namespace (function_expr/bitwise.rs): count_ones,
    // and/or/xor, shifts — row level
    "math_bitwise" -> ((s, d) =>
      t(s, d, "lineitem").filter(col("l_orderkey") <= 1000).select(
        col("l_orderkey"), col("l_linenumber"),
        bit_count(col("l_orderkey")).as("bc"),
        col("l_orderkey").bitwiseAND(col("l_suppkey")).as("ba"),
        col("l_orderkey").bitwiseOR(col("l_suppkey")).as("bo"),
        col("l_orderkey").bitwiseXOR(col("l_suppkey")).as("bx"),
        shiftleft(col("l_linenumber"), 2).cast("long").as("shl"),
        shiftright(col("l_orderkey"), 3).as("shr"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // polars bitwise aggregations (crates/polars-expr/src/reduce/bitwise.rs)
    "agg_bitwise" -> ((s, d) =>
      t(s, d, "lineitem").groupBy(col("l_returnflag")).agg(
        expr("bit_and(l_suppkey)").as("band"),
        expr("bit_or(l_suppkey)").as("bor"),
        expr("bit_xor(l_suppkey)").as("bxor"))
        .orderBy(col("l_returnflag"))),

    // polars list.sort/reverse/arg_max/contains on the embedding column; the
    // top3 list serializes to a '|'-joined decimal string for the hash gate
    "list_ops2" -> ((s, d) => {
      val embD = transform(col("embedding"), x => x.cast("double"))
      t(s, d, "embeddings").select(
        col("vec_id"),
        array_join(transform(slice(reverse(array_sort(embD)), 1, 3),
          x => round(x, 6).cast("decimal(18,6)").cast("string")), "|").as("top3"),
        array_position(embD, array_max(embD)).as("argmax"),
        round(element_at(reverse(embD), 1), 6).as("rev_first"),
        (size(filter(embD, x => x > 0.5)) > 0).as("has_big"))
        .orderBy(col("vec_id"))
    }),

    // polars list.gather / enumerate: positional explode of a list prefix
    "list_enumerate" -> ((s, d) =>
      t(s, d, "embeddings")
        .select(col("vec_id"), posexplode(slice(col("embedding"), 1, 3)))
        .select(col("vec_id"), (col("pos") + 1).as("pos1"),
          round(col("col").cast("double"), 6).as("val"))
        .orderBy(col("vec_id"), col("pos1"))),

    // polars struct.json_encode + json_decode round-trip
    // (function_expr/struct_.rs JsonEncode; strings.rs JsonDecode)
    "struct_json" -> ((s, d) => {
      val js = to_json(struct(col("c_custkey").as("k"), col("c_mktsegment").as("seg")))
      t(s, d, "customer").select(
        col("c_custkey"),
        js.as("js"),
        get_json_object(js, "$.seg").as("seg_back"))
        .orderBy(col("c_custkey"))
    }),

    // polars repeat_by (FunctionExpr::RepeatBy): value repeated n times → explode
    "misc_repeat_by" -> ((s, d) =>
      t(s, d, "part").filter(col("p_partkey") <= 500)
        .select(col("p_partkey"),
          explode(array_repeat(col("p_brand"), (col("p_size") % 3 + 1).cast("int")))
            .as("brand_rep"))
        .orderBy(col("p_partkey")))
  )

  val oracle: Map[String, String] = Map(
    "str_slice_ops" ->
      """SELECT p_partkey, left(p_name, 3) AS l3, right(p_name, 4) AS r4,
        | translate(p_type, 'AEIOU', 'aeiou') AS tr, repeat(p_brand, 2) AS rep,
        | ascii(p_name) AS asc, CAST(instr(p_name, 'a') AS INTEGER) AS ins,
        | rpad(p_brand, 12, '.') AS rp
        |FROM part ORDER BY p_partkey""".stripMargin,

    "str_split_part" ->
      """SELECT p_partkey, split_part(p_name, ' ', 1) AS part1,
        | split_part(p_name, ' ', 2) AS part2,
        | CAST(len(string_split(p_name, ' ')) AS INTEGER) AS n_parts,
        | array_to_string(regexp_extract_all(p_name, '[aeiou]+'), '') AS vowels,
        | array_to_string(string_split(p_name, ' '), '_') AS joined
        |FROM part ORDER BY p_partkey""".stripMargin,

    "str_case_title" ->
      """SELECT p_partkey,
        | array_to_string(list_transform(string_split(p_name, ' '),
        |   w -> CASE WHEN len(w) = 0 THEN w
        |        ELSE upper(w[1]) || lower(w[2:]) END), ' ') AS title,
        | upper(p_type) AS up, lower(p_brand) AS lo
        |FROM part ORDER BY p_partkey""".stripMargin,

    "str_conv_base" ->
      """SELECT p_partkey, to_hex(p_partkey) AS hx,
        | ('0x' || to_hex(p_partkey))::BIGINT AS back,
        | bin(p_partkey) AS b2
        |FROM part ORDER BY p_partkey""".stripMargin,

    "dt_offset_by" ->
      """SELECT o_orderkey,
        | CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE) AS plus_1mo,
        | CAST(o_orderdate AS DATE) - 1 AS minus_1d,
        | CAST(o_orderdate AS DATE) + 7 AS plus_1w,
        | CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        | last_day(CAST(o_orderdate AS DATE)) AS month_end,
        | CAST(day(last_day(CAST(o_orderdate AS DATE))) AS INTEGER) AS days_in_month
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "dt_duration_parts" ->
      """SELECT event_id, user_id,
        | epoch_us(next_ts) - epoch_us(ts) AS dur_us,
        | (epoch_us(next_ts) - epoch_us(ts)) // 1000 AS dur_ms,
        | (epoch_us(next_ts) - epoch_us(ts)) // 1000000 AS dur_sec,
        | (epoch_us(next_ts) - epoch_us(ts)) // 60000000 AS dur_min
        |FROM (SELECT event_id, user_id, ts,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
        | FROM events WHERE user_id <= 20)
        |ORDER BY event_id""".stripMargin,

    "math_bitwise" ->
      """SELECT l_orderkey, l_linenumber,
        | CAST(bit_count(l_orderkey) AS INTEGER) AS bc,
        | l_orderkey & l_suppkey AS ba,
        | l_orderkey | l_suppkey AS bo,
        | xor(l_orderkey, l_suppkey) AS bx,
        | CAST(l_linenumber << 2 AS BIGINT) AS shl,
        | l_orderkey >> 3 AS shr
        |FROM lineitem WHERE l_orderkey <= 1000 ORDER BY 1, 2""".stripMargin,

    "agg_bitwise" ->
      """SELECT l_returnflag, bit_and(l_suppkey) AS band,
        | bit_or(l_suppkey) AS bor, bit_xor(l_suppkey) AS bxor
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "list_ops2" ->
      """SELECT vec_id,
        | array_to_string(list_transform(list_reverse_sort(embedding::DOUBLE[])[1:3],
        |   x -> CAST(CAST(round(x, 6) AS DECIMAL(18,6)) AS VARCHAR)), '|') AS top3,
        | CAST(list_position(embedding::DOUBLE[],
        |   list_max(embedding::DOUBLE[])) AS BIGINT) AS argmax,
        | round(list_reverse(embedding::DOUBLE[])[1], 6) AS rev_first,
        | len(list_filter(embedding::DOUBLE[], x -> x > 0.5)) > 0 AS has_big
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "list_enumerate" ->
      """SELECT vec_id, CAST(i AS INTEGER) AS pos1,
        | round(embedding[i]::DOUBLE, 6) AS val
        |FROM embeddings, generate_series(1, 3) AS t(i)
        |ORDER BY vec_id, pos1""".stripMargin,

    "struct_json" ->
      """SELECT c_custkey,
        | to_json(struct_pack(k := c_custkey, seg := c_mktsegment))::VARCHAR AS js,
        | c_mktsegment AS seg_back
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "misc_repeat_by" ->
      """SELECT p_partkey,
        | unnest(list_transform(generate_series(1, p_size % 3 + 1), x -> p_brand)) AS brand_rep
        |FROM part WHERE p_partkey <= 500 ORDER BY p_partkey""".stripMargin
  )
}
