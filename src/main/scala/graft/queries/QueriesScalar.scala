package graft.queries

import org.apache.spark.sql.functions._
import graft.queries.util._
import graft.{functions => gf}

/** Scalar function surface (SURVEY §2.9): strings, JSON, temporal, math,
  * boolean/null, list/array HOFs, struct.
  */
object QueriesScalar {

  val queries: Map[String, Q] = Map(
    "str_basics" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("up"),
        lower(col("p_brand")).as("lo"),
        length(col("p_name")).as("len"),
        substring(col("p_name"), 1, 5).as("pre"),
        reverse(col("p_type")).as("rev"),
        lpad(col("p_brand"), 12, "_").as("pad"),
        trim(col("p_name")).as("trm"),
        gf.zfill(col("p_size").cast("string"), 4).as("zf"))
        .orderBy(col("p_partkey"))),

    "str_predicates" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        col("p_name").contains("red").as("has_red"),
        col("p_name").startsWith("a").as("sw"),
        col("p_name").endsWith("e").as("ew"),
        col("p_type").like("%BRASS%").as("lk"))
        .orderBy(col("p_partkey"))),

    "str_regex" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
        regexp_count(col("p_name"), lit("a")).as("n_a"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("novowel"),
        split(col("p_type"), " ").getItem(0).as("type_head"))
        .orderBy(col("p_partkey"))),

    "str_json" -> ((s, d) =>
      t(s, d, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy(col("event_id"))),

    "str_concat_format" -> ((s, d) =>
      t(s, d, "supplier").select(
        col("s_suppkey"),
        concat_ws("|", col("s_name"), col("s_nationkey")).as("cat"),
        format_string("%s-%05d", col("s_name"), col("s_suppkey")).as("fmt"))
        .orderBy(col("s_suppkey"))),

    "dt_parts" -> ((s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        dayofyear(col("o_orderdate")).as("doy"),
        hour(col("o_orderdate")).as("h"),
        minute(col("o_orderdate")).as("mi"),
        second(col("o_orderdate")).as("sec"))
        .orderBy(col("o_orderkey"))),

    "dt_trunc_arith" -> ((s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
        add_months(col("o_orderdate").cast("date"), 2).as("plus2mo"),
        last_day(col("o_orderdate").cast("date")).as("eom"),
        datediff(lit("1998-12-31").cast("date"), col("o_orderdate").cast("date")).as("days_to_end"))
        .orderBy(col("o_orderkey"))),

    "dt_epoch_convert" -> ((s, d) =>
      t(s, d, "events").select(
        col("event_id"),
        unix_micros(col("ts")).as("us"),
        (unix_micros(col("ts")) / lit(1000000L)).cast("long").as("sec"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm").as("fmt"))
        .orderBy(col("event_id"))),

    "dt_business_days" -> ((s, d) =>
      t(s, d, "orders").filter(col("o_orderkey") <= 2000).select(
        col("o_orderkey"),
        gf.businessDayCount(col("o_orderdate").cast("date"),
          lit("2002-12-31").cast("date")).as("bdays"))
        .orderBy(col("o_orderkey"))),

    "math_funcs" -> ((s, d) =>
      t(s, d, "lineitem").filter(col("l_orderkey") <= 1000).select(
        col("l_orderkey"), col("l_linenumber"),
        round(abs(col("l_discount") - col("l_tax")), 6).as("ad"),
        floor(col("l_extendedprice")).as("fl"),
        ceil(col("l_extendedprice")).as("ce"),
        round(sqrt(col("l_quantity")), 6).as("sq"),
        round(pow(col("l_discount"), 2), 8).as("p2"),
        round(exp(col("l_discount")), 8).as("ex"),
        round(log1p(col("l_quantity")), 8).as("l1p"),
        round(sin(col("l_tax")), 8).as("sn"),
        round(atan2(col("l_discount"), col("l_tax") + lit(0.01)), 8).as("at2"),
        signum(col("l_discount") - lit(0.05)).as("sgn"),
        (col("l_quantity") % 7).as("md"),
        gf.floorDiv(col("l_quantity"), lit(7)).as("fd"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    "math_clip_binning" -> ((s, d) =>
      t(s, d, "customer").select(
        col("c_custkey"),
        round(gf.clip(col("c_acctbal"), lit(0.0), lit(5000.0)), 2).as("clipped"),
        gf.cut(col("c_acctbal"), Seq(0.0, 2500.0, 7500.0),
          Seq("low", "mid", "high", "top")).as("bucket"))
        .orderBy(col("c_custkey"))),

    "math_corr" -> ((s, d) =>
      t(s, d, "lineitem").groupBy(col("l_returnflag")).agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("cov_qp"),
        round(covar_pop(col("l_quantity"), col("l_extendedprice")), 4).as("covp_qp"))
        .orderBy(col("l_returnflag"))),

    "bool_null_ops" -> ((s, d) =>
      t(s, d, "customer").select(
        col("c_custkey"),
        col("c_mktsegment").isin("BUILDING", "MACHINERY").as("seg_in"),
        col("c_acctbal").between(0, 1000).as("bal_band"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("seg2"),
        when(col("c_acctbal") < 0, "neg")
          .when(col("c_acctbal") < 5000, "small").otherwise("big").as("band"),
        isnull(nullif(col("c_mktsegment"), lit("BUILDING"))).as("is_b"))
        .orderBy(col("c_custkey"))),

    "bool_horizontal" -> ((s, d) =>
      t(s, d, "lineitem").filter(col("l_orderkey") <= 1000).select(
        col("l_orderkey"), col("l_linenumber"),
        round(gf.sumHorizontal(col("l_discount"), col("l_tax")), 6).as("hsum"),
        round(gf.minHorizontal(col("l_discount"), col("l_tax")), 6).as("hmin"),
        round(gf.maxHorizontal(col("l_quantity"), col("l_extendedprice")), 2).as("hmax"),
        (gf.anyHorizontal(col("l_discount") > 0.05, col("l_tax") > 0.05)).as("hany"),
        (gf.allHorizontal(col("l_discount") > 0.01, col("l_tax") > 0.01)).as("hall"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    "list_basics" -> ((s, d) =>
      t(s, d, "embeddings").select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 6).as("first"),
        round(element_at(col("embedding"), -1).cast("double"), 6).as("last"),
        round(array_max(transform(col("embedding"), x => x.cast("double"))), 6).as("mx"),
        round(array_min(transform(col("embedding"), x => x.cast("double"))), 6).as("mn"))
        .orderBy(col("vec_id"))),

    "list_hof" -> ((s, d) =>
      t(s, d, "embeddings").select(
        col("vec_id"),
        round(gf.listSum(col("embedding")), 6).as("sum"),
        round(gf.listMean(col("embedding")), 6).as("mean"),
        size(filter(col("embedding"), x => x > 0)).as("n_pos"),
        round(aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast("double") * x.cast("double")), 6).as("sumsq"))
        .orderBy(col("vec_id"))),

    "list_set_ops" -> ((s, d) => {
      val words = split(lower(col("text")), " ")
      val a = t(s, d, "documents").filter(col("doc_id") % 2 === 0)
        .select((col("doc_id") / 2).cast("long").as("pair_id"), words.as("wa"))
      val b = t(s, d, "documents").filter(col("doc_id") % 2 === 1)
        .select(((col("doc_id") - 1) / 2).cast("long").as("pair_id"), words.as("wb"))
      a.join(b, Seq("pair_id"))
        .select(col("pair_id"),
          size(array_distinct(array_intersect(col("wa"), col("wb")))).as("n_common"),
          size(array_distinct(array_union(col("wa"), col("wb")))).as("n_union"),
          size(array_distinct(array_except(col("wa"), col("wb")))).as("n_only_a"))
        .orderBy(col("pair_id"))
    }),

    "struct_ops" -> ((s, d) =>
      t(s, d, "customer").select(
        col("c_custkey"),
        struct(col("c_name").as("name"), col("c_acctbal").as("bal")).getField("name").as("sname"),
        struct(col("c_nationkey").as("nk"), col("c_mktsegment").as("seg"))
          .getField("seg").as("sseg"))
        .orderBy(col("c_custkey"))),

    "range_sequence" -> ((s, d) =>
      t(s, d, "lineitem").filter(col("l_orderkey") <= 500)
        .select(col("l_orderkey"), col("l_linenumber"),
          explode(sequence(lit(1), col("l_linenumber"))).as("i"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("i")))
  )

  val oracle: Map[String, String] = Map(
    "str_basics" ->
      """SELECT p_partkey, upper(p_name) AS up, lower(p_brand) AS lo,
        | length(p_name)::INT AS len, substring(p_name, 1, 5) AS pre,
        | reverse(p_type) AS rev, lpad(p_brand, 12, '_') AS pad,
        | trim(p_name) AS trm, lpad(CAST(p_size AS VARCHAR), 4, '0') AS zf
        |FROM part ORDER BY p_partkey""".stripMargin,

    "str_predicates" ->
      """SELECT p_partkey, contains(p_name, 'red') AS has_red,
        | starts_with(p_name, 'a') AS sw, ends_with(p_name, 'e') AS ew,
        | p_type LIKE '%BRASS%' AS lk
        |FROM part ORDER BY p_partkey""".stripMargin,

    "str_regex" ->
      """SELECT p_partkey, regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
        | (length(p_name) - length(replace(p_name, 'a', '')))::INT AS n_a,
        | regexp_replace(p_name, '[aeiou]', '_', 'g') AS novowel,
        | string_split(p_type, ' ')[1] AS type_head
        |FROM part ORDER BY p_partkey""".stripMargin,

    "str_json" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "str_concat_format" ->
      """SELECT s_suppkey, concat_ws('|', s_name, s_nationkey) AS cat,
        | printf('%s-%05d', s_name, s_suppkey) AS fmt
        |FROM supplier ORDER BY s_suppkey""".stripMargin,

    "dt_parts" ->
      """SELECT o_orderkey, year(o_orderdate)::INT AS y, quarter(o_orderdate)::INT AS q,
        | month(o_orderdate)::INT AS m, dayofmonth(o_orderdate)::INT AS dom,
        | dayofyear(o_orderdate)::INT AS doy, hour(o_orderdate)::INT AS h,
        | minute(o_orderdate)::INT AS mi, CAST(second(o_orderdate) AS INTEGER) AS sec
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "dt_trunc_arith" ->
      """SELECT o_orderkey, CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        | CAST(o_orderdate AS DATE) + 30 AS plus30,
        | CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTHS AS DATE) AS plus2mo,
        | last_day(CAST(o_orderdate AS DATE)) AS eom,
        | datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31')::INT AS days_to_end
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "dt_epoch_convert" ->
      """SELECT event_id, epoch_us(ts) AS us,
        | CAST(floor(epoch_us(ts) / 1000000) AS BIGINT) AS sec,
        | strftime(ts, '%Y-%m-%d %H:%M') AS fmt
        |FROM events ORDER BY event_id""".stripMargin,

    "dt_business_days" ->
      """SELECT o_orderkey,
        | CAST(len(list_filter(generate_series(CAST(o_orderdate AS DATE),
        |    DATE '2002-12-30', INTERVAL 1 DAY),
        |   d -> dayofweek(d) NOT IN (0, 6))) AS BIGINT) AS bdays
        |FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey""".stripMargin,

    "math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        | round(abs(l_discount - l_tax), 6) AS ad,
        | CAST(floor(l_extendedprice) AS BIGINT) AS fl,
        | CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
        | round(sqrt(l_quantity), 6) AS sq,
        | round(pow(l_discount, 2), 8) AS p2,
        | round(exp(l_discount), 8) AS ex,
        | round(ln(1 + l_quantity), 8) AS l1p,
        | round(sin(l_tax), 8) AS sn,
        | round(atan2(l_discount, l_tax + 0.01), 8) AS at2,
        | CAST(CASE WHEN l_discount - 0.05 > 0 THEN 1.0 WHEN l_discount - 0.05 < 0 THEN -1.0 ELSE 0.0 END AS DOUBLE) AS sgn,
        | fmod(l_quantity, 7) AS md,
        | CAST(floor(l_quantity / 7) AS BIGINT) AS fd
        |FROM lineitem WHERE l_orderkey <= 1000 ORDER BY 1, 2""".stripMargin,

    "math_clip_binning" ->
      """SELECT c_custkey,
        | round(least(greatest(c_acctbal, 0.0), 5000.0), 2) AS clipped,
        | CASE WHEN c_acctbal <= 0.0 THEN 'low' WHEN c_acctbal <= 2500.0 THEN 'mid'
        |      WHEN c_acctbal <= 7500.0 THEN 'high' ELSE 'top' END AS bucket
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "math_corr" ->
      """SELECT l_returnflag, round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
        | round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qp,
        | round(covar_pop(l_quantity, l_extendedprice), 4) AS covp_qp
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "bool_null_ops" ->
      """SELECT c_custkey, c_mktsegment IN ('BUILDING','MACHINERY') AS seg_in,
        | c_acctbal BETWEEN 0 AND 1000 AS bal_band,
        | coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg2,
        | CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'small'
        |      ELSE 'big' END AS band,
        | nullif(c_mktsegment, 'BUILDING') IS NULL AS is_b
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "bool_horizontal" ->
      """SELECT l_orderkey, l_linenumber,
        | round(coalesce(l_discount,0) + coalesce(l_tax,0), 6) AS hsum,
        | round(least(l_discount, l_tax), 6) AS hmin,
        | round(greatest(l_quantity, l_extendedprice), 2) AS hmax,
        | (l_discount > 0.05 OR l_tax > 0.05) AS hany,
        | (l_discount > 0.01 AND l_tax > 0.01) AS hall
        |FROM lineitem WHERE l_orderkey <= 1000 ORDER BY 1, 2""".stripMargin,

    "list_basics" ->
      """SELECT vec_id, len(embedding)::INT AS dim,
        | round(CAST(embedding[1] AS DOUBLE), 6) AS first,
        | round(CAST(embedding[-1] AS DOUBLE), 6) AS last,
        | round(list_max(embedding::DOUBLE[]), 6) AS mx,
        | round(list_min(embedding::DOUBLE[]), 6) AS mn
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "list_hof" ->
      """SELECT vec_id,
        | round(list_sum(embedding::DOUBLE[]), 6) AS sum,
        | round(list_sum(embedding::DOUBLE[]) / len(embedding), 6) AS mean,
        | CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos,
        | round(list_sum(list_transform(embedding::DOUBLE[], x -> x*x)), 6) AS sumsq
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "list_set_ops" ->
      """WITH a AS (SELECT CAST(doc_id/2 AS BIGINT) AS pair_id,
        |  string_split(lower(text), ' ') AS wa FROM documents WHERE doc_id % 2 = 0),
        | b AS (SELECT CAST((doc_id-1)/2 AS BIGINT) AS pair_id,
        |  string_split(lower(text), ' ') AS wb FROM documents WHERE doc_id % 2 = 1)
        |SELECT pair_id,
        | CAST(len(list_distinct(list_intersect(wa, wb))) AS INTEGER) AS n_common,
        | CAST(len(list_distinct(list_concat(wa, wb))) AS INTEGER) AS n_union,
        | CAST(len(list_distinct(list_filter(wa, x -> NOT list_contains(wb, x)))) AS INTEGER) AS n_only_a
        |FROM a JOIN b USING (pair_id) ORDER BY pair_id""".stripMargin,

    "struct_ops" ->
      """SELECT c_custkey, c_name AS sname, c_mktsegment AS sseg
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "range_sequence" ->
      """SELECT l_orderkey, l_linenumber, CAST(unnest(generate_series(1, l_linenumber)) AS INTEGER) AS i
        |FROM lineitem WHERE l_orderkey <= 500 ORDER BY 1, 2, 3""".stripMargin
  )
}
