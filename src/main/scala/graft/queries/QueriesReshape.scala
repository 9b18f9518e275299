package graft.queries

import org.apache.spark.sql.functions._
import graft.dsl.LazyFrame
import graft.queries.util._

/** Plan-shape battery (SURVEY §2.1/§2.7/§2.8): pivot/unpivot, explode,
  * set ops, distinct variants, sort/top-k, slice, row index, concat.
  */
object QueriesReshape {

  val queries: Map[String, Q] = Map(
    "pivot_wide" -> ((s, d) =>
      lf(s, d, "lineitem")
        .pivot(Seq("l_linestatus"), "l_returnflag", Seq("A", "N", "R"),
          round(sum(col("l_quantity")), 2))
        .sort(col("l_linestatus")).collect()),

    "unpivot_long" -> ((s, d) =>
      lf(s, d, "lineitem")
        .unpivot(Seq("l_orderkey"), Seq("l_quantity", "l_discount", "l_tax"),
          "measure", "val")
        .groupBy(col("measure"))
        .agg(count(lit(1)).as("n"), round(sum(col("val")), 4).as("total"))
        .sort(col("measure")).collect()),

    "explode_words" -> ((s, d) =>
      LazyFrame(t(s, d, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word")))
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("n_docs"))
        .sort(col("n").desc, col("word")).limit(50).collect()),

    "setop_union" -> ((s, d) => {
      val hi = lf(s, d, "orders").filter(col("o_totalprice") > 400000)
        .select(col("o_orderkey"), lit("hi").as("src"))
      val urgent = lf(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), lit("urgent").as("src"))
      hi.vstack(urgent).sort(col("o_orderkey"), col("src")).collect()
    }),

    "setop_intersect" -> ((s, d) => {
      val m1 = lf(s, d, "orders").filter(month(col("o_orderdate")) === 1)
        .select(col("o_custkey"))
      val m2 = lf(s, d, "orders").filter(month(col("o_orderdate")) === 2)
        .select(col("o_custkey"))
      m1.intersect(m2).sort(col("o_custkey")).collect()
    }),

    "setop_except" -> ((s, d) => {
      val m1 = lf(s, d, "orders").filter(month(col("o_orderdate")) === 1)
        .select(col("o_custkey"))
      val m2 = lf(s, d, "orders").filter(month(col("o_orderdate")) === 2)
        .select(col("o_custkey"))
      m1.except(m2).sort(col("o_custkey")).collect()
    }),

    "distinct_subset" -> ((s, d) =>
      lf(s, d, "lineitem")
        .selectNames("l_returnflag", "l_linestatus")
        .unique()
        .sort(col("l_returnflag"), col("l_linestatus")).collect()),

    "unique_keep_first" -> ((s, d) =>
      lf(s, d, "orders")
        .uniqueKeep(Seq("o_custkey"), "first",
          struct(col("o_orderdate"), col("o_orderkey")))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
        .sort(col("o_custkey")).collect()),

    "unique_keep_last" -> ((s, d) =>
      lf(s, d, "orders")
        .uniqueKeep(Seq("o_custkey"), "last",
          struct(col("o_orderdate"), col("o_orderkey")))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
        .sort(col("o_custkey")).collect()),

    "unique_keep_none" -> ((s, d) =>
      lf(s, d, "orders")
        .uniqueKeep(Seq("o_custkey"), "none", col("o_orderkey"))
        .select(col("o_custkey"), col("o_orderkey"))
        .sort(col("o_custkey")).collect()),

    "sort_multi_nulls" -> ((s, d) =>
      LazyFrame(t(s, d, "customer")
        .withColumn("seg", nullif(col("c_mktsegment"), lit("BUILDING"))))
        .select(col("c_custkey"), col("seg"), col("c_nationkey"))
        .sort(col("seg").asc_nulls_last, col("c_nationkey").desc, col("c_custkey"))
        .limit(500).collect()),

    "topk_global" -> ((s, d) =>
      lf(s, d, "orders")
        .topK(25, col("o_totalprice"), negate(col("o_orderkey")).cast("double"))
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("o_totalprice"))
        .sort(col("o_orderkey")).collect()),

    "slice_offset" -> ((s, d) =>
      lf(s, d, "orders")
        .slice(1000, 25, Seq(col("o_orderkey")))
        .select(col("o_orderkey"), col("o_custkey"))
        .sort(col("o_orderkey")).collect()),

    "row_index" -> ((s, d) =>
      lf(s, d, "nation")
        .withRowIndex("idx", Seq(col("n_nationkey")))
        .select(col("idx"), col("n_nationkey"), col("n_name"))
        .sort(col("idx")).collect()),

    "hconcat_zip" -> ((s, d) => {
      val a = lf(s, d, "region").selectNames("r_regionkey", "r_name")
      val b = lf(s, d, "region")
        .select(col("r_regionkey").as("k2"), length(col("r_name")).as("name_len"))
      a.hstack(b, col("r_regionkey"), col("k2"))
        .sort(col("r_regionkey")).collect()
    }),

    "unnest_struct" -> ((s, d) =>
      LazyFrame(t(s, d, "customer")
        .select(col("c_custkey"),
          struct(col("c_name").as("name"), col("c_acctbal").as("bal")).as("info")))
        .unnest("info")
        .select(col("c_custkey"), col("name"), round(col("bal"), 2).as("bal"))
        .sort(col("c_custkey")).collect()),

    // gather: take rows by an index frame (join on row index).
    "gather_by_index" -> ((s, d) => {
      val indexed = lf(s, d, "supplier")
        .withRowIndex("idx", Seq(col("s_suppkey")))
      indexed.filter(col("idx") % 10 === 0)
        .select(col("idx"), col("s_suppkey"), col("s_name"))
        .sort(col("idx")).collect()
    })
  )

  val oracle: Map[String, String] = Map(
    "pivot_wide" ->
      """SELECT l_linestatus,
        | round(sum(CASE WHEN l_returnflag='A' THEN l_quantity END),2) AS "A",
        | round(sum(CASE WHEN l_returnflag='N' THEN l_quantity END),2) AS "N",
        | round(sum(CASE WHEN l_returnflag='R' THEN l_quantity END),2) AS "R"
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "unpivot_long" ->
      """SELECT measure, count(*) AS n, round(sum(val),4) AS total FROM (
        | SELECT 'l_quantity' AS measure, l_quantity AS val FROM lineitem
        | UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        | UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "explode_words" ->
      """SELECT word, count(*) AS n, count(DISTINCT doc_id) AS n_docs FROM (
        | SELECT doc_id, unnest(string_split(text, ' ')) AS word
        | FROM documents WHERE doc_id < 100)
        |GROUP BY 1 ORDER BY n DESC, word LIMIT 50""".stripMargin,

    "setop_union" ->
      """SELECT o_orderkey, 'hi' AS src FROM orders WHERE o_totalprice > 400000
        |UNION ALL
        |SELECT o_orderkey, 'urgent' FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY 1, 2""".stripMargin,

    "setop_intersect" ->
      """SELECT o_custkey FROM orders WHERE month(o_orderdate) = 1
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE month(o_orderdate) = 2
        |ORDER BY 1""".stripMargin,

    "setop_except" ->
      """SELECT o_custkey FROM orders WHERE month(o_orderdate) = 1
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE month(o_orderdate) = 2
        |ORDER BY 1""".stripMargin,

    "distinct_subset" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY 1, 2""".stripMargin,

    "unique_keep_first" ->
      """SELECT o_custkey, o_orderkey, o_orderdate FROM (
        | SELECT o_custkey, o_orderkey, o_orderdate,
        |  row_number() OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey) AS rn FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,

    "unique_keep_last" ->
      """SELECT o_custkey, o_orderkey, o_orderdate FROM (
        | SELECT o_custkey, o_orderkey, o_orderdate,
        |  row_number() OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,

    "unique_keep_none" ->
      """SELECT o_custkey, min(o_orderkey) AS o_orderkey FROM orders
        |GROUP BY 1 HAVING count(*) = 1 ORDER BY 1""".stripMargin,

    "sort_multi_nulls" ->
      """SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg, c_nationkey
        |FROM customer
        |ORDER BY seg ASC NULLS LAST, c_nationkey DESC, c_custkey
        |LIMIT 500""".stripMargin,

    "topk_global" ->
      """SELECT o_orderkey, round(o_totalprice,2) AS o_totalprice FROM (
        | SELECT o_orderkey, o_totalprice FROM orders
        | ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25)
        |ORDER BY o_orderkey""".stripMargin,

    "slice_offset" ->
      """SELECT o_orderkey, o_custkey FROM (
        | SELECT o_orderkey, o_custkey FROM orders
        | ORDER BY o_orderkey LIMIT 25 OFFSET 1000)
        |ORDER BY o_orderkey""".stripMargin,

    "row_index" ->
      """SELECT row_number() OVER (ORDER BY n_nationkey) - 1 AS idx,
        | n_nationkey, n_name
        |FROM nation ORDER BY idx""".stripMargin,

    "hconcat_zip" ->
      """SELECT a.r_regionkey, a.r_name, b.k2, b.name_len FROM
        | (SELECT r_regionkey, r_name FROM region) a
        |FULL JOIN
        | (SELECT r_regionkey AS k2, CAST(length(r_name) AS INTEGER) AS name_len
        |  FROM region) b
        | ON a.r_regionkey = b.k2
        |ORDER BY a.r_regionkey""".stripMargin,

    "unnest_struct" ->
      """SELECT c_custkey, c_name AS name, round(c_acctbal,2) AS bal
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "gather_by_index" ->
      """SELECT idx, s_suppkey, s_name FROM (
        | SELECT row_number() OVER (ORDER BY s_suppkey) - 1 AS idx, s_suppkey, s_name
        | FROM supplier)
        |WHERE idx % 10 = 0 ORDER BY idx""".stripMargin
  )
}
