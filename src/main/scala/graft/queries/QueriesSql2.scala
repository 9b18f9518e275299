package graft.queries

import org.apache.spark.sql.SparkSession

import util._

/** The rest of the TPC-H battery (reference
  * `docs/source/user-guide/misc/comparison.md:8-12` points at the
  * TPC-H-derived pola-rs benchmark): q2 / q9 / q11 / q12 / q16 / q19 /
  * q20 / q21, adapted to the driver's TPC-H-ish schema exactly like
  * [[QueriesSql]] (no partsupp table — lineitem stands in as the
  * part×supplier fact; no l_commitdate / l_receiptdate / l_shipmode /
  * p_container / p_mfgr columns). Each text preserves the original
  * query's STRUCTURE — the decorrelation path Catalyst has to take —
  * and runs verbatim on both Spark and the DuckDB oracle:
  *
  *   - q2: correlated scalar MIN-subquery whose body is itself a
  *     4-table join (decorrelates to an aggregated join on the
  *     correlation key).
  *   - q9: 5-table join under a substring filter, grouped by a derived
  *     (nation, year) pair.
  *   - q11: uncorrelated scalar subquery in HAVING (the group filter
  *     compares against an aggregate of a second full scan).
  *   - q12: conditional CASE counts after a date-window join.
  *   - q16: COUNT(DISTINCT) under a NOT IN subquery (null-aware anti
  *     join).
  *   - q19: disjunction of conjunctive join predicates — Catalyst must
  *     extract the common p_partkey = l_partkey equi-condition out of
  *     the OR to avoid a BNLJ.
  *   - q20: IN-subquery whose body contains a correlated scalar AVG
  *     subquery (two decorrelation levels).
  *   - q21: EXISTS + NOT EXISTS against the same fact (left semi and
  *     left anti joins stacked on one scan).
  *
  * Integer aggregates are CAST to BIGINT in-text because DuckDB widens
  * sum(INTEGER/BIGINT) to HUGEINT (arrow decimal128) while Spark stays
  * int64 — the r7 `win_rolling_by_value` hash-fail class. q11's value
  * metric is built from integer cents so the HAVING threshold compare
  * cannot flip on cross-engine float summation order.
  */
object QueriesSql2 {

  private def views(s: SparkSession, d: String, names: String*): Unit =
    names.foreach(n => t(s, d, n).createOrReplaceTempView(n))

  private val q2Sql =
    """SELECT DISTINCT s_name, s_acctbal, n_name, p_partkey, p_brand
      |FROM part, supplier, lineitem, nation, region
      |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'EUROPE' AND p_size = 15
      |  AND l_extendedprice / l_quantity = (
      |    SELECT min(l2.l_extendedprice / l2.l_quantity)
      |    FROM lineitem l2, supplier s2, nation n2, region r2
      |    WHERE l2.l_partkey = p_partkey AND s2.s_suppkey = l2.l_suppkey
      |      AND s2.s_nationkey = n2.n_nationkey
      |      AND n2.n_regionkey = r2.r_regionkey
      |      AND r2.r_name = 'EUROPE')
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey""".stripMargin

  // profit is computed in integer THOUSANDTHS of a dollar (revenue
  // rounded to mills, cost = cents × integral quantity, both exact
  // BIGINTs) — a double `round(sum(amount), 2)` flipped one group by a
  // cent between engines at sf0.01 because float summation order
  // differs; integer sums are order-insensitive
  private val q9Sql =
    """SELECT nation, o_year, CAST(sum(amount_m) AS BIGINT) AS sum_profit_m
      |FROM (
      | SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |  CAST(round(l_extendedprice * (1 - l_discount) * 1000) AS BIGINT)
      |    - CAST(round(p_retailprice * 100) AS BIGINT)
      |      * CAST(round(l_quantity) AS BIGINT) AS amount_m
      | FROM part, supplier, lineitem, orders, nation
      | WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
      |   AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
      |   AND p_name LIKE '%widget%') profit
      |GROUP BY nation, o_year
      |ORDER BY nation, o_year DESC""".stripMargin

  private val q11Sql =
    """SELECT l_partkey,
      | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      |   * CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS value_c
      |FROM lineitem, supplier, nation
      |WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      |  AND n_name = 'NATION_1'
      |GROUP BY l_partkey
      |HAVING sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      |    * CAST(round(l_quantity) AS BIGINT)) >
      |  (SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      |     * CAST(round(l_quantity) AS BIGINT)) * 0.0002
      |   FROM lineitem, supplier, nation
      |   WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      |     AND n_name = 'NATION_1')
      |ORDER BY value_c DESC, l_partkey""".stripMargin

  private val q12Sql =
    """SELECT l_linestatus,
      | CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
      |   OR o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT)
      |   AS high_line_count,
      | CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT'
      |   AND o_orderpriority <> '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT)
      |   AS low_line_count
      |FROM orders, lineitem
      |WHERE o_orderkey = l_orderkey AND l_shipdate >= o_orderdate
      |  AND l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  private val q16Sql =
    """SELECT p_brand, p_type, p_size,
      | CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey AND p_brand <> 'Brand#5'
      |  AND p_type NOT LIKE 'MEDIUM%'
      |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
      |                        WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // revenue in integer cents, same reason as q9: a float sum's rounding
  // can flip by a cent between engines when summation order differs
  private val q19Sql =
    """SELECT CAST(sum(
      |  CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
      |) AS BIGINT) AS revenue_c
      |FROM lineitem, part
      |WHERE (p_partkey = l_partkey AND p_brand = 'Brand#12'
      |       AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_partkey = l_partkey AND p_brand = 'Brand#21'
      |       AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_partkey = l_partkey AND p_brand = 'Brand#25'
      |       AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  private val q20Sql =
    """SELECT s_name, s_acctbal
      |FROM supplier, nation
      |WHERE s_suppkey IN (
      |   SELECT l1.l_suppkey FROM lineitem l1
      |   WHERE l1.l_partkey IN (SELECT p_partkey FROM part
      |                          WHERE p_name LIKE 'red%')
      |     AND l1.l_quantity > (SELECT 0.5 * avg(l2.l_quantity)
      |                          FROM lineitem l2
      |                          WHERE l2.l_partkey = l1.l_partkey
      |                            AND l2.l_suppkey = l1.l_suppkey))
      |  AND s_nationkey = n_nationkey
      |  AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      |ORDER BY s_name, s_acctbal""".stripMargin

  private val q21Sql =
    """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
      |FROM supplier, lineitem l1, orders, nation
      |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      |  AND o_orderstatus = 'F' AND l1.l_shipdate > TIMESTAMP '1997-06-01'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > TIMESTAMP '1997-06-01')
      |  AND s_nationkey = n_nationkey AND n_name = 'NATION_2'
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name""".stripMargin

  val queries: Map[String, Q] = Map(
    "sql_tpch_q2" -> ((s, d) => {
      views(s, d, "part", "supplier", "lineitem", "nation", "region")
      s.sql(q2Sql)
    }),
    "sql_tpch_q9" -> ((s, d) => {
      views(s, d, "part", "supplier", "lineitem", "orders", "nation")
      s.sql(q9Sql)
    }),
    "sql_tpch_q11" -> ((s, d) => {
      views(s, d, "lineitem", "supplier", "nation"); s.sql(q11Sql)
    }),
    "sql_tpch_q12" -> ((s, d) => {
      views(s, d, "orders", "lineitem"); s.sql(q12Sql)
    }),
    "sql_tpch_q16" -> ((s, d) => {
      views(s, d, "lineitem", "part", "supplier"); s.sql(q16Sql)
    }),
    "sql_tpch_q19" -> ((s, d) => {
      views(s, d, "lineitem", "part"); s.sql(q19Sql)
    }),
    "sql_tpch_q20" -> ((s, d) => {
      views(s, d, "supplier", "nation", "lineitem", "part"); s.sql(q20Sql)
    }),
    "sql_tpch_q21" -> ((s, d) => {
      views(s, d, "supplier", "lineitem", "orders", "nation"); s.sql(q21Sql)
    })
  )

  val oracle: Map[String, String] = Map(
    "sql_tpch_q2" -> q2Sql,
    "sql_tpch_q9" -> q9Sql,
    "sql_tpch_q11" -> q11Sql,
    "sql_tpch_q12" -> q12Sql,
    "sql_tpch_q16" -> q16Sql,
    "sql_tpch_q19" -> q19Sql,
    "sql_tpch_q20" -> q20Sql,
    "sql_tpch_q21" -> q21Sql
  )
}
