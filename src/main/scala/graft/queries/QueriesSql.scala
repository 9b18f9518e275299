package graft.queries

import org.apache.spark.sql.SparkSession

import util._

/** SQL-frontend feature battery (SURVEY §3.3): the subquery/CTE/set-op shapes
  * the reference's SQLContext compiles (crates/polars-sql/src/context.rs —
  * correlated EXISTS, IN-subqueries, scalar subqueries, CTEs, ROLLUP,
  * INTERSECT), each expressed as ONE SQL text that runs verbatim on both
  * Spark and the DuckDB oracle. The shapes are the classic TPC-H q4 / q7 /
  * q8 / q13 / q15 / q17 / q18 / q22 patterns, adapted to the driver's
  * TPC-H-ish schema (no partsupp table, no l_commitdate/l_shipmode columns).
  *
  * Catalyst compiles every subquery here to a join — EXISTS/IN → left semi,
  * NOT EXISTS → left anti, correlated scalar agg → aggregated left outer —
  * so each runs as a shuffle join at 100 TB, never a per-row probe.
  */
object QueriesSql {

  private def views(s: SparkSession, d: String, names: String*): Unit =
    names.foreach(n => t(s, d, n).createOrReplaceTempView(n))

  /** TPC-H q4 shape: correlated EXISTS with a non-equality predicate
    * (compiles to left semi join on l_orderkey + the range condition). */
  private val existsCorrSql =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-07-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** TPC-H q22 shape: uncorrelated scalar subquery in WHERE + correlated
    * NOT EXISTS (left anti join). */
  private val notExistsSql =
    """SELECT c_mktsegment, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
      |FROM customer
      |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 250000)
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** TPC-H q17 shape: per-group correlated scalar aggregate subquery. */
  private val scalarCorrSql =
    """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#12'
      |  AND l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem l2
      |                    WHERE l2.l_partkey = p_partkey)""".stripMargin

  /** TPC-H q18 shape: IN over a grouped HAVING subquery (large-order scan). */
  private val inGroupSubqSql =
    """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
      | round(sum(l_quantity), 2) AS total_qty
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
      |                     GROUP BY l_orderkey HAVING sum(l_quantity) > 220)
      |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  /** TPC-H q15 shape: CTE reused twice (revenue view + max-revenue scalar). */
  private val cteMaxRevSql =
    """WITH revenue AS (
      | SELECT l_suppkey AS supplier_no,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      | FROM lineitem
      | WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |   AND l_shipdate < TIMESTAMP '1996-07-01'
      | GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  /** TPC-H q7 shape: the same dimension table joined twice under two aliases
    * (supplier nation × customer nation bi-directional volume). Revenue sums
    * per-line BIGINT cents, not doubles: `round(sum(volume), 2)` diverged at
    * sf1 when the engines' accumulation orders left a group's sum ulps apart
    * across a half-cent boundary — integer summands are order-independent and
    * exact at any scale (the win_rolling_by_value recipe). */
  private val nationVolumeSql =
    """SELECT supp_nation, cust_nation, l_year,
      | CAST(sum(volume_cents) AS DOUBLE) / 100 AS revenue
      |FROM (
      | SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(year(l_shipdate) AS INTEGER) AS l_year,
      |  CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
      |    AS volume_cents
      | FROM supplier
      | JOIN lineitem ON s_suppkey = l_suppkey
      | JOIN orders ON o_orderkey = l_orderkey
      | JOIN customer ON c_custkey = o_custkey
      | JOIN nation n1 ON s_nationkey = n1.n_nationkey
      | JOIN nation n2 ON c_nationkey = n2.n_nationkey
      | WHERE n1.n_name IN ('NATION_1', 'NATION_2')
      |   AND n2.n_name IN ('NATION_1', 'NATION_2')
      |   AND n1.n_name <> n2.n_name) shipping
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** TPC-H q8 shape: 8-table star join + conditional share-of-total. */
  private val marketShareSql =
    """SELECT o_year,
      | round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
      |   / sum(volume), 6) AS mkt_share
      |FROM (
      | SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |  l_extendedprice * (1 - l_discount) AS volume, n1.n_name AS nation
      | FROM part
      | JOIN lineitem ON p_partkey = l_partkey
      | JOIN supplier ON s_suppkey = l_suppkey
      | JOIN orders ON l_orderkey = o_orderkey
      | JOIN customer ON o_custkey = c_custkey
      | JOIN nation n1 ON s_nationkey = n1.n_nationkey
      | JOIN nation n2 ON c_nationkey = n2.n_nationkey
      | JOIN region ON n2.n_regionkey = r_regionkey
      | WHERE r_name = 'ASIA' AND p_size <= 25) all_nations
      |GROUP BY o_year ORDER BY o_year""".stripMargin

  /** CTE + window function in SQL (per-customer top-3 orders). */
  private val windowCteSql =
    """WITH ranked AS (
      | SELECT o_custkey, o_orderkey, o_totalprice,
      |  row_number() OVER (PARTITION BY o_custkey
      |                     ORDER BY o_totalprice DESC, o_orderkey) AS rn
      | FROM orders)
      |SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn
      |FROM ranked WHERE rn <= 3 AND o_custkey <= 300
      |ORDER BY o_custkey, rn""".stripMargin

  /** TPC-H q13 shape: left join + two-level aggregation (order-count
    * distribution, including zero-order customers). */
  private val leftHistSql =
    """SELECT c_count, count(*) AS custdist FROM (
      | SELECT c_custkey, count(o_orderkey) AS c_count
      | FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      | GROUP BY c_custkey) c_orders
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** ROLLUP through the SQL frontend (the DSL path is `agg_rollup`). */
  private val rollupSql =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
      | round(sum(l_quantity), 2) AS qty, count(*) AS n
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY rf, ls""".stripMargin

  /** INTERSECT through the SQL frontend (distinct set semantics both
    * engines; the DSL path is `setop_intersect`). */
  private val setopsSql =
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE o_totalprice > 350000
      |ORDER BY o_custkey""".stripMargin

  /** The query-back over the DDL-created table — shared with the oracle,
    * which reaches it after running the same CREATE/INSERT script. */
  private val ddlSelectSql =
    """SELECT n_regionkey, count(*) AS n, min(n_name) AS first_name
      |FROM graft_ddl_t GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin

  val queries: Map[String, Q] = Map(
    "sql_exists_corr" -> ((s, d) => {
      views(s, d, "orders", "lineitem"); s.sql(existsCorrSql)
    }),
    "sql_not_exists" -> ((s, d) => {
      views(s, d, "customer", "orders"); s.sql(notExistsSql)
    }),
    "sql_scalar_corr" -> ((s, d) => {
      views(s, d, "lineitem", "part"); s.sql(scalarCorrSql)
    }),
    "sql_in_groupsubq" -> ((s, d) => {
      views(s, d, "customer", "orders", "lineitem"); s.sql(inGroupSubqSql)
    }),
    "sql_cte_maxrev" -> ((s, d) => {
      views(s, d, "lineitem", "supplier"); s.sql(cteMaxRevSql)
    }),
    "sql_nation_volume" -> ((s, d) => {
      views(s, d, "supplier", "lineitem", "orders", "customer", "nation")
      s.sql(nationVolumeSql)
    }),
    "sql_market_share" -> ((s, d) => {
      views(s, d, "part", "lineitem", "supplier", "orders", "customer",
        "nation", "region")
      s.sql(marketShareSql)
    }),
    "sql_window_cte" -> ((s, d) => {
      views(s, d, "orders"); s.sql(windowCteSql)
    }),
    "sql_left_hist" -> ((s, d) => {
      views(s, d, "customer", "orders"); s.sql(leftHistSql)
    }),
    "sql_rollup" -> ((s, d) => {
      views(s, d, "lineitem"); s.sql(rollupSql)
    }),
    "sql_setops" -> ((s, d) => {
      views(s, d, "orders"); s.sql(setopsSql)
    }),

    // DDL statements (reference polars-sql context.rs:1472,1500 — CREATE
    // TABLE / SHOW TABLES / DROP TABLE): Spark has the full catalog
    // natively; this key proves CTAS + INSERT + query-back against DuckDB
    // running the same script, and asserts SHOW TABLES / DROP behavior
    // Spark-side (catalog listings aren't comparable across engines).
    "sql_ddl" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      views(s, d, "nation")
      val loc = "/tmp/graft_ddl_t"
      s.sql("DROP TABLE IF EXISTS graft_ddl_t")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(loc))
      s.sql("CREATE TABLE graft_ddl_t USING parquet LOCATION " +
        s"'$loc' AS SELECT n_nationkey, n_name, n_regionkey FROM nation " +
        "WHERE n_regionkey <= 2")
      s.sql("INSERT INTO graft_ddl_t VALUES (999, 'GRAFTLAND', 9)")
      require(s.sql("SHOW TABLES").filter(col("tableName") === "graft_ddl_t")
        .count() == 1, "SHOW TABLES must list the created table")
      s.sql("CREATE TABLE graft_ddl_scratch (x INT) USING parquet " +
        "LOCATION '/tmp/graft_ddl_scratch'")
      s.sql("DROP TABLE graft_ddl_scratch")
      require(s.sql("SHOW TABLES")
        .filter(col("tableName") === "graft_ddl_scratch").count() == 0,
        "DROP TABLE must remove the table from the catalog")
      s.sql(ddlSelectSql)
    })
  )

  val oracle: Map[String, String] = Map(
    "sql_exists_corr" -> existsCorrSql,
    "sql_not_exists" -> notExistsSql,
    "sql_scalar_corr" -> scalarCorrSql,
    "sql_in_groupsubq" -> inGroupSubqSql,
    "sql_cte_maxrev" -> cteMaxRevSql,
    "sql_nation_volume" -> nationVolumeSql,
    "sql_market_share" -> marketShareSql,
    "sql_window_cte" -> windowCteSql,
    "sql_left_hist" -> leftHistSql,
    "sql_rollup" -> rollupSql,
    "sql_setops" -> setopsSql,
    "sql_ddl" ->
      ("""DROP TABLE IF EXISTS graft_ddl_t;
         |CREATE TABLE graft_ddl_t AS
         | SELECT n_nationkey, n_name, n_regionkey FROM nation
         | WHERE n_regionkey <= 2;
         |INSERT INTO graft_ddl_t VALUES (999, 'GRAFTLAND', 9);
         |""".stripMargin + ddlSelectSql)
  )
}
