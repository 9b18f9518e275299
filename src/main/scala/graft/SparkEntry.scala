package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory (SURVEY §2) as runnable queries; each
  * key is hash-checked against its `oracleSql` entry by the driver's DuckDB
  * compare at sf0.01. EVERY key requires an oracle (ContractSpec enforces
  * it): engine-specific results (HLL sketches, seeded RNG) are emitted as
  * oracle-checkable INVARIANT columns — exact counterparts plus literal-TRUE
  * property booleans — rather than raw sketch/sample values.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 shape — scan → filter → groupBy/agg → sort (SURVEY §7.2 M0). */
  def entry(spark: SparkSession): DataFrame =
    queries("agg_tpch_q1")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesAgg.queries ++ QueriesJoin.queries ++ QueriesWindow.queries ++
      QueriesScalar.queries ++ QueriesReshape.queries ++ QueriesText.queries ++
      QueriesExtra.queries ++ QueriesScalar2.queries ++ QueriesExtra2.queries ++
      QueriesWindow2.queries ++ QueriesMisc3.queries ++ QueriesMisc4.queries ++
      QueriesMisc5.queries ++ QueriesCat.queries ++ QueriesDialect.queries ++
      QueriesMisc6.queries ++ QueriesSql.queries ++ QueriesMisc7.queries ++
      QueriesMisc8.queries ++ QueriesMisc9.queries ++ QueriesSql2.queries ++
      QueriesMisc10.queries ++ QueriesMisc11.queries ++ QueriesMisc12.queries ++
      QueriesMisc13.queries ++ QueriesStream.queries ++
      QueriesMisc14.queries ++ QueriesMisc15.queries ++ QueriesMisc16.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Complete by contract — no key may omit its oracle. */
  def oracleSql: Map[String, String] =
    QueriesAgg.oracle ++ QueriesJoin.oracle ++ QueriesWindow.oracle ++
      QueriesScalar.oracle ++ QueriesReshape.oracle ++ QueriesText.oracle ++
      QueriesExtra.oracle ++ QueriesScalar2.oracle ++ QueriesExtra2.oracle ++
      QueriesWindow2.oracle ++ QueriesMisc3.oracle ++ QueriesMisc4.oracle ++
      QueriesMisc5.oracle ++ QueriesCat.oracle ++ QueriesDialect.oracle ++
      QueriesMisc6.oracle ++ QueriesSql.oracle ++ QueriesMisc7.oracle ++
      QueriesMisc8.oracle ++ QueriesMisc9.oracle ++ QueriesSql2.oracle ++
      QueriesMisc10.oracle ++ QueriesMisc11.oracle ++ QueriesMisc12.oracle ++
      QueriesMisc13.oracle ++ QueriesStream.oracle ++
      QueriesMisc14.oracle ++ QueriesMisc15.oracle ++ QueriesMisc16.oracle
}
