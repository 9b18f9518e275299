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

  /** THE registration point: every query batch as (queries, oracle) pairs.
    * `queries`/`oracleSql` and ContractSpec's duplicate-key sweep all derive
    * from this ONE list, so a batch registered here is covered by the
    * contract tests automatically — ContractSpec drifted twice (r12, r13)
    * when it kept its own hand-maintained copy of this list. */
  val batches: Seq[(Map[String, (SparkSession, String) => DataFrame],
                    Map[String, String])] = Seq(
    (QueriesAgg.queries, QueriesAgg.oracle),
    (QueriesJoin.queries, QueriesJoin.oracle),
    (QueriesWindow.queries, QueriesWindow.oracle),
    (QueriesScalar.queries, QueriesScalar.oracle),
    (QueriesReshape.queries, QueriesReshape.oracle),
    (QueriesText.queries, QueriesText.oracle),
    (QueriesExtra.queries, QueriesExtra.oracle),
    (QueriesScalar2.queries, QueriesScalar2.oracle),
    (QueriesExtra2.queries, QueriesExtra2.oracle),
    (QueriesWindow2.queries, QueriesWindow2.oracle),
    (QueriesMisc3.queries, QueriesMisc3.oracle),
    (QueriesMisc4.queries, QueriesMisc4.oracle),
    (QueriesMisc5.queries, QueriesMisc5.oracle),
    (QueriesCat.queries, QueriesCat.oracle),
    (QueriesDialect.queries, QueriesDialect.oracle),
    (QueriesMisc6.queries, QueriesMisc6.oracle),
    (QueriesSql.queries, QueriesSql.oracle),
    (QueriesMisc7.queries, QueriesMisc7.oracle),
    (QueriesMisc8.queries, QueriesMisc8.oracle),
    (QueriesMisc9.queries, QueriesMisc9.oracle),
    (QueriesSql2.queries, QueriesSql2.oracle),
    (QueriesMisc10.queries, QueriesMisc10.oracle),
    (QueriesMisc11.queries, QueriesMisc11.oracle),
    (QueriesMisc12.queries, QueriesMisc12.oracle),
    (QueriesMisc13.queries, QueriesMisc13.oracle),
    (QueriesStream.queries, QueriesStream.oracle),
    (QueriesMisc14.queries, QueriesMisc14.oracle),
    (QueriesMisc15.queries, QueriesMisc15.oracle),
    (QueriesMisc16.queries, QueriesMisc16.oracle),
    // r15: seeded differential fuzz cases — each a randomly generated plan
    // whose Spark side is built through the DSL and whose oracle SQL is
    // emitted from the same plan ADT (cross-engine differential testing)
    (QueriesFuzz.queries, QueriesFuzz.oracle))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    batches.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Complete by contract — no key may omit its oracle. */
  def oracleSql: Map[String, String] =
    batches.iterator.map(_._2).reduce(_ ++ _)
}
