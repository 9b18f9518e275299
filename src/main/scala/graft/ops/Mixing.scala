package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Static mixture sampling: cut a corpus to per-group token budgets —
  * the "domain weights" step of pretraining-data assembly (The Pile mixes
  * sources at fixed proportions; DoReMi learns the weights, then applies
  * them exactly like this). Given a budget per group, keep each group's
  * docs in the deterministic md5-rank order until the group's running
  * token total reaches its budget; groups without a budget are dropped.
  *
  * Execution shape: the ranking key is the md5 of the id (the repo's
  * seeded-uniform convention — replayable in SQL, stable across runs and
  * engines), and the running totals come from
  * [[Distributed.withPrefixSumBy]], the grouped range-partitioned prefix
  * sum — NOT a `Window.partitionBy(group)`, which would put each whole
  * group in one task and hang the 70%-English group of a real corpus on
  * one core. Budgets ride as a literal map; the cut is a codegen'd
  * filter. One range exchange total.
  */
object Mixing {

  /** Keep each group's md5-rank prefix whose running `tokenCol` total
    * stays ≤ its budget (the doc that crosses the budget is dropped).
    * Adds `cum_tok` = the running total that justified keeping the row. */
  def sampleToBudgets(docs: DataFrame, idCol: String, groupCol: String,
                      tokenCol: String, budgets: Map[String, Long])
      : DataFrame = {
    require(budgets.nonEmpty, "mixing: empty budget map")
    val rank = md5(col(idCol).cast("string"))
    val cum = Distributed.withPrefixSumBy(docs,
      col(tokenCol).cast("long"), Seq(groupCol),
      Seq(rank, col(idCol)), "cum_tok")
    val budget: Column = element_at(
      map(budgets.toSeq.sortBy(_._1).flatMap { case (g, b) =>
        Seq(lit(g), lit(b)) }: _*),
      col(groupCol))
    // budgetless groups drop ENTIRELY (isNotNull, not a 0 budget): a
    // coalesce-to-0 would still admit zero-token rows whose running
    // total is 0
    cum.filter(budget.isNotNull && col("cum_tok") <= budget)
  }
}
