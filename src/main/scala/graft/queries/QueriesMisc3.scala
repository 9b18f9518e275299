package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.queries.util._
import graft.{functions => gf}

/** Round-3 batch 3: rank(method=average), fill_null strategies,
  * gather_every, positional explode, transpose, extend_constant,
  * horizontal fold.
  */
object QueriesMisc3 {

  val queries: Map[String, Q] = Map(
    // polars rank(method="average") — the polars DEFAULT rank method
    // (RankOptions, crates/polars-ops/src/series/ops/rank.rs): ties get the
    // mean of their ordinal ranks = (2·rank + ties − 1) / 2
    "win_rank_avg" -> ((s, d) => {
      val w = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))
      val ties = Window.partitionBy(col("l_returnflag"), col("l_quantity"))
      t(s, d, "lineitem").filter(col("l_orderkey") <= 500).select(
        col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        ((rank().over(w) * 2 + count(lit(1)).over(ties) - 1) / 2.0).as("rank_avg"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // polars fill_null(strategy=mean/min/max) — group statistics as fills
    // (FunctionExpr::FillNull + strategies, function_expr/mod.rs:132-151)
    "win_fill_strategies" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
      val v = when(col("event_type") === "error", lit(null)).otherwise(col("value"))
      t(s, d, "events").filter(col("user_id") <= 10)
        .withColumn("v", v)
        .select(
          col("event_id"), col("user_id"),
          round(coalesce(col("v"), avg(col("v")).over(w)), 4).as("fill_mean"),
          round(coalesce(col("v"), min(col("v")).over(w)), 4).as("fill_min"),
          round(coalesce(col("v"), max(col("v")).over(w)), 4).as("fill_max"),
          round(coalesce(col("v"), lit(0.0)), 4).as("fill_zero"))
        .orderBy(col("event_id"))
    }),

    // polars gather_every(n, offset) — every 3rd row from offset 1 in
    // orderkey order (explicit order key per SURVEY §7.1); the row number
    // is the distributed range-partitioned scan, not a keyless window
    "slice_gather_every" -> ((s, d) =>
      graft.ops.Distributed.withRowNumber(
        t(s, d, "orders").filter(col("o_orderkey") <= 3000),
        "__rn", Seq(col("o_orderkey")))
        .withColumn("__rn", col("__rn") - 1)
        .filter(col("__rn") % 3 === 1)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))),

    // polars list explode with position (Expr::Explode + row position —
    // UDTF-like surface, SURVEY §2.11)
    "explode_pos" -> ((s, d) =>
      t(s, d, "documents").filter(col("doc_id") < 20)
        .select(col("doc_id"),
          // r22: native tokens() — identical rows (trim only changes which
          // EMPTY split regions appear, and the filter drops all empties)
          posexplode(graft.functions.tokens(col("text"))))
        .select(col("doc_id"), (col("pos") + 1).as("word_idx"), col("col").as("word"))
        .orderBy(col("doc_id"), col("word_idx"))),

    // polars DataFrame::transpose (rows↔columns, stringly typed)
    "misc_transpose" -> ((s, d) =>
      lf(s, d, "region")
        .transpose("r_regionkey", Seq(0, 1, 2, 3, 4))
        .sort(col("column")).collect()),

    // polars extend_constant(value, n) — append n constant rows
    "concat_extend_const" -> ((s, d) => {
      val base = t(s, d, "region").select(col("r_regionkey").cast("long").as("key"),
        col("r_name").as("name"))
      val filler = t(s, d, "region").limit(1)
        .select(explode(sequence(lit(0L), lit(2L))).as("i"))
        .select((col("i") + 100L).as("key"), lit("FILLER").as("name"))
      base.unionByName(filler).orderBy(col("key"))
    }),

    // polars fold/reduce over columns (FunctionExpr::Fold — horizontal):
    // Σ weighted columns via an explicit fold
    "misc_fold_horizontal" -> ((s, d) =>
      t(s, d, "lineitem").filter(col("l_orderkey") <= 500).select(
        col("l_orderkey"), col("l_linenumber"),
        round(gf.foldColumns(lit(0.0), (acc, c) => acc + c,
          Seq(col("l_quantity") * 2, col("l_discount") * 10, col("l_tax"))), 6)
          .as("wsum"))
        .orderBy(col("l_orderkey"), col("l_linenumber")))
  )

  val oracle: Map[String, String] = Map(
    "win_rank_avg" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag,
        | (rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) * 2
        |  + count(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1) / 2.0 AS rank_avg
        |FROM lineitem WHERE l_orderkey <= 500
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "win_fill_strategies" ->
      """SELECT event_id, user_id,
        | round(coalesce(v, avg(v) OVER w), 4) AS fill_mean,
        | round(coalesce(v, min(v) OVER w), 4) AS fill_min,
        | round(coalesce(v, max(v) OVER w), 4) AS fill_max,
        | round(coalesce(v, 0.0), 4) AS fill_zero
        |FROM (SELECT event_id, user_id,
        |  CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
        | FROM events WHERE user_id <= 10)
        |WINDOW w AS (PARTITION BY user_id)
        |ORDER BY event_id""".stripMargin,

    "slice_gather_every" ->
      """SELECT o_orderkey, o_totalprice FROM (
        | SELECT o_orderkey, o_totalprice,
        |  row_number() OVER (ORDER BY o_orderkey) - 1 AS rn
        | FROM orders WHERE o_orderkey <= 3000)
        |WHERE rn % 3 = 1 ORDER BY o_orderkey""".stripMargin,

    "explode_pos" ->
      """SELECT doc_id, CAST(z[2] AS INTEGER) AS word_idx,
        | CAST(z[1] AS VARCHAR) AS word
        |FROM (SELECT doc_id,
        |  unnest(list_zip(w, generate_series(1, len(w)))) AS z
        | FROM (SELECT doc_id,
        |   list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS w
        |  FROM documents WHERE doc_id < 20))
        |ORDER BY doc_id, word_idx""".stripMargin,

    "misc_transpose" ->
      """SELECT 'r_name' AS "column",
        | max(CASE WHEN r_regionkey = 0 THEN r_name END) AS c0,
        | max(CASE WHEN r_regionkey = 1 THEN r_name END) AS c1,
        | max(CASE WHEN r_regionkey = 2 THEN r_name END) AS c2,
        | max(CASE WHEN r_regionkey = 3 THEN r_name END) AS c3,
        | max(CASE WHEN r_regionkey = 4 THEN r_name END) AS c4
        |FROM region""".stripMargin,

    "concat_extend_const" ->
      """SELECT CAST(r_regionkey AS BIGINT) AS key, r_name AS name FROM region
        |UNION ALL
        |SELECT 100 + i, 'FILLER' FROM generate_series(0, 2) AS t(i)
        |ORDER BY key""".stripMargin,

    "misc_fold_horizontal" ->
      """SELECT l_orderkey, l_linenumber,
        | round(l_quantity * 2 + l_discount * 10 + l_tax, 6) AS wsum
        |FROM lineitem WHERE l_orderkey <= 500
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
  )
}
