package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.util._
import graft.{functions => gf}

/** Round-6 gap batch from the FunctionExpr audit (reference
  * `crates/polars-plan/src/dsl/function_expr/mod.rs`): ewm_sum, arg_sort /
  * arg_unique, shift_and_fill, drop_nans vs drop_nulls.
  */
object QueriesMisc7 {

  val queries: Map[String, Q] = Map(

    // polars ewm_sum (FunctionExpr::EwmSum): decayed running sum, the
    // ewm_mean numerator — same bounded-window fold, exact here because
    // lineitem orders are far shorter than the span bound
    "win_ewm_sum" -> ((s, d) => {
      val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"))
      t(s, d, "lineitem").filter(col("l_orderkey") <= 2000).select(
        col("l_orderkey"), col("l_linenumber"),
        round(gf.ewmSumRows(col("l_quantity"), w, span = 16, alpha = 0.5), 6)
          .as("ewm_sum"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // polars arg_sort + arg_unique (FunctionExpr::ArgSort/ArgUnique): index
    // permutations within each group's series (series order = l_linenumber,
    // 0-based positions). arg_sort = positions ordered by (value, position)
    // — the stable sort contract; arg_unique = first-occurrence positions in
    // appearance order. Arrays serialize '|'-joined for the hash gate.
    "misc_arg_sort" -> ((s, d) => {
      val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"))
      val pos = t(s, d, "lineitem").filter(col("l_orderkey") <= 2000)
        .select(col("l_orderkey"), col("l_quantity"),
          (row_number().over(w) - 1).as("pos"))
      val ags = pos.groupBy(col("l_orderkey"))
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("l_quantity"), col("pos")))),
          x => x.getField("pos")), "|").as("arg_sort"))
      val agu = pos.groupBy(col("l_orderkey"), col("l_quantity"))
        .agg(min(col("pos")).as("fp"))
        .groupBy(col("l_orderkey"))
        .agg(array_join(sort_array(collect_list(col("fp"))), "|").as("arg_unique"))
      ags.join(agu, Seq("l_orderkey")).orderBy(col("l_orderkey"))
    }),

    // polars shift_and_fill (FunctionExpr::ShiftAndFill): out-of-partition
    // slots get the fill value; pre-existing nulls shift through unfilled
    "win_shift_fill" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, d, "events").filter(col("user_id") <= 20).select(
        col("event_id"), col("user_id"),
        round(gf.shiftFill(col("value"), 1, -1.0, w), 4).as("prev_filled"),
        round(gf.shiftFill(col("value"), -2, 0.0, w), 4).as("next2_filled"))
        .orderBy(col("event_id"))
    }),

    // polars drop_nans vs drop_nulls (FunctionExpr::DropNans/DropNulls):
    // NaN and null are distinct — drop_nans keeps nulls, drop_nulls keeps
    // NaNs. One frame carrying both proves the split.
    "misc_drop_nans" -> ((s, d) => {
      val base = t(s, d, "events").filter(col("user_id") <= 50).select(
        col("event_id"),
        when(col("event_type") === "error", lit(null)).otherwise(col("value"))
          .as("v_null"),
        when(col("value") < 1.0, lit(Double.NaN)).otherwise(col("value"))
          .as("v_nan"))
      graft.dsl.LazyFrame(base)
        .dropNans(Seq("v_nan"))
        .dropNulls(Seq("v_null"))
        .select(col("event_id"), round(col("v_null"), 4).as("v_null"),
          round(col("v_nan"), 4).as("v_nan"))
        .sort(col("event_id")).df
    })
  )

  val oracle: Map[String, String] = Map(
    // alpha=0.5 → weight ratio 2: Σ_j x_j·0.5^(i-j) = 0.5^i · Σ_j x_j·2^j
    "win_ewm_sum" ->
      """WITH t AS (
        | SELECT l_orderkey, l_linenumber, l_quantity,
        |  row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS rn
        | FROM lineitem WHERE l_orderkey <= 2000)
        |SELECT l_orderkey, l_linenumber,
        | round(sum(l_quantity * power(2.0, rn)) OVER w * power(0.5, rn), 6) AS ewm_sum
        |FROM t
        |WINDOW w AS (PARTITION BY l_orderkey ORDER BY rn
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY 1, 2""".stripMargin,

    "misc_arg_sort" ->
      """WITH t AS (
        | SELECT l_orderkey, l_quantity,
        |  row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) - 1 AS pos
        | FROM lineitem WHERE l_orderkey <= 2000),
        |s AS (SELECT l_orderkey,
        |  array_to_string(list(pos ORDER BY l_quantity, pos), '|') AS arg_sort
        | FROM t GROUP BY 1),
        |u AS (SELECT l_orderkey,
        |  array_to_string(list(fp ORDER BY fp), '|') AS arg_unique
        | FROM (SELECT l_orderkey, min(pos) AS fp FROM t
        |       GROUP BY l_orderkey, l_quantity)
        | GROUP BY 1)
        |SELECT l_orderkey, arg_sort, arg_unique FROM s JOIN u USING (l_orderkey)
        |ORDER BY l_orderkey""".stripMargin,

    "win_shift_fill" ->
      """SELECT event_id, user_id,
        | round(lag(value, 1, -1.0) OVER w, 4) AS prev_filled,
        | round(lead(value, 2, 0.0) OVER w, 4) AS next2_filled
        |FROM events WHERE user_id <= 20
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,

    "misc_drop_nans" ->
      """SELECT event_id,
        | round(CASE WHEN event_type = 'error' THEN NULL ELSE value END, 4) AS v_null,
        | round(CASE WHEN value < 1.0 THEN 'NaN'::DOUBLE ELSE value END, 4) AS v_nan
        |FROM events
        |WHERE user_id <= 50
        |  AND NOT isnan(CASE WHEN value < 1.0 THEN 'NaN'::DOUBLE ELSE value END)
        |  AND (CASE WHEN event_type = 'error' THEN NULL ELSE value END) IS NOT NULL
        |ORDER BY event_id""".stripMargin
  )
}
