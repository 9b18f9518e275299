package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.util._
import graft.{functions => gf}

/** Round-6 batch 2 — the remaining Expr/DataFrame method-level audit gaps
  * (reference `py-polars/src/polars/expr/expr.py`, `dataframe/frame.py`):
  * rolling_quantile / rolling_skew / rolling_kurtosis, cumulative_eval +
  * cum_count, nan_min / nan_max, bottom_k / top_k_by, Expr.dot, ewm_sum_by,
  * bitwise_count_ones/zeros + leading/trailing zeros, is_sorted, str.strptime,
  * str.json_path_match, arg_true + agg_groups, unstack — plus two
  * training-data ops beyond the reference: byte-budget shard packing over
  * the distributed prefix sum, and deterministic stratified hash sampling.
  */
object QueriesMisc8 {

  // Central-moment skew/kurt from windowed power sums: the SAME double-
  // arithmetic formula runs on both engines (the fused online algorithms
  // differ in the last ulp between implementations, which flips round()).
  private def momentCols(v: org.apache.spark.sql.Column,
                         w: org.apache.spark.sql.expressions.WindowSpec) = {
    val n = count(v).over(w).cast("double")
    val s1 = sum(v).over(w)
    val s2 = sum(v * v).over(w)
    val s3 = sum(v * v * v).over(w)
    val s4 = sum(v * v * v * v).over(w)
    val m = s1 / n
    val m2 = s2 / n - m * m
    val m3 = s3 / n - lit(3.0) * m * s2 / n + lit(2.0) * m * m * m
    val m4 = s4 / n - lit(4.0) * m * s3 / n +
      lit(6.0) * m * m * s2 / n - lit(3.0) * m * m * m * m
    (n, m2, m3, m4)
  }

  // Shared by dtype_decimal_exact / dtype_decimal_repr: integer-cents
  // construction, then grouped sums/products in exact decimal arithmetic.
  private def decimalAggBase(s: org.apache.spark.sql.SparkSession,
                             d: String): org.apache.spark.sql.DataFrame = {
    val cent = lit(new java.math.BigDecimal("0.01"))
    def dec2(c: Column): Column =
      (round(c * 100, 0).cast("long").cast("decimal(14,0)") * cent).cast("decimal(12,2)")
    t(s, d, "lineitem")
      .select(col("l_returnflag"),
        dec2(col("l_extendedprice")).as("p"),
        dec2(col("l_quantity")).as("q"))
      .groupBy(col("l_returnflag")).agg(
        sum(col("p")).cast("decimal(38,2)").as("sum_p"),
        sum(col("p") * col("q")).cast("decimal(38,4)").as("sum_pq"),
        min(col("p")).cast("decimal(38,2)").as("min_p"),
        // (the raw square-sum sum_pp — the original 18-sig-digit s4nz
        // carrier — is retired: its hash-red role is documented in the
        // probe comments below and no key selects it anymore)
        // milli-scaled square-sum: ~12 significant digits at the driver SF,
        // generic nonzero 10⁻⁴ digit — the float64-canonicalization-safe
        // scale-4 control (see dtype_decimal_s4nz)
        sum(col("p") * lit(new java.math.BigDecimal("0.001"))
          * col("p") * lit(new java.math.BigDecimal("0.001")))
          .cast("decimal(38,4)").as("sum_mm"))
  }

  val queries: Map[String, Q] = Map(

    // polars rolling_quantile / rolling_skew / rolling_kurtosis
    // (Expr::rolling_*, reference function_expr/rolling.rs): interpolated
    // quantiles + population (bias=true) skew / Fisher kurtosis over a
    // 4-row trailing window. Spark `percentile` and DuckDB `quantile_cont`
    // share the pos = p·(n−1) linear-interpolation definition.
    "win_rolling_quantile" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-3, Window.currentRow)
      val (n, m2, m3, m4) = momentCols(col("value"), w)
      t(s, d, "events").filter(col("user_id") <= 20).select(
        col("event_id"), col("user_id"),
        round(expr("percentile(value, 0.25)").over(w), 4).as("roll_p25"),
        round(expr("percentile(value, 0.75)").over(w), 4).as("roll_p75"),
        round(when(n >= 3 && m2 > 1e-12, m3 / pow(m2, 1.5)), 4).as("roll_skew"),
        round(when(n >= 4 && m2 > 1e-12, m4 / (m2 * m2) - 3.0), 4).as("roll_kurt"))
        .orderBy(col("event_id"))
    }),

    // polars cumulative_eval (Expr::cumulative_eval: run an expression over
    // the expanding prefix — here a running median, the canonical non-
    // decomposable example) + cum_count (non-null prefix count; nulls
    // injected so it diverges from the row counter).
    "win_cumeval" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "events").filter(col("user_id") <= 10)
        .withColumn("v", when(col("event_type") === "error", lit(null))
          .otherwise(col("value")))
        .select(col("event_id"), col("user_id"),
          round(expr("percentile(v, 0.5)").over(w), 4).as("run_median"),
          count(col("v")).over(w).as("cum_count"))
        .orderBy(col("event_id"))
    }),

    // polars nan_min / nan_max (NaN-propagating) vs the NaN-skipping
    // min/max — both pairs over one group so the split is visible.
    "agg_nan_minmax" -> ((s, d) =>
      t(s, d, "events")
        .withColumn("v", when(col("value") < 1.0, lit(Double.NaN))
          .otherwise(col("value")))
        .groupBy(col("event_type")).agg(
          round(gf.nanMin(col("v")), 4).as("nan_min"),
          round(gf.nanMax(col("v")), 4).as("nan_max"),
          round(gf.nanSafeMin(col("v")), 4).as("safe_min"),
          round(gf.nanSafeMax(col("v")), 4).as("safe_max"))
        .orderBy(col("event_type"))),

    // polars bottom_k + top_k_by (Expr/DataFrame ::bottom_k, ::top_k_by):
    // both plan as TakeOrderedAndProject — a per-partition heap + driver
    // merge of k rows, never a global sort. Tie-broken on the key for a
    // deterministic oracle.
    "misc_bottom_k" -> ((s, d) => {
      val c = lf(s, d, "customer")
      val bottom = c.bottomK(10, col("c_acctbal"), col("c_custkey"))
        .select(lit("bottom").as("tag"), col("c_custkey"), col("c_acctbal"))
      val topBy = c.topK(10, length(col("c_name")) * col("c_acctbal"), col("c_custkey"))
        .select(lit("top_by").as("tag"), col("c_custkey"), col("c_acctbal"))
      bottom.vstack(topBy).sort(col("tag"), col("c_custkey")).df
    }),

    // polars Expr.dot: Σ a_i·b_i as a grouped aggregate.
    "agg_dot" -> ((s, d) =>
      t(s, d, "lineitem").groupBy(col("l_returnflag")).agg(
        round(sum(col("l_quantity") * col("l_extendedprice")), 2).as("dot"),
        round(sum(col("l_discount") * col("l_tax")), 6).as("dot_rates"))
        .orderBy(col("l_returnflag"))),

    // polars ewm_sum_by(half_life): time-decayed running sum along the ts
    // axis (half-life 1 min, 1 h horizon ⇒ truncated weights < 1e-18 —
    // below the round(4) gate by 14 orders).
    "win_ewm_sum_by" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("tm"))
      t(s, d, "events").filter(col("user_id") <= 20)
        .select(col("event_id"), col("user_id"), col("value"),
          unix_micros(col("ts")).as("tm"))
        .select(col("event_id"), col("user_id"),
          round(gf.ewmSumBy(col("value"), col("tm"), w,
            halfLifeMicros = 60000000L, horizonMicros = 3600000000L), 4)
            .as("ewm_sum_t"))
        .orderBy(col("event_id"))
    }),

    // polars bitwise_count_ones/count_zeros/leading_zeros/trailing_zeros
    // (function_expr/bitwise.rs): two's-complement bit inspection — exact
    // integer forms (bin-length for leading, x & −x isolation for trailing),
    // no float log. Negative and zero inputs included.
    "math_bit_counts" -> ((s, d) =>
      t(s, d, "part").filter(col("p_partkey") <= 2000)
        .select(col("p_partkey"),
          col("p_partkey").cast("long").as("x"),
          (col("p_partkey").cast("long") - 1000L).as("y"))
        .select(col("p_partkey"),
          gf.bitCountOnes(col("x")).as("ones_x"),
          gf.bitCountZeros(col("x")).as("zeros_x"),
          gf.bitLeadingZeros(col("x")).as("lead_x"),
          gf.bitTrailingZeros(col("x")).as("trail_x"),
          gf.bitCountOnes(col("y")).as("ones_y"),
          gf.bitLeadingZeros(col("y")).as("lead_y"),
          gf.bitTrailingZeros(col("y")).as("trail_y"))
        .orderBy(col("p_partkey"))),

    // polars is_sorted (Expr::is_sorted): per-group monotonicity flags via
    // one lag pass — no sort issued, just the adjacent-pair reduction.
    "misc_is_sorted" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, d, "events").filter(col("user_id") <= 50)
        .select(col("user_id"),
          coalesce(col("value") >= lag(col("value"), 1).over(w), lit(true)).as("asc_ok"),
          coalesce(col("value") <= lag(col("value"), 1).over(w), lit(true)).as("desc_ok"))
        .groupBy(col("user_id")).agg(
          expr("bool_and(asc_ok)").as("sorted_asc"),
          expr("bool_and(desc_ok)").as("sorted_desc"))
        .orderBy(col("user_id"))
    }),

    // polars str.json_path_match (JSONPath subset): direct field, nested
    // path into a constructed document, array index.
    "str_json_path" -> ((s, d) =>
      t(s, d, "events").filter(col("user_id") <= 50)
        .withColumn("j", concat(lit("{\"a\":{\"b\":["),
          get_json_object(col("props"), "$.k"), lit(",2,3]},\"t\":\""),
          col("event_type"), lit("\"}")))
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").as("k"),
          get_json_object(col("j"), "$.a.b[0]").as("b0"),
          get_json_object(col("j"), "$.t").as("t"))
        .orderBy(col("event_id"))),

    // polars str.strptime / str.to_date / str.to_datetime: format-string
    // parsing round-trips (render with one format, parse back with it).
    "str_strptime" -> ((s, d) =>
      t(s, d, "orders").filter(col("o_orderkey") <= 5000)
        .withColumn("s_date", date_format(col("o_orderdate"), "dd/MMM/yyyy"))
        .withColumn("s_ts", concat(date_format(col("o_orderdate"), "yyyy-MM-dd"),
          lit(" "), lpad(col("o_orderkey") % 24, 2, "0"), lit(":30:05")))
        .select(col("o_orderkey"),
          to_date(col("s_date"), "dd/MMM/yyyy").as("parsed_date"),
          to_timestamp(col("s_ts"), "yyyy-MM-dd HH:mm:ss").as("parsed_ts"))
        .orderBy(col("o_orderkey"))),

    // polars arg_true + agg_groups: 0-based positions (series order =
    // l_linenumber) where the predicate holds, and each group's full
    // position list. Arrays '|'-serialize for the hash gate.
    "misc_index_ops" -> ((s, d) => {
      val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"))
      t(s, d, "lineitem").filter(col("l_orderkey") <= 1000)
        .select(col("l_orderkey"), col("l_quantity"),
          (row_number().over(w) - 1).as("pos"))
        .groupBy(col("l_orderkey")).agg(
          array_join(sort_array(collect_list(
            when(col("l_quantity") > 40, col("pos")))), "|").as("arg_true"),
          array_join(sort_array(collect_list(col("pos"))), "|").as("agg_groups"))
        .orderBy(col("l_orderkey"))
    }),

    // polars Expr.reshape((n, 5)): flat column → fixed-width arrays along
    // the order ('|'-serialized for the hash gate; short final chunk kept).
    "misc_reshape_rows" -> ((s, d) =>
      lf(s, d, "customer").select(col("c_custkey"))
        .reshapeRows("c_custkey", 7, Seq(col("c_custkey")))
        .select(array_join(col("c_custkey"), "|").as("chunk"))
        .df),

    // polars unstack(step, how="vertical"): positional long→wide reshape,
    // no aggregation — nation's 25 rows to a 5×5 grid of names.
    "misc_unstack" -> ((s, d) =>
      lf(s, d, "nation").select(col("n_name"))
        .unstack(step = 5, order = Seq(col("n_name")))
        .df),

    // polars `.arr` namespace over the fixed-size Array dtype (reference
    // `crates/polars-plan/src/dsl/function_expr/array.rs`): width enforced
    // by fixedSizeArray (the Array-vs-List contract), then element fold /
    // get / any / all / arg_max — embeddings are the 64-wide fixture.
    "arr_ops" -> ((s, d) => {
      val e = gf.fixedSizeArray(col("embedding"), 64)
      val ed = transform(e, x => x.cast("double"))
      t(s, d, "embeddings").select(
        col("vec_id"),
        round(aggregate(ed, lit(0.0), (a, x) => a + x), 6).as("arr_sum"),
        round(aggregate(ed, lit(0.0), (a, x) => a + x) / 64.0, 6).as("arr_mean"),
        round(element_at(ed, 5), 6).as("arr_get4"),
        exists(ed, x => x > 0.2).as("arr_any_big"),
        forall(ed, x => abs(x) < lit(1.0)).as("arr_all_unit"),
        (array_position(ed, array_max(ed)) - 1).as("arr_argmax"))
        .orderBy(col("vec_id"))
    }),

    // polars rolling_rank (Expr::rolling_rank): rank of the CURRENT value
    // among its trailing window — min and average tie methods, computed as
    // one fold over the windowed list (no self-join).
    "win_rolling_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-3, Window.currentRow)
      val vals = collect_list(col("value")).over(w)
      val less = aggregate(vals, lit(0L), (a, x) =>
        a + when(x < col("value"), 1L).otherwise(0L))
      val eq = aggregate(vals, lit(0L), (a, x) =>
        a + when(x === col("value"), 1L).otherwise(0L))
      t(s, d, "events").filter(col("user_id") <= 20)
        .select(col("event_id"), col("user_id"),
          (less + 1L).as("rank_min"),
          round(less.cast("double") + (eq.cast("double") + 1.0) / 2.0, 4)
            .as("rank_avg"))
        .orderBy(col("event_id"))
    }),

    // polars is_finite / is_infinite + arctan2 (FunctionExpr::Atan2,
    // BooleanFunction::IsFinite/IsInfinite): inf/NaN injected so all three
    // states appear (finite / infinite / NaN is NEITHER finite nor infinite).
    "math_float_flags" -> ((s, d) => {
      val v = when(col("event_type") === "error", lit(Double.PositiveInfinity))
        .when(col("value") < 1.0, lit(Double.NaN))
        .otherwise(col("value"))
      t(s, d, "events").filter(col("user_id") <= 50).select(
        col("event_id"),
        (!isnan(v) && abs(v) =!= lit(Double.PositiveInfinity)).as("is_finite"),
        (abs(v) === lit(Double.PositiveInfinity)).as("is_infinite"),
        round(atan2(col("value"), lit(10.0)), 6).as("at2"))
        .orderBy(col("event_id"))
    }),

    // polars dt.is_leap_year / dt.days_in_month — the Gregorian rule spelled
    // out (no engine builtin assumed on either side).
    "dt_calendar_flags" -> ((s, d) =>
      t(s, d, "orders").filter(col("o_orderkey") <= 5000)
        .withColumn("y", year(col("o_orderdate")))
        .select(col("o_orderkey"),
          ((col("y") % 4 === 0 && col("y") % 100 =!= 0) ||
            col("y") % 400 === 0).as("is_leap"),
          dayofmonth(last_day(col("o_orderdate"))).as("days_in_month"))
        .orderBy(col("o_orderkey"))),

    // Decimal dtype fidelity (§1.2; polars Decimal128): grouped sums and
    // products in exact decimal arithmetic. The fixture stores doubles, and
    // a direct double→decimal cast rounds differently across engines (Spark
    // HALF_UP on the decimal string, DuckDB on the binary double — the
    // round-6 red row), so the decimals are constructed via integer cents:
    // round(x*100) to an integer agrees across engines (same recipe as
    // TextAnalysis.qualityScore), and cents × 0.01 in decimal arithmetic is
    // exact. The aggregation STILL runs in decimal (the contract this key
    // names), but the emitted columns are BIGINT invariants derived FROM the
    // decimal aggregates ((sum×100)::BIGINT etc.) — identical arithmetic
    // content with zero decimal representation surface, because the driver
    // hashed the decimal-typed output red for two rounds while values and
    // arrow types were locally identical (r7 verdict forensics: suspect
    // driver-side decimal canonicalization). The decimal-typed surface
    // lives on in dtype_decimal_repr below, localizing any disagreement.
    "dtype_decimal_exact" -> ((s, d) => {
      val a = decimalAggBase(s, d)
      a.select(col("l_returnflag"),
          (col("sum_p") * 100).cast("long").as("sum_p_c"),
          (col("sum_pq") * 10000).cast("long").as("sum_pq_c"),
          (col("min_p") * 100).cast("long").as("min_p_c"))
        .orderBy(col("l_returnflag"))
    }),

    // The decimal-typed half of the split (see dtype_decimal_exact above):
    // the same decimal aggregates emitted AS decimals. History: hash-red at
    // width 38 (r8) and again at width 18 (r9) while rows+schema stayed
    // green and the w18/w22/w38 probes (sum_p alone) were ALL green — width
    // exonerated. Round-10 value forensics localized the divergence to the
    // scale-4 product-sum: l_quantity is integral at every SF, so every
    // p*q is a multiple of 0.01 and sum_pq at scale 4 ALWAYS renders with
    // two trailing zeros ("…x.yz00") — a value class the green columns
    // never hit (their last scale digits are nonzero at the driver SF). A
    // driver-side canonicalizer that strips trailing zeros on one side
    // (e.g. a decimal→float fetch) reds exactly that column every round,
    // regardless of declared width. Re-pin: emit the product-sum at its
    // VALUE-natural scale 2 (exact — no rounding occurs, the values are
    // multiples of 0.01), so every emitted decimal digitstring is
    // trailing-zero-free at sf0.01. The scale-4 surface itself stays under
    // test in dtype_decimal_s4/s4nz below, which split "scale 4 per se"
    // from "trailing zeros at scale 4".
    "dtype_decimal_repr" -> ((s, d) =>
      decimalAggBase(s, d).select(col("l_returnflag"),
          col("sum_p").cast("decimal(18,2)").as("sum_p"),
          col("sum_pq").cast("decimal(18,2)").as("sum_pq"),
          col("min_p").cast("decimal(18,2)").as("min_p"))
        .orderBy(col("l_returnflag"))),

    // Decimal-width probes (minimal repros, one aggregate each): identical
    // arithmetic, only the declared output precision differs. A driver
    // hash-fail on exactly one of these names the width its canonicalizer
    // rewrites; all-green retires the r7/r8 decimal mystery entirely.
    "dtype_decimal_w18" -> ((s, d) =>
      decimalAggBase(s, d).select(col("l_returnflag"),
          col("sum_p").cast("decimal(18,2)").as("sum_p"))
        .orderBy(col("l_returnflag"))),
    "dtype_decimal_w22" -> ((s, d) =>
      decimalAggBase(s, d).select(col("l_returnflag"),
          col("sum_p").cast("decimal(22,2)").as("sum_p"))
        .orderBy(col("l_returnflag"))),
    "dtype_decimal_w38" -> ((s, d) =>
      decimalAggBase(s, d).select(col("l_returnflag"),
          col("sum_p").cast("decimal(38,2)").as("sum_p"))
        .orderBy(col("l_returnflag"))),

    // Scale/agg probes (r9 verdict prescription), completing the decimal
    // matrix the width probes started. The round-10 driver record CLOSED
    // the forensics: dtype_decimal_s4 AND the original s4nz control (sum_pp
    // at 18 significant digits) both hash-red with rows+schema green and
    // locally IDENTICAL values + arrow types on both sides (verified:
    // byte-equal decimal128 digitstrings) — while every scale-2 key
    // (w18/w22/w38, min, repr) is green. The one theory consistent with
    // all eight keys: the driver canonicalizes ONE side's decimals through
    // float64, so a decimal-typed column hashes green iff each value's
    // digitstring equals the float64 shortest-repr of the value. Two value
    // classes violate that and each red key isolates one:
    //  - trailing zeros at the declared scale (dtype_decimal_s4: integral
    //    l_quantity ⇒ p·q is a multiple of 0.01 ⇒ scale-4 strings end
    //    "00" but float64 repr drops them, "…x.yz00" vs "…x.yz");
    //  - more significant digits than float64 carries (the original s4nz:
    //    sum_pp ≈ 7.4e13 at scale 4 = 18 sig digits > ~16, repr rounds).
    // dtype_decimal_s4 (round 11 re-pin): the trailing-zero digitstring
    // is now emitted as a STRING on both sides (cast(decimal(18,4) as
    // string) vs ::DECIMAL(18,4)::VARCHAR) — strings bypass the driver's
    // float64 canonicalizer, so the exact "…x.yz00" rendering is compared
    // byte-for-byte and the key is green while pinning STRICTLY MORE than
    // the decimal-typed variant could (the r10 record, where the same
    // values hashed red as a decimal column, remains the committed
    // evidence of the driver-side fault; check.py still warns on
    // decimal-typed columns that violate float64-shortest-repr).
    // dtype_decimal_s4nz is re-pinned as the float64-SAFE scale-4 control:
    // the milli-scaled square-sum (~12 sig digits, generic nonzero 10⁻⁴
    // digit) — green proves scale 4 per se hashes fine, completing the
    // case that only the two float64-unrepresentable value classes
    // diverge. dtype_decimal_min isolates the min aggregate at the repr
    // width/scale. tools/check.py warns on BOTH hazard classes.
    // Cross-engine cast note (found pinning s4nz): DuckDB's decimal
    // downscale cast TRUNCATES (.75437→.7543) while Spark's rounds
    // HALF_UP — any oracle that narrows a decimal scale must round
    // explicitly first (round(x, s) agrees: both engines round decimals
    // half away from zero).
    "dtype_decimal_s4" -> ((s, d) =>
      decimalAggBase(s, d).select(col("l_returnflag"),
          col("sum_pq").cast("decimal(18,4)").cast("string").as("sum_pq_str"))
        .orderBy(col("l_returnflag"))),
    "dtype_decimal_s4nz" -> ((s, d) =>
      decimalAggBase(s, d).select(col("l_returnflag"),
          col("sum_mm").cast("decimal(28,4)").as("sum_mm"))
        .orderBy(col("l_returnflag"))),
    "dtype_decimal_min" -> ((s, d) =>
      decimalAggBase(s, d).select(col("l_returnflag"),
          col("min_p").cast("decimal(18,2)").as("min_p"))
        .orderBy(col("l_returnflag"))),

    // polars str.escape_regex + str.head/tail: metacharacters injected so
    // the escape provably neutralizes them (regexp_count of the escaped
    // pattern against the raw string must be exactly 1).
    "str_escape_head_tail" -> ((s, d) => {
      val raw = concat(lit("a.b*("), col("p_brand"), lit(")?[x]"))
      val esc = gf.escapeRegex(raw)
      t(s, d, "part").filter(col("p_partkey") <= 2000).select(
        col("p_partkey"),
        esc.as("escaped"),
        regexp_count(raw, esc).as("self_hits"),
        substring(col("p_type"), 1, 6).as("head6"),
        substring(col("p_type"), -4, 4).as("tail4"))
        .orderBy(col("p_partkey"))
    }),

    // polars list.median/var/std/n_unique/drop_nulls (ListFunction): the
    // stats as explicit folds (same double path both engines — engine-native
    // list_aggregate('stddev') may differ in the last ulp); median = mean of
    // the two middle elements of the sorted 64-wide vector. The oracle adds
    // `+ 0.0` to each rounded double: DuckDB's round keeps IEEE -0.0 while
    // Spark's BigDecimal round never emits it (one sf1 row hit this), and
    // a raw-value hasher treats the two zeros as different bits.
    "list_stats" -> ((s, d) => {
      val ed = transform(col("embedding"), x => x.cast("double"))
      val s1 = aggregate(ed, lit(0.0), (a, x) => a + x)
      val s2 = aggregate(ed, lit(0.0), (a, x) => a + x * x)
      val v = (s2 - s1 * s1 / 64.0) / 63.0
      val srt = array_sort(ed)
      t(s, d, "embeddings").select(
        col("vec_id"),
        round(v, 6).as("l_var"),
        round(sqrt(v), 6).as("l_std"),
        round((element_at(srt, 32) + element_at(srt, 33)) / 2.0, 6).as("l_median"),
        size(array_distinct(ed)).as("l_nuniq"),
        size(filter(concat(array(lit(null).cast("double")), slice(ed, 1, 3)),
          x => x.isNotNull)).as("l_dropn"))
        .orderBy(col("vec_id"))
    }),

    // polars dt.iso_year / dt.century / dt.millennium / dt.is_business_day /
    // dt.replace(day=1): ISO week-year vs calendar year; century boundary
    // rule from the reference (1900 ends the 19th, 1901 begins the 20th —
    // series/mod.rs:166-169); weekday mask Mon-Fri; component replace via
    // make_date.
    "dt_iso_parts" -> ((s, d) =>
      t(s, d, "orders").filter(col("o_orderkey") <= 5000).select(
        col("o_orderkey"),
        expr("extract(YEAROFWEEK FROM o_orderdate)").cast("int").as("iso_year"),
        expr("(year(o_orderdate) - 1) div 100 + 1").cast("int").as("century"),
        expr("(year(o_orderdate) - 1) div 1000 + 1").cast("int").as("millennium"),
        (!dayofweek(col("o_orderdate")).isin(1, 7)).as("is_bizday"),
        make_date(year(col("o_orderdate")), month(col("o_orderdate")), lit(1))
          .as("month_floor"))
        .orderBy(col("o_orderkey"))),

    // Training-data op (beyond reference): pack documents into contiguous
    // byte-budget shards — shard k = docs whose preceding running total sits
    // in [k·B, (k+1)·B). Runs on the range-partitioned prefix sum
    // (Distributed.withPrefixSum — no single-task window), and the shard id
    // is INTEGRAL division so the assignment stays exact past double's 2^53
    // mantissa at corpus scale.
    "text_pack_shards" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("n_chars"))
      val summed = graft.ops.Distributed.withPrefixSum(
        docs, col("n_chars"), Seq(col("doc_id")), "run_chars")
      summed
        .withColumn("shard", expr("(run_chars - n_chars) div 100000"))
        .groupBy(col("shard")).agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("chars"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy(col("shard"))
    }),

    // Training-data op (beyond reference): sentence-level corpus dedup —
    // split every document, drop sentences that appear in MORE THAN ONE
    // document (cross-doc boilerplate, the Lee et al. 2022 sentence pass),
    // rebuild each document in original order. Every stage is md5-keyed
    // (16-byte shuffle keys, never sentence text) and hash-parallel: one
    // groupBy for global dup detection, one anti-join on digests, one
    // per-doc re-implode bounded by document length.
    "text_dedup_sentences" -> ((s, d) => {
      val sent = t(s, d, "documents")
        .select(col("doc_id"), posexplode(split(col("text"), "\\. ")))
        .toDF("doc_id", "pos", "sentence")
      val dups = sent.groupBy(md5(col("sentence")).as("h"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") > 1).select(col("h"))
      val kept = sent.join(dups, md5(col("sentence")) === dups("h"), "left_anti")
      kept.groupBy(col("doc_id")).agg(
        count(lit(1)).as("n_kept"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("sentence")))),
          x => x.getField("sentence")), ". ")).as("rebuilt_md5"))
        .orderBy(col("doc_id"))
    }),

    // Training-data op (beyond reference): stratified DETERMINISTIC sampling
    // — per language, keep the ⌈10%⌉ of docs with the smallest
    // md5(doc_id), the standard hash-sampling recipe (reproducible across
    // runs/engines, no RNG state). The rank form is exact per stratum; the
    // windowless scale variant (filter md5 < threshold) trades exactness
    // for zero shuffles.
    "misc_sample_stratified" -> ((s, d) => {
      val w = Window.partitionBy(col("lang"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      t(s, d, "documents")
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("lang"))))
        .filter(col("rn") <= ceil(col("n") * 0.1))
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // The SCALE form of the same op (ops/Sampling.sampleStratified): one
    // count agg + broadcast cutoffs + filter — no per-stratum window, so a
    // dominant stratum can't pin the job on one task. PlanSpec asserts the
    // plan is window-free; expected per-stratum size matches the rank form.
    "misc_sample_stratified_scale" -> ((s, d) =>
      graft.ops.Sampling.sampleStratified(
        t(s, d, "documents"), Seq("lang"), "doc_id", 0.1)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id")))
  )

  val oracle: Map[String, String] = Map(
    "win_rolling_quantile" ->
      """WITH t AS (
        | SELECT event_id, user_id, value,
        |  count(value) OVER w::DOUBLE AS n,
        |  sum(value) OVER w AS s1, sum(value*value) OVER w AS s2,
        |  sum(value*value*value) OVER w AS s3,
        |  sum(value*value*value*value) OVER w AS s4,
        |  quantile_cont(value, 0.25) OVER w AS p25,
        |  quantile_cont(value, 0.75) OVER w AS p75
        | FROM events WHERE user_id <= 20
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)),
        |m AS (
        | SELECT event_id, user_id, n, p25, p75, s1/n AS mu,
        |  s2/n - (s1/n)*(s1/n) AS m2,
        |  s3/n - 3.0*(s1/n)*s2/n + 2.0*(s1/n)*(s1/n)*(s1/n) AS m3,
        |  s4/n - 4.0*(s1/n)*s3/n + 6.0*(s1/n)*(s1/n)*s2/n
        |    - 3.0*(s1/n)*(s1/n)*(s1/n)*(s1/n) AS m4
        | FROM t)
        |SELECT event_id, user_id, round(p25, 4) AS roll_p25,
        | round(p75, 4) AS roll_p75,
        | round(CASE WHEN n >= 3 AND m2 > 1e-12 THEN m3 / power(m2, 1.5) END, 4)
        |   AS roll_skew,
        | round(CASE WHEN n >= 4 AND m2 > 1e-12 THEN m4 / (m2*m2) - 3.0 END, 4)
        |   AS roll_kurt
        |FROM m ORDER BY event_id""".stripMargin,

    "win_cumeval" ->
      """WITH t AS (
        | SELECT event_id, user_id,
        |  CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v,
        |  ts FROM events WHERE user_id <= 10)
        |SELECT event_id, user_id,
        | round(quantile_cont(v, 0.5) OVER w, 4) AS run_median,
        | count(v) OVER w AS cum_count
        |FROM t
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "agg_nan_minmax" ->
      """WITH t AS (
        | SELECT event_type,
        |  CASE WHEN value < 1.0 THEN 'NaN'::DOUBLE ELSE value END AS v
        | FROM events)
        |SELECT event_type,
        | round(CASE WHEN bool_or(isnan(v)) THEN 'NaN'::DOUBLE ELSE min(v) END, 4)
        |   AS nan_min,
        | round(CASE WHEN bool_or(isnan(v)) THEN 'NaN'::DOUBLE ELSE max(v) END, 4)
        |   AS nan_max,
        | round(min(CASE WHEN isnan(v) THEN NULL ELSE v END), 4) AS safe_min,
        | round(max(CASE WHEN isnan(v) THEN NULL ELSE v END), 4) AS safe_max
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,

    "misc_bottom_k" ->
      """SELECT * FROM (
        | SELECT 'bottom' AS tag, c_custkey, c_acctbal FROM customer
        |  ORDER BY c_acctbal, c_custkey LIMIT 10)
        |UNION ALL
        |SELECT * FROM (
        | SELECT 'top_by' AS tag, c_custkey, c_acctbal FROM customer
        |  ORDER BY length(c_name) * c_acctbal DESC, c_custkey DESC LIMIT 10)
        |ORDER BY tag, c_custkey""".stripMargin,

    "agg_dot" ->
      """SELECT l_returnflag,
        | round(sum(l_quantity * l_extendedprice), 2) AS dot,
        | round(sum(l_discount * l_tax), 6) AS dot_rates
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "win_ewm_sum_by" ->
      """WITH base AS (
        | SELECT event_id, user_id, value, epoch_us(ts) AS tm
        | FROM events WHERE user_id <= 20),
        |h AS (
        | SELECT event_id, user_id, value, tm,
        |  array_agg(struct_pack(t := tm, v := value)) OVER
        |    (PARTITION BY user_id ORDER BY tm
        |     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS hist
        | FROM base)
        |SELECT event_id, user_id,
        | round(list_sum(list_transform(hist,
        |   e -> e.v * power(0.5, (tm - e.t) / 60000000.0))), 4) AS ewm_sum_t
        |FROM h ORDER BY event_id""".stripMargin,

    "math_bit_counts" ->
      """WITH t AS (
        | SELECT p_partkey, p_partkey::BIGINT AS x, p_partkey::BIGINT - 1000 AS y
        | FROM part WHERE p_partkey <= 2000)
        |SELECT p_partkey,
        | bit_count(x)::INT AS ones_x,
        | (64 - bit_count(x))::INT AS zeros_x,
        | (CASE WHEN x = 0 THEN 64 ELSE 64 - length(bin(x)) END)::INT AS lead_x,
        | (CASE WHEN x = 0 THEN 64 ELSE bit_count((x & -x) - 1) END)::INT AS trail_x,
        | bit_count(y)::INT AS ones_y,
        | (CASE WHEN y = 0 THEN 64 ELSE 64 - length(bin(y)) END)::INT AS lead_y,
        | (CASE WHEN y = 0 THEN 64 ELSE bit_count((y & -y) - 1) END)::INT AS trail_y
        |FROM t ORDER BY p_partkey""".stripMargin,

    "misc_is_sorted" ->
      """WITH t AS (
        | SELECT user_id,
        |  coalesce(value >= lag(value, 1) OVER w, true) AS asc_ok,
        |  coalesce(value <= lag(value, 1) OVER w, true) AS desc_ok
        | FROM events WHERE user_id <= 50
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, bool_and(asc_ok) AS sorted_asc,
        | bool_and(desc_ok) AS sorted_desc
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,

    "str_json_path" ->
      """WITH t AS (
        | SELECT event_id, props, event_type,
        |  '{"a":{"b":[' || json_extract_string(props, '$.k') || ',2,3]},"t":"'
        |    || event_type || '"}' AS j
        | FROM events WHERE user_id <= 50)
        |SELECT event_id,
        | json_extract_string(props, '$.k') AS k,
        | json_extract_string(j, '$.a.b[0]') AS b0,
        | json_extract_string(j, '$.t') AS t
        |FROM t ORDER BY event_id""".stripMargin,

    "str_strptime" ->
      """WITH t AS (
        | SELECT o_orderkey,
        |  strftime(o_orderdate, '%d/%b/%Y') AS s_date,
        |  strftime(o_orderdate, '%Y-%m-%d') || ' ' ||
        |    lpad((o_orderkey % 24)::VARCHAR, 2, '0') || ':30:05' AS s_ts
        | FROM orders WHERE o_orderkey <= 5000)
        |SELECT o_orderkey,
        | strptime(s_date, '%d/%b/%Y')::DATE AS parsed_date,
        | strptime(s_ts, '%Y-%m-%d %H:%M:%S') AS parsed_ts
        |FROM t ORDER BY o_orderkey""".stripMargin,

    "misc_index_ops" ->
      """WITH t AS (
        | SELECT l_orderkey, l_quantity,
        |  row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) - 1 AS pos
        | FROM lineitem WHERE l_orderkey <= 1000)
        |SELECT l_orderkey,
        | coalesce(array_to_string(
        |   list(pos ORDER BY pos) FILTER (WHERE l_quantity > 40), '|'), '')
        |   AS arg_true,
        | array_to_string(list(pos ORDER BY pos), '|') AS agg_groups
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,

    "arr_ops" ->
      """WITH t AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
        |SELECT vec_id,
        | round(list_sum(e), 6) AS arr_sum,
        | round(list_sum(e) / 64.0, 6) AS arr_mean,
        | round(e[5], 6) AS arr_get4,
        | len(list_filter(e, x -> x > 0.2)) > 0 AS arr_any_big,
        | len(list_filter(e, x -> abs(x) >= 1.0)) = 0 AS arr_all_unit,
        | (list_position(e, list_max(e)) - 1)::BIGINT AS arr_argmax
        |FROM t ORDER BY vec_id""".stripMargin,

    "win_rolling_rank" ->
      """WITH t AS (
        | SELECT event_id, user_id, value,
        |  array_agg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS vals
        | FROM events WHERE user_id <= 20)
        |SELECT event_id, user_id,
        | (list_sum(list_transform(vals,
        |    x -> CASE WHEN x < value THEN 1 ELSE 0 END)) + 1)::BIGINT AS rank_min,
        | round(list_sum(list_transform(vals,
        |    x -> CASE WHEN x < value THEN 1 ELSE 0 END))::DOUBLE +
        |  (list_sum(list_transform(vals,
        |    x -> CASE WHEN x = value THEN 1 ELSE 0 END))::DOUBLE + 1.0) / 2.0, 4)
        |   AS rank_avg
        |FROM t ORDER BY event_id""".stripMargin,

    "math_float_flags" ->
      """WITH t AS (
        | SELECT event_id, value,
        |  CASE WHEN event_type = 'error' THEN 'Infinity'::DOUBLE
        |       WHEN value < 1.0 THEN 'NaN'::DOUBLE ELSE value END AS v
        | FROM events WHERE user_id <= 50)
        |SELECT event_id,
        | (NOT isnan(v) AND abs(v) <> 'Infinity'::DOUBLE) AS is_finite,
        | (abs(v) = 'Infinity'::DOUBLE) AS is_infinite,
        | round(atan2(value, 10.0), 6) AS at2
        |FROM t ORDER BY event_id""".stripMargin,

    "dt_calendar_flags" ->
      """SELECT o_orderkey,
        | ((year(o_orderdate) % 4 = 0 AND year(o_orderdate) % 100 <> 0)
        |   OR year(o_orderdate) % 400 = 0) AS is_leap,
        | day(last_day(o_orderdate))::INT AS days_in_month
        |FROM orders WHERE o_orderkey <= 5000 ORDER BY o_orderkey""".stripMargin,

    "dtype_decimal_exact" ->
      """WITH t AS (
        | SELECT l_returnflag,
        |  (CAST(round(l_extendedprice * 100) AS BIGINT)::DECIMAL(14,0)
        |    * 0.01)::DECIMAL(12,2) AS p,
        |  (CAST(round(l_quantity * 100) AS BIGINT)::DECIMAL(14,0)
        |    * 0.01)::DECIMAL(12,2) AS q
        | FROM lineitem),
        |a AS (
        | SELECT l_returnflag,
        |  sum(p)::DECIMAL(38,2) AS sum_p,
        |  sum(p * q)::DECIMAL(38,4) AS sum_pq,
        |  min(p)::DECIMAL(38,2) AS min_p
        | FROM t GROUP BY 1)
        |SELECT l_returnflag,
        | (sum_p * 100)::BIGINT AS sum_p_c,
        | (sum_pq * 10000)::BIGINT AS sum_pq_c,
        | (min_p * 100)::BIGINT AS min_p_c
        |FROM a ORDER BY 1""".stripMargin,

    "dtype_decimal_repr" ->
      """WITH t AS (
        | SELECT l_returnflag,
        |  (CAST(round(l_extendedprice * 100) AS BIGINT)::DECIMAL(14,0)
        |    * 0.01)::DECIMAL(12,2) AS p,
        |  (CAST(round(l_quantity * 100) AS BIGINT)::DECIMAL(14,0)
        |    * 0.01)::DECIMAL(12,2) AS q
        | FROM lineitem)
        |SELECT l_returnflag,
        | sum(p)::DECIMAL(18,2) AS sum_p,
        | sum(p * q)::DECIMAL(18,2) AS sum_pq,
        | min(p)::DECIMAL(18,2) AS min_p
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,

    "dtype_decimal_w18" ->
      """WITH t AS (
        | SELECT l_returnflag,
        |  (CAST(round(l_extendedprice * 100) AS BIGINT)::DECIMAL(14,0)
        |    * 0.01)::DECIMAL(12,2) AS p
        | FROM lineitem)
        |SELECT l_returnflag, sum(p)::DECIMAL(18,2) AS sum_p
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,

    "dtype_decimal_w22" ->
      """WITH t AS (
        | SELECT l_returnflag,
        |  (CAST(round(l_extendedprice * 100) AS BIGINT)::DECIMAL(14,0)
        |    * 0.01)::DECIMAL(12,2) AS p
        | FROM lineitem)
        |SELECT l_returnflag, sum(p)::DECIMAL(22,2) AS sum_p
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,

    "dtype_decimal_w38" ->
      """WITH t AS (
        | SELECT l_returnflag,
        |  (CAST(round(l_extendedprice * 100) AS BIGINT)::DECIMAL(14,0)
        |    * 0.01)::DECIMAL(12,2) AS p
        | FROM lineitem)
        |SELECT l_returnflag, sum(p)::DECIMAL(38,2) AS sum_p
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,

    "dtype_decimal_s4" ->
      """WITH t AS (
        | SELECT l_returnflag,
        |  (CAST(round(l_extendedprice * 100) AS BIGINT)::DECIMAL(14,0)
        |    * 0.01)::DECIMAL(12,2) AS p,
        |  (CAST(round(l_quantity * 100) AS BIGINT)::DECIMAL(14,0)
        |    * 0.01)::DECIMAL(12,2) AS q
        | FROM lineitem)
        |SELECT l_returnflag, sum(p * q)::DECIMAL(18,4)::VARCHAR AS sum_pq_str
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,

    "dtype_decimal_s4nz" ->
      """WITH t AS (
        | SELECT l_returnflag,
        |  (CAST(round(l_extendedprice * 100) AS BIGINT)::DECIMAL(14,0)
        |    * 0.01)::DECIMAL(12,2) AS p
        | FROM lineitem)
        |SELECT l_returnflag,
        |  round(sum((p * 0.001::DECIMAL(4,3)) * (p * 0.001::DECIMAL(4,3))),
        |    4)::DECIMAL(28,4) AS sum_mm
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,

    "dtype_decimal_min" ->
      """WITH t AS (
        | SELECT l_returnflag,
        |  (CAST(round(l_extendedprice * 100) AS BIGINT)::DECIMAL(14,0)
        |    * 0.01)::DECIMAL(12,2) AS p
        | FROM lineitem)
        |SELECT l_returnflag, min(p)::DECIMAL(18,2) AS min_p
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,

    "str_escape_head_tail" ->
      """WITH t AS (
        | SELECT p_partkey, p_type,
        |  'a.b*(' || p_brand || ')?[x]' AS raw
        | FROM part WHERE p_partkey <= 2000)
        |SELECT p_partkey,
        | regexp_replace(raw, '([.^$*+?()\[\]{}|\\])', '\\\1', 'g') AS escaped,
        | len(regexp_extract_all(raw,
        |   regexp_replace(raw, '([.^$*+?()\[\]{}|\\])', '\\\1', 'g')))::INT
        |   AS self_hits,
        | p_type[1:6] AS head6,
        | p_type[-4:] AS tail4
        |FROM t ORDER BY p_partkey""".stripMargin,

    "list_stats" ->
      """WITH t AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |m AS (
        | SELECT vec_id, e, list_sort(e) AS srt,
        |  (list_sum(list_transform(e, x -> x*x))
        |    - list_sum(e) * list_sum(e) / 64.0) / 63.0 AS v
        | FROM t)
        |SELECT vec_id,
        | round(v, 6) + 0.0 AS l_var,
        | round(sqrt(v), 6) + 0.0 AS l_std,
        | round((srt[32] + srt[33]) / 2.0, 6) + 0.0 AS l_median,
        | len(list_distinct(e))::INT AS l_nuniq,
        | len(list_filter([NULL, e[1], e[2], e[3]],
        |   x -> x IS NOT NULL))::INT AS l_dropn
        |FROM m ORDER BY vec_id""".stripMargin,

    "dt_iso_parts" ->
      """SELECT o_orderkey,
        | isoyear(o_orderdate)::INT AS iso_year,
        | ((year(o_orderdate) - 1) // 100 + 1)::INT AS century,
        | ((year(o_orderdate) - 1) // 1000 + 1)::INT AS millennium,
        | dayofweek(o_orderdate) NOT IN (0, 6) AS is_bizday,
        | make_date(year(o_orderdate), month(o_orderdate), 1) AS month_floor
        |FROM orders WHERE o_orderkey <= 5000 ORDER BY o_orderkey""".stripMargin,

    "text_pack_shards" ->
      """WITH t AS (
        | SELECT doc_id, n_chars,
        |  sum(n_chars) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_chars
        | FROM documents)
        |SELECT ((run_chars - n_chars) // 100000)::BIGINT AS shard,
        | count(*) AS n_docs, sum(n_chars)::BIGINT AS chars,
        | min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,

    "text_dedup_sentences" ->
      """WITH sent AS (
        | SELECT doc_id, unnest(string_split(text, '. ')) AS sentence,
        |        generate_subscripts(string_split(text, '. '), 1) AS pos
        | FROM documents),
        |dups AS (
        | SELECT md5(sentence) AS h FROM sent
        | GROUP BY 1 HAVING count(DISTINCT doc_id) > 1),
        |kept AS (
        | SELECT * FROM sent WHERE md5(sentence) NOT IN (SELECT h FROM dups))
        |SELECT doc_id, count(*) AS n_kept,
        | md5(string_agg(sentence, '. ' ORDER BY pos)) AS rebuilt_md5
        |FROM kept GROUP BY 1 ORDER BY 1""".stripMargin,

    "misc_sample_stratified" ->
      """WITH t AS (
        | SELECT doc_id, lang,
        |  row_number() OVER (PARTITION BY lang
        |    ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn,
        |  count(*) OVER (PARTITION BY lang) AS n
        | FROM documents)
        |SELECT doc_id, lang FROM t WHERE rn <= ceil(n * 0.1)
        |ORDER BY doc_id""".stripMargin,

    "misc_sample_stratified_scale" ->
      """WITH c AS (
        | SELECT lang, ceil(count(*) * 0.1) / count(*) AS cut
        | FROM documents GROUP BY lang)
        |SELECT d.doc_id, d.lang
        |FROM documents d JOIN c USING (lang)
        |WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 15))::BIGINT
        |      / 1152921504606846976.0 < c.cut
        |ORDER BY d.doc_id""".stripMargin,

    "misc_reshape_rows" ->
      """WITH t AS (
        | SELECT c_custkey,
        |  (row_number() OVER (ORDER BY c_custkey) - 1) // 7 AS ck
        | FROM customer)
        |SELECT array_to_string(list(c_custkey ORDER BY c_custkey), '|') AS chunk
        |FROM t GROUP BY ck ORDER BY min(c_custkey)""".stripMargin,

    "misc_unstack" ->
      """WITH t AS (
        | SELECT n_name, row_number() OVER (ORDER BY n_name) - 1 AS idx
        | FROM nation)
        |SELECT
        | max(CASE WHEN idx // 5 = 0 THEN n_name END) AS n_name_0,
        | max(CASE WHEN idx // 5 = 1 THEN n_name END) AS n_name_1,
        | max(CASE WHEN idx // 5 = 2 THEN n_name END) AS n_name_2,
        | max(CASE WHEN idx // 5 = 3 THEN n_name END) AS n_name_3,
        | max(CASE WHEN idx // 5 = 4 THEN n_name END) AS n_name_4
        |FROM t GROUP BY idx % 5 ORDER BY min(idx)""".stripMargin
  )
}
