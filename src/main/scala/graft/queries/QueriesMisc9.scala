package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Categorical
import graft.queries.util._
import graft.sources.Float16Parquet
import graft.{functions => gf}

/** Round-7 batch — the remaining §1.2 dtype-fidelity contracts
  * (reference `crates/polars-core/src/datatypes/dtype.rs`): Float16
  * (dtype.rs:102, widen to Float32 on ingest) over REAL parquet FLOAT16
  * files, and Int128 (dtype.rs:101, Decimal(38,0) carrier) over a parquet
  * round-trip at the carrier's boundary values.
  */
object QueriesMisc9 {

  val queries: Map[String, (org.apache.spark.sql.SparkSession, String) =>
      org.apache.spark.sql.DataFrame] = Map(

    // Float16 contract made executable end-to-end: values exactly
    // representable in binary16 (multiples of 0.25 in [-256, 255.75]) are
    // encoded to a REAL FLOAT16 parquet file (distributed sink), scanned
    // back through Spark's native reader via the binary carrier, and
    // widened to FloatType. Oracle recomputes the same floats from `part`
    // directly — agreement proves the file round-trip was lossless and the
    // widening exact. (Inexact values, subnormals, Inf/NaN are covered
    // bit-exhaustively in Float16Spec; the oracle key pins the end-to-end
    // scan path.)
    "dtype_float16" -> ((s, d) => {
      val dir = "/tmp/graft_f16_roundtrip"
      val src = t(s, d, "part").select(col("p_partkey"),
        ((col("p_partkey") % 2048) * 0.25 - 256).cast("float").as("h"))
      Float16Parquet.sink(src, dir, Set("h"))
      Float16Parquet.scan(s, dir).orderBy(col("p_partkey"))
    }),

    // Int128 contract: the documented Decimal(38,0) carrier, proven through
    // a parquet round-trip at boundary values — ±(10^38-1) (the carrier's
    // exact range; full i128 extends to ±1.7e38, the documented gap),
    // either side of the i64 boundary, and arithmetic that must stay exact
    // (decrement-toward-zero, negation, i64-boundary comparison). The
    // oracle runs the identical arithmetic in DuckDB's native int128
    // (HUGEINT) — agreement IS the carrier contract.
    "dtype_int128" -> ((s, _) => {
      val dir = "/tmp/graft_i128_roundtrip"
      val src = s.sql(
        """SELECT v_str, CAST(v_str AS DECIMAL(38,0)) AS v
          |FROM VALUES ('0'), ('-1'), ('9223372036854775807'),
          |  ('9223372036854775808'), ('-9223372036854775809'),
          |  ('99999999999999999999999999999999999999'),
          |  ('-99999999999999999999999999999999999999') AS t(v_str)""".stripMargin)
      src.write.mode("overwrite").parquet(dir)
      s.read.parquet(dir)
        .select(col("v_str"),
          col("v").cast("string").as("back"),
          // the ±1 adjustment is the conditional (not the arithmetic):
          // under ANSI both CASE arms may be evaluated eagerly, and
          // `v - 1` on the negative extreme would overflow the carrier
          (col("v") + when(col("v") >= 0, lit(-1)).otherwise(lit(1)))
            .cast("string").as("toward_zero"),
          // 0 - v, NOT -v: Spark 4.1's Decimal.unary_- itself overflows on
          // ±(10^38-1) (rounds through 34-digit precision); the Subtract
          // path is exact at the carrier boundary
          (lit(0) - col("v")).cast("string").as("neg"),
          (col("v") > lit(Long.MaxValue)).as("gt_i64"))
        .orderBy(length(col("v_str")), col("v_str"))
    }),

    // polars Enum (dtype.rs:139): frozen dictionary fixed at declaration —
    // codes by list position, no data scan, cluster-reproducible by
    // construction. The strict-raise contract (out-of-set value → error,
    // the difference from Categorical) is spec-asserted in OpsSpec; this
    // key pins the code assignment, round-trip decode, and code-order
    // comparisons on a real column whose values all sit in the frozen set.
    "cat_enum_strict" -> ((s, d) => {
      val cats = Seq("A", "N", "R")
      val code = Categorical.enumEncode(col("l_returnflag"), cats)
      t(s, d, "lineitem").filter(col("l_orderkey") <= 2000)
        .select(col("l_orderkey"), col("l_linenumber"),
          code.as("code"),
          Categorical.enumDecode(code, cats).as("rt"),
          (code < 2).as("before_r"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // polars eq_missing / ne_missing (expr.py): equality that treats null
    // as a value (null == null → true) — Spark `<=>`, DuckDB IS NOT
    // DISTINCT FROM. Inputs built nullable on purpose.
    "misc_eq_missing" -> ((s, d) => {
      val x = when(col("l_quantity") > 25, col("l_quantity"))
      val y = when(col("l_extendedprice") > 20000, col("l_quantity"))
      t(s, d, "lineitem").filter(col("l_orderkey") <= 3000)
        .select(col("l_orderkey"), col("l_linenumber"),
          gf.eqMissing(x, y).as("eqm"), gf.neMissing(x, y).as("nem"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // polars list.set_symmetric_difference — the one list set-op the r3
    // battery (list_set_ops) didn't cover.
    "list_set_symdiff" -> ((s, d) => {
      val words = split(lower(col("text")), " ")
      val a = t(s, d, "documents").filter(col("doc_id") % 2 === 0)
        .select((col("doc_id") / 2).cast("long").as("pair_id"), words.as("wa"))
      val b = t(s, d, "documents").filter(col("doc_id") % 2 === 1)
        .select(((col("doc_id") - 1) / 2).cast("long").as("pair_id"), words.as("wb"))
      a.join(b, Seq("pair_id"))
        .select(col("pair_id"),
          size(gf.listSetSymmetricDifference(col("wa"), col("wb"))).as("n_sym"))
        .orderBy(col("pair_id"))
    }),

    // polars dt.total_hours/minutes/seconds/milliseconds on inter-event
    // durations (µs carrier), plus the time-unit pair: cast_time_unit
    // CONVERTS the count (µs→ns multiplies), with_time_unit REINTERPRETS
    // it (identity on the integer — pinned as us_reinterp).
    "dt_time_units" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val durUs = unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts"))
      t(s, d, "events").filter(col("user_id") <= 20)
        .select(col("event_id"),
          gf.totalHours(durUs).as("th"), gf.totalMinutes(durUs).as("tm"),
          gf.totalSeconds(durUs).as("tsec"), gf.totalMillis(durUs).as("tms"),
          gf.castTimeUnitUsToNs(unix_micros(col("ts"))).as("us_to_ns"),
          unix_micros(col("ts")).as("us_reinterp"))
        .orderBy(col("event_id"))
    }),

    // polars scan_parquet(missing_columns="insert") / union-by-name schema
    // evolution (io/parquet/functions.py:78): a directory whose files carry
    // DIFFERENT column sets scans as the union schema, absent columns
    // null-filled. Spark mapping: mergeSchema. Built by splitting orders
    // into an old-schema file (no o_totalprice) and a full-schema file;
    // the oracle recomputes the same union from the source table.
    "io_merge_schema" -> ((s, d) => {
      val dir = "/tmp/graft_merge_schema"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      val o = t(s, d, "orders").filter(col("o_orderkey") <= 4000)
      o.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_custkey"))
        .write.parquet(s"$dir/part_old")
      o.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .write.parquet(s"$dir/part_new")
      s.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true").parquet(dir)
        .orderBy(col("o_orderkey"))
    }),

    // polars scan_csv dialect surface (io/csv: separator, quote_char,
    // null_values, comment_prefix): write part with a ';' separator,
    // quoted fields, a custom null token and injected comment lines, read
    // it back through the option'd scanner — the oracle recomputes from
    // the source table, so a mis-parsed field hash-fails.
    "io_csv_options" -> ((s, d) => {
      val dir = "/tmp/graft_csv_options"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      val src = t(s, d, "part").filter(col("p_partkey") <= 2000)
        .select(col("p_partkey"),
          // embed the separator in a quoted field + a real null
          concat(col("p_name"), lit("; sep")).as("name_semi"),
          when(col("p_partkey") % 7 === 0, lit(null).cast("string"))
            .otherwise(col("p_brand")).as("brand_or_null"),
          col("p_retailprice"))
      src.coalesce(1).write
        .option("sep", ";").option("quote", "\"").option("header", "true")
        .option("nullValue", "__NULL__")
        .csv(dir)
      // inject comment lines a tolerant scanner must skip
      val f = new java.io.File(dir).listFiles()
        .find(_.getName.endsWith(".csv")).get
      val lines = java.nio.file.Files.readAllLines(f.toPath)
      val withComments = new java.util.ArrayList[String]()
      withComments.add("# generated fixture — comment line")
      lines.forEach { l => withComments.add(l): Unit }
      withComments.add("# trailing comment")
      java.nio.file.Files.write(f.toPath, withComments)
      // the in-place edit invalidates Hadoop's .crc sidecar — drop it
      new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".crc")).foreach(_.delete())
      s.read
        .option("sep", ";").option("quote", "\"").option("header", "true")
        .option("nullValue", "__NULL__").option("comment", "#")
        .option("inferSchema", "true")
        .csv(dir)
        // inferSchema narrows the key to int32; widen back so the output
        // type matches the parquet base table (int64) on both engines
        .withColumn("p_partkey", col("p_partkey").cast("long"))
        .orderBy(col("p_partkey"))
    }),

    // Lossless CSV dialect (LazyFrame.sinkCsvExact/scanCsvExact — reference
    // write_csv null_value= escape hatch): null vs empty string, leading/
    // trailing whitespace, embedded quote/separator/newline must all survive
    // the trip. The oracle recomputes the derived columns directly from the
    // base table with NO round-trip, so a lossy writer (whitespace trim,
    // null/empty collapse, unquoted newline) hash-fails. The explicit
    // is_null/is_empty/len probes make the null-vs-empty distinction visible
    // even if a hasher canonicalizes the strings themselves.
    "io_csv_exact" -> ((s, d) => {
      val dir = "/tmp/graft_csv_exact"
      val src = t(s, d, "supplier").select(col("s_suppkey"),
        when(col("s_suppkey") % 5 === 0, lit(null).cast("string"))
          .when(col("s_suppkey") % 5 === 1, lit(""))
          .when(col("s_suppkey") % 5 === 2,
            concat(lit("  "), col("s_name"), lit("\t")))
          .when(col("s_suppkey") % 5 === 3,
            concat(col("s_name"), lit("\",\n"), col("s_name")))
          .otherwise(col("s_name")).as("tricky"),
        when(col("s_suppkey") % 3 === 0, lit(null).cast("double"))
          .otherwise(col("s_acctbal")).as("bal_or_null"))
      graft.dsl.LazyFrame(src).sinkCsvExact(dir)
      graft.dsl.LazyFrame.scanCsvExact(s, dir, src.schema).df
        .select(col("s_suppkey"), col("tricky"),
          col("tricky").isNull.as("is_null"),
          coalesce(col("tricky") === "", lit(false)).as("is_empty"),
          length(col("tricky")).cast("long").as("len"),
          col("bal_or_null"))
        .orderBy(col("s_suppkey"))
    }),

    // polars dt.add_business_days (business.rs): closed-form Mon-Fri walk,
    // negative offsets included, weekend starts rolled forward/backward.
    // The oracle replays the identical arithmetic (isodow + floor division).
    "dt_add_business" -> ((s, d) => {
      val n = (col("o_orderkey") % 11 - 5).cast("int")
      t(s, d, "orders").filter(col("o_orderkey") <= 4000)
        .select(col("o_orderkey"),
          col("o_orderdate").cast("date").as("d0"), n.as("n"),
          gf.addBusinessDays(col("o_orderdate").cast("date"), n, "forward").as("fwd"),
          gf.addBusinessDays(col("o_orderdate").cast("date"), n, "backward").as("bwd"))
        .orderBy(col("o_orderkey"))
    }),

    // polars rolling_sum_by/min_by/etc over an arbitrary NUMERIC by-column
    // (expr.py rolling_*_by; the time-based case is win_rolling_time) — a
    // value-range window frame. Integer cents as the order key: range ties
    // are included wholly on both engines, so the frame is deterministic.
    "win_rolling_by_value" -> ((s, d) => {
      val cents = round(col("o_totalprice") * 100, 0).cast("long")
      val base = t(s, d, "orders").filter(col("o_custkey") <= 500)
        .select(col("o_orderkey"), col("o_custkey"), cents.as("cents"))
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("cents"))
        .rangeBetween(-5000000L, 0L)
      base.select(col("o_orderkey"), col("o_custkey"),
          sum(col("cents")).over(w).as("roll_sum"),
          count(lit(1)).over(w).as("roll_n"),
          min(col("cents")).over(w).as("roll_min"))
        .orderBy(col("o_orderkey"))
    }),

    // polars LazyFrame.with_context / DslPlan::ExtContext
    // (builder_dsl.rs:241; deprecated upstream for concat(how="horizontal")
    // — the equivalence this mapping implements): region as external
    // context to nation. Exercises all three access shapes from the
    // reference docs: row-aligned zip access (ctx_row, null-padded past the
    // shorter frame), a whole-frame scalar aggregate broadcast (ctx_min),
    // and `.first()` broadcast (ctx_first).
    "misc_with_context" -> ((s, d) => {
      import graft.dsl.LazyFrame
      val nation = LazyFrame(t(s, d, "nation")
        .select(col("n_nationkey"), col("n_name")))
      val ctx = LazyFrame(t(s, d, "region")
        .select(col("r_regionkey"), col("r_name")))
      val whole = Window.partitionBy()
      val ordered = Window.orderBy(col("n_nationkey"))
      nation.withContext(col("n_nationkey"), (ctx, col("r_regionkey")))
        .select(col("n_nationkey"), col("n_name"),
          col("r_name").as("ctx_row"),
          min(col("r_name")).over(whole).as("ctx_min"),
          first(col("r_name"), ignoreNulls = false).over(ordered).as("ctx_first"))
        .sort(col("n_nationkey")).df
    })
  )

  val oracle: Map[String, String] = Map(

    "dtype_float16" ->
      """SELECT p_partkey, ((p_partkey % 2048) * 0.25 - 256)::FLOAT AS h
        |FROM part ORDER BY p_partkey""".stripMargin,

    "dtype_int128" ->
      """WITH s AS (
        | SELECT v_str, v_str::HUGEINT AS v
        | FROM (VALUES ('0'), ('-1'), ('9223372036854775807'),
        |   ('9223372036854775808'), ('-9223372036854775809'),
        |   ('99999999999999999999999999999999999999'),
        |   ('-99999999999999999999999999999999999999')) t(v_str))
        |SELECT v_str, v::VARCHAR AS back,
        | (v + (CASE WHEN v >= 0 THEN -1 ELSE 1 END))::VARCHAR AS toward_zero,
        | (-v)::VARCHAR AS neg,
        | v > 9223372036854775807 AS gt_i64
        |FROM s ORDER BY length(v_str), v_str""".stripMargin,

    "cat_enum_strict" ->
      """WITH t AS (
        | SELECT l_orderkey, l_linenumber,
        |  (CASE l_returnflag WHEN 'A' THEN 0 WHEN 'N' THEN 1
        |   WHEN 'R' THEN 2 END)::INT AS code
        | FROM lineitem WHERE l_orderkey <= 2000)
        |SELECT l_orderkey, l_linenumber, code,
        | (CASE code WHEN 0 THEN 'A' WHEN 1 THEN 'N' WHEN 2 THEN 'R' END) AS rt,
        | code < 2 AS before_r
        |FROM t ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "misc_eq_missing" ->
      """WITH t AS (
        | SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_quantity > 25 THEN l_quantity END AS x,
        |  CASE WHEN l_extendedprice > 20000 THEN l_quantity END AS y
        | FROM lineitem WHERE l_orderkey <= 3000)
        |SELECT l_orderkey, l_linenumber,
        | (x IS NOT DISTINCT FROM y) AS eqm,
        | (x IS DISTINCT FROM y) AS nem
        |FROM t ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "list_set_symdiff" ->
      """WITH a AS (SELECT CAST(doc_id/2 AS BIGINT) AS pair_id,
        |  string_split(lower(text), ' ') AS wa FROM documents WHERE doc_id % 2 = 0),
        | b AS (SELECT CAST((doc_id-1)/2 AS BIGINT) AS pair_id,
        |  string_split(lower(text), ' ') AS wb FROM documents WHERE doc_id % 2 = 1)
        |SELECT pair_id,
        | CAST(len(list_distinct(list_concat(
        |   list_filter(wa, x -> NOT list_contains(wb, x)),
        |   list_filter(wb, x -> NOT list_contains(wa, x))))) AS INTEGER) AS n_sym
        |FROM a JOIN b USING (pair_id) ORDER BY pair_id""".stripMargin,

    "dt_time_units" ->
      """WITH t AS (
        | SELECT event_id, epoch_us(ts) AS us,
        |  lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    - epoch_us(ts) AS dur_us
        | FROM events WHERE user_id <= 20)
        |SELECT event_id,
        | dur_us // 3600000000 AS th, dur_us // 60000000 AS tm,
        | dur_us // 1000000 AS tsec, dur_us // 1000 AS tms,
        | us * 1000 AS us_to_ns, us AS us_reinterp
        |FROM t ORDER BY event_id""".stripMargin,

    "io_merge_schema" ->
      """SELECT o_orderkey, o_custkey,
        | CASE WHEN o_orderkey % 2 = 1 THEN o_totalprice END AS o_totalprice
        |FROM orders WHERE o_orderkey <= 4000 ORDER BY o_orderkey""".stripMargin,

    "io_csv_options" ->
      """SELECT p_partkey,
        | p_name || '; sep' AS name_semi,
        | CASE WHEN p_partkey % 7 = 0 THEN NULL ELSE p_brand END AS brand_or_null,
        | p_retailprice
        |FROM part WHERE p_partkey <= 2000 ORDER BY p_partkey""".stripMargin,

    "io_csv_exact" ->
      """WITH t AS (
        | SELECT s_suppkey,
        |  CASE WHEN s_suppkey % 5 = 0 THEN NULL
        |       WHEN s_suppkey % 5 = 1 THEN ''
        |       WHEN s_suppkey % 5 = 2 THEN '  ' || s_name || chr(9)
        |       WHEN s_suppkey % 5 = 3 THEN s_name || '",' || chr(10) || s_name
        |       ELSE s_name END AS tricky,
        |  CASE WHEN s_suppkey % 3 = 0 THEN NULL ELSE s_acctbal END AS bal_or_null
        | FROM supplier)
        |SELECT s_suppkey, tricky,
        | tricky IS NULL AS is_null,
        | coalesce(tricky = '', false) AS is_empty,
        | length(tricky) AS len,
        | bal_or_null
        |FROM t ORDER BY s_suppkey""".stripMargin,

    "dt_add_business" ->
      """WITH t AS (
        | SELECT o_orderkey, o_orderdate::DATE AS d0,
        |  (o_orderkey % 11 - 5)::INT AS n
        | FROM orders WHERE o_orderkey <= 4000),
        |r AS (
        | SELECT o_orderkey, d0, n,
        |  CASE WHEN isodow(d0) = 6 THEN d0 + 2
        |       WHEN isodow(d0) = 7 THEN d0 + 1 ELSE d0 END AS rf,
        |  CASE WHEN isodow(d0) = 6 THEN d0 - 1
        |       WHEN isodow(d0) = 7 THEN d0 - 2 ELSE d0 END AS rb
        | FROM t)
        |SELECT o_orderkey, d0, n,
        | rf + (CAST(floor(n / 5.0) AS INT) * 7 + (n - CAST(floor(n / 5.0) AS INT) * 5)
        |   + CASE WHEN (isodow(rf) - 1) + (n - CAST(floor(n / 5.0) AS INT) * 5) > 4
        |          THEN 2 ELSE 0 END) AS fwd,
        | rb + (CAST(floor(n / 5.0) AS INT) * 7 + (n - CAST(floor(n / 5.0) AS INT) * 5)
        |   + CASE WHEN (isodow(rb) - 1) + (n - CAST(floor(n / 5.0) AS INT) * 5) > 4
        |          THEN 2 ELSE 0 END) AS bwd
        |FROM r ORDER BY o_orderkey""".stripMargin,

    "win_rolling_by_value" ->
      """WITH t AS (
        | SELECT o_orderkey, o_custkey,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        | FROM orders WHERE o_custkey <= 500)
        |SELECT o_orderkey, o_custkey,
        | (sum(cents) OVER w)::BIGINT AS roll_sum,
        | count(*) OVER w AS roll_n,
        | min(cents) OVER w AS roll_min
        |FROM t WINDOW w AS (PARTITION BY o_custkey ORDER BY cents
        |  RANGE BETWEEN 5000000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,

    "misc_with_context" ->
      """WITH n AS (SELECT n_nationkey, n_name,
        |  row_number() OVER (ORDER BY n_nationkey) AS rn FROM nation),
        |r AS (SELECT r_name,
        |  row_number() OVER (ORDER BY r_regionkey) AS rn FROM region)
        |SELECT n.n_nationkey, n.n_name, r.r_name AS ctx_row,
        | (SELECT min(r_name) FROM region) AS ctx_min,
        | (SELECT r_name FROM region ORDER BY r_regionkey LIMIT 1) AS ctx_first
        |FROM n LEFT JOIN r USING (rn)
        |ORDER BY n_nationkey""".stripMargin
  )
}
