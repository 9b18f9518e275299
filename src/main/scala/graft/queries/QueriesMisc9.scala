package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.Categorical
import graft.queries.util._
import graft.sources.Float16Parquet

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
        |FROM t ORDER BY l_orderkey, l_linenumber""".stripMargin
  )
}
