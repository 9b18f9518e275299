package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import graft.functions.ReinterpretExpr

/** Bit-reinterpret must be the identity on raw bits: round-trips preserve
  * NaN payloads, -0.0, infinities; binary decodes honor the declared
  * endianness; the SQL registration (via GraftExtensions) plans the same
  * expression. */
class ReinterpretExprSpec extends SparkSpec {

  private def reinterpret(c: Column, mode: String): Column =
    Bridge.column(ReinterpretExpr(Bridge.eagerExpression(c), mode))

  test("i64_bits -> f64_bits round-trips special doubles bit-exactly") {
    val specials = Seq(0.0, -0.0, 1.5, -1.5, Double.NaN,
      java.lang.Double.longBitsToDouble(0x7ff8000000000123L), // NaN payload
      Double.PositiveInfinity, Double.NegativeInfinity,
      Double.MinPositiveValue, Double.MaxValue)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(specials.map(org.apache.spark.sql.Row(_))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("d",
          org.apache.spark.sql.types.DoubleType))))
    val out = df.select(col("d"),
      reinterpret(reinterpret(col("d"), "i64_bits"), "f64_bits").as("rt"))
      .collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
        s"bits changed for ${r.getDouble(0)}")
    }
  }

  test("long -> f64_bits matches the JVM intrinsic; SQL form plans it") {
    val r = spark.sql(
      "SELECT graft_reinterpret(4611686018427387904L, 'f64_bits') AS d").head()
    assert(r.getDouble(0) == 2.0) // 0x4000000000000000 is exactly 2.0
    // (note: the SQL literal -0.0 is normalized to 0.0 by Spark's parser, so
    // the sign-bit case lives in the DataFrame round-trip test above)
    val bits = spark.sql(
      "SELECT graft_reinterpret(cast(2.0 as double), 'i64_bits') AS b").head()
    assert(bits.getLong(0) == 0x4000000000000000L)
  }

  test("binary decode honors endianness; rejects non-8-byte input") {
    // 0x0000000000000001 big-endian = 1; little-endian = 2^56
    val r = spark.sql(
      """SELECT
        | graft_reinterpret(unhex('0000000000000001'), 'i64_be') AS be,
        | graft_reinterpret(unhex('0000000000000001'), 'i64_le') AS le""".stripMargin)
      .head()
    assert(r.getLong(0) == 1L && r.getLong(1) == (1L << 56))
    assertThrows[Exception] {
      spark.sql("SELECT graft_reinterpret(unhex('0001'), 'i64_le')").collect()
    }
  }
}
