package graft

import org.apache.spark.sql.functions._
import graft.testing.Assertions._

/** The polars.testing surface: equality, row-order sensitivity, dtype
  * checks, float tolerance, and the not-equal inverse. */
class AssertionsSpec extends SparkSpec {
  import spark.implicits._

  test("equal frames pass; each difference class raises with a pointed message") {
    val a = Seq((1L, "x", 1.0), (2L, "y", 2.5)).toDF("id", "s", "v")
    assertFrameEqual(a, a)

    // row order matters by default, not with checkRowOrder=false
    val shuffled = a.orderBy(col("id").desc)
    intercept[FrameNotEqualError](assertFrameEqual(a, shuffled))
    assertFrameEqual(a, shuffled, checkRowOrder = false)

    // dtypes: long vs int caught unless relaxed
    val widened = a.withColumn("id", col("id").cast("int"))
    intercept[FrameNotEqualError](assertFrameEqual(a, widened))

    // float tolerance
    val nudged = a.withColumn("v", col("v") + 1e-9)
    assertFrameEqual(a, nudged)
    val moved = a.withColumn("v", col("v") + 0.5)
    val e = intercept[FrameNotEqualError](assertFrameEqual(a, moved))
    assert(e.getMessage.contains("col v"))

    // value / count / name differences
    intercept[FrameNotEqualError](assertFrameEqual(a, a.filter(col("id") === 1)))
    intercept[FrameNotEqualError](assertFrameEqual(a, a.withColumnRenamed("s", "t")))

    // NaN == NaN (the polars testing convention)
    val n1 = Seq(Double.NaN).toDF("v")
    assertFrameEqual(n1, n1)

    assertFrameNotEqual(a, moved)
    intercept[FrameNotEqualError](assertFrameNotEqual(a, a))
  }

  test("series variants: one column, name sensitivity, inverse") {
    val s1 = Seq(1.0, 2.5).toDF("v")
    val s2 = Seq(1.0, 2.5 + 1e-9).toDF("v")
    assertSeriesEqual(s1, s2)

    // renamed: caught by default, admitted with checkNames=false
    val renamed = s1.withColumnRenamed("v", "w")
    intercept[FrameNotEqualError](assertSeriesEqual(s1, renamed))
    assertSeriesEqual(s1, renamed, checkNames = false)

    // a multi-column frame is not a series
    val wide = Seq((1.0, 2.0)).toDF("a", "b")
    intercept[FrameNotEqualError](assertSeriesEqual(wide, wide))

    assertSeriesNotEqual(s1, Seq(1.0, 9.9).toDF("v"))
    intercept[FrameNotEqualError](assertSeriesNotEqual(s1, s2))
  }
}
