package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.testing.{FromRepr, ToRepr}

/** The repr pair law: FromRepr.parse(ToRepr.render(df)) == df for every
  * scalar dtype the pair supports — reprs are pasteable fixtures in both
  * directions. */
class ToReprSpec extends SparkSpec {

  private def roundTrip(schema: StructType, rows: Seq[Row]): Unit = {
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)
    val back = FromRepr.parse(spark, ToRepr.render(df))
    assert(back.schema == df.schema,
      s"schema drift: ${back.schema} vs ${df.schema}")
    graft.testing.Assertions.assertFrameEqual(back, df)
  }

  test("all scalar dtypes round-trip through render → parse") {
    val schema = StructType(Seq(
      StructField("i", LongType), StructField("j", IntegerType),
      StructField("f", FloatType), StructField("d", DoubleType),
      StructField("s", StringType), StructField("b", BooleanType),
      StructField("dt", DateType), StructField("ts", TimestampNTZType)))
    val rows = Seq(
      Row(1L, 2, 1.5f, -2.25, "héllo wörld", true,
        java.sql.Date.valueOf("2020-02-29"),
        java.time.LocalDateTime.parse("2021-06-01T12:34:56")),
      Row(-9007199254740993L, null, null, 1.0e-7, "", false, null,
        java.time.LocalDateTime.parse("1970-01-01T00:00:00")),
      Row(null, -1, 3.25f, Double.MaxValue, "x y  z", null,
        java.sql.Date.valueOf("1999-12-31"), null))
    roundTrip(schema, rows)
  }

  test("empty frame renders and parses (header block only)") {
    val schema = StructType(Seq(StructField("a", LongType),
      StructField("b", StringType)))
    roundTrip(schema, Seq.empty)
  }

  test("render output matches the polars box dialect FromRepr documents") {
    val schema = StructType(Seq(StructField("n", LongType)))
    val s = ToRepr.render(spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(Seq(Row(7L))).asJava), schema))
    assert(s.startsWith("shape: (1, 1)"))
    assert(s.contains("│ n") && s.contains("---") && s.contains("i64"))
    assert(s.linesIterator.exists(_.startsWith("╞")))
  }

  test("maxRows caps the collect (driver-scale contract)") {
    import spark.implicits._
    val df = (1L to 1000L).toDF("x")
    val back = FromRepr.parse(spark, ToRepr.render(df, maxRows = 5))
    assert(back.count() == 5)
  }
}
