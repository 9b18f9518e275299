package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.queries.util
import graft.sources.Avro

/** Avro DSv2 connector: roundtrip fidelity (incl. nested/nullable types),
  * sync-aligned byte-range split planning, and column pruning. */
class AvroSpec extends SparkSpec {

  private val dir = "/tmp/graft_test/avro_spec"

  test("roundtrip preserves every value and the schema (orders table)") {
    val orig = util.t(spark, "/root/testdata/sf0.001", "orders")
    Avro.write(orig, dir)
    val back = spark.read.format("graft-avro").load(dir)
    assert(back.schema == orig.schema)
    assert(back.count() == orig.count())
    assert(back.exceptAll(orig).count() == 0)
    assert(orig.exceptAll(back).count() == 0)
  }

  test("nested arrays, structs, maps, binary, date, and nulls survive") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("tags", ArrayType(StringType, containsNull = true)),
      StructField("meta", StructType(Seq(
        StructField("k", StringType), StructField("v", DoubleType)))),
      StructField("counts", MapType(StringType, IntegerType, valueContainsNull = true)),
      StructField("payload", BinaryType),
      StructField("day", DateType),
      StructField("maybe", DoubleType)))
    val rows = Seq(
      Row(1L, Seq("a", null, "c"), Row("x", 1.5), Map("p" -> 1, "q" -> null),
        Array[Byte](1, 2, 3), java.sql.Date.valueOf("2021-06-01"), 2.5),
      Row(2L, Seq.empty[String], Row(null, null), Map.empty[String, Integer],
        Array.empty[Byte], java.sql.Date.valueOf("1969-12-31"), null),
      Row(3L, null, null, null, null, null, Double.NaN))
    val orig = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val d2 = s"$dir/nested"
    Avro.write(orig, d2)
    val back = spark.read.format("graft-avro").load(d2)
    assert(back.schema == orig.schema)
    assert(back.count() == 3)
    // set ops reject MAP columns — compare maps as sorted entry arrays
    val norm = (df: org.apache.spark.sql.DataFrame) =>
      df.withColumn("counts", sort_array(map_entries(col("counts"))))
    assert(norm(back).exceptAll(norm(orig)).count() == 0)
    assert(norm(orig).exceptAll(norm(back)).count() == 0)
  }

  test("byte-range splits are sync-aligned: small blocks -> many partitions, no row torn") {
    val orig = util.t(spark, "/root/testdata/sf0.001", "orders").repartition(2)
    val n = orig.count()
    val d2 = s"$dir/split"
    // tiny sync interval -> many blocks; tiny maxSplitBytes -> many splits
    Avro.write(orig, d2, syncInterval = 2048)
    val back = spark.read.format("graft-avro")
      .option("maxSplitBytes", "8192").load(d2)
    assert(back.rdd.getNumPartitions > 4,
      s"expected many byte-range splits, got ${back.rdd.getNumPartitions}")
    assert(back.count() == n)
    assert(back.exceptAll(orig).count() == 0)
  }

  test("column pruning reaches the scan and results stay correct") {
    val back = spark.read.format("graft-avro").load(dir)
      .select(col("o_orderkey"), col("o_totalprice"))
    val scan = back.queryExecution.executedPlan.toString
    assert(!scan.contains("o_orderpriority"),
      s"pruned column still in scan:\n$scan")
    val expected = util.t(spark, "/root/testdata/sf0.001", "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    assert(back.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(back).count() == 0)
  }
}
