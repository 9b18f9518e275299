package graft

import org.apache.spark.sql.functions._
import graft.dsl.LazyFrame

/** Source/sink round-trips (SURVEY §2.2): parquet, CSV (header + schema
  * inference), NDJSON, partitioned writes, text lines. */
class IOSpec extends SparkSpec {
  import spark.implicits._

  private def sample = Seq(
    (1L, "alpha", 1.5, "2024-01-01"),
    (2L, "beta", -2.25, "2024-02-01"),
    (3L, null.asInstanceOf[String], 0.0, "2024-03-01")
  ).toDF("id", "name", "v", "d").withColumn("d", col("d").cast("date"))

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-io-$tag").toString

  test("parquet round-trip preserves schema and values") {
    val p = tmp("parquet")
    LazyFrame(sample).sinkParquet(p)
    val back = LazyFrame.scanParquet(spark, p).collect()
    // parquet scans surface everything nullable — compare names + types
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      sample.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.exceptAll(sample).isEmpty && sample.exceptAll(back).isEmpty)
  }

  test("csv round-trip with header + inference (ints widen to int/long)") {
    val p = tmp("csv")
    LazyFrame(sample).sinkCsv(p)
    val back = LazyFrame.scanCsv(spark, p).collect()
    assert(back.count() == 3)
    assert(back.columns.toSeq == sample.columns.toSeq)
    assert(back.schema("d").dataType == org.apache.spark.sql.types.DateType)
  }

  test("ndjson round-trip (json lines drop null fields per row)") {
    val p = tmp("json")
    LazyFrame(sample).sinkJson(p)
    val back = LazyFrame.scanNdjson(spark, p).collect()
    assert(back.count() == 3)
    assert(back.filter(col("name").isNull).count() == 1)
  }

  test("partitioned parquet sink prunes partitions on read") {
    val p = tmp("part")
    LazyFrame(sample).sinkParquet(p, partitionBy = Seq("d"))
    val pruned = LazyFrame.scanParquet(spark, p)
      .filter(col("d") === "2024-01-01")
    assert(pruned.count() == 1)
    // partition filter must appear in the scan, not as a post-filter
    assert(pruned.explainFormatted().contains("PartitionFilters"))
  }

  test("max-size sink caps rows per file (reference sink.rs max-size variant)") {
    val p = tmp("maxsize")
    val big = spark.range(1000).toDF("id").coalesce(1) // one task → one file normally
    LazyFrame(big).sinkParquet(p, maxRecordsPerFile = 100)
    val files = new java.io.File(p).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length == 10, s"expected 1000/100 = 10 files, got ${files.length}")
    // every file honors the cap and nothing is lost
    files.foreach { f =>
      val n = spark.read.parquet(f.getPath).count()
      assert(n <= 100, s"${f.getName} has $n rows > cap")
    }
    assert(LazyFrame.scanParquet(spark, p).count() == 1000)

    // composes with by-key partitioning: each hive dir splits at the cap
    val p2 = tmp("maxsize-key")
    val keyed = spark.range(400)
      .select(col("id"), (col("id") % 2).as("k")).coalesce(1)
    LazyFrame(keyed).sinkParquet(p2, partitionBy = Seq("k"), maxRecordsPerFile = 50)
    (0 to 1).foreach { k =>
      val dir = new java.io.File(s"$p2/k=$k")
      val n = dir.listFiles().count(_.getName.endsWith(".parquet"))
      assert(n == 4, s"k=$k: expected 200/50 = 4 files, got $n")
    }
  }

  test("byte-budget sink converts the budget through estimated row width") {
    val p = tmp("bytesize")
    val big = spark.range(2000).select(col("id"), col("id").cast("string").as("s"))
      .coalesce(1)
    // in-memory row estimate ~20-30 bytes → a ~25KB budget must split the
    // single task's output into multiple capped files, losing nothing
    LazyFrame(big).sinkParquetTargetSize(p, targetFileBytes = 25000)
    val files = new java.io.File(p).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length > 1, "budget smaller than the data must split files")
    assert(LazyFrame.scanParquet(spark, p).count() == 2000)
  }

  test("scan_lines reads raw text") {
    val p = tmp("lines")
    Seq("a b", "c").toDF("value").write.mode("overwrite").text(p)
    assert(LazyFrame.scanLines(spark, p).count() == 2)
  }
}
