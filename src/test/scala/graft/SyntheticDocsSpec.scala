package graft

import org.apache.spark.sql.functions._

/** The DataSourceV2 example source: deterministic, partition-parallel,
  * integrates with the full query surface (it's just a table to Catalyst). */
class SyntheticDocsSpec extends SparkSpec {

  test("short name loads, row count and schema are exact") {
    val df = spark.read.format("graft-docs")
      .option("rows", 1000).option("partitions", 7).load()
    assert(df.schema.fieldNames.toSeq == Seq("doc_id", "text"))
    assert(df.count() == 1000)
    assert(df.rdd.getNumPartitions == 7)
    assert(df.select(countDistinct(col("doc_id"))).collect()(0).getLong(0) == 1000)
  }

  test("content is deterministic across reads and partition layouts") {
    def read(parts: Int) = spark.read.format("graft-docs")
      .option("rows", 200).option("partitions", parts).load()
    val a = read(3).orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    val b = read(11).orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(a.sameElements(b))
  }

  test("the source composes with graft operators (dedup over a v2 scan)") {
    val df = spark.read.format("graft-docs")
      .option("rows", 500).option("partitions", 4).load()
    val sigs = df.select(col("doc_id"),
      graft.text.Dedup.minhashSignature(col("text"), w = 3, k = 8).as("sig"))
    assert(sigs.count() == 500)
    assert(sigs.filter(size(col("sig")) === 8).count() == 500)
  }
}
