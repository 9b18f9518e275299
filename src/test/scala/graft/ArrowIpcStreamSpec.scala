package graft

import org.apache.spark.sql.functions._
import graft.queries.util
import graft.sources.ArrowIpcStream

/** Arrow IPC STREAM connector: roundtrip fidelity, the one-partition-per-
  * file split contract (no footer to split on), and column pruning. */
class ArrowIpcStreamSpec extends SparkSpec {

  private val dir = "/tmp/graft_test/ipcs_spec"

  test("stream roundtrip preserves every value and the schema (part table)") {
    val orig = util.t(spark, "/root/testdata/sf0.001", "part")
    ArrowIpcStream.writeStream(orig, dir)
    val back = spark.read.format("graft-ipc-stream").load(dir)
    assert(back.schema == orig.schema)
    assert(back.count() == orig.count())
    assert(back.exceptAll(orig).count() == 0)
    assert(orig.exceptAll(back).count() == 0)
  }

  test("one input partition per FILE (footer-less stream framing)") {
    val orig = util.t(spark, "/root/testdata/sf0.001", "part").repartition(3)
    val n = orig.count()
    ArrowIpcStream.writeStream(orig, dir, batchRows = 50)
    val back = spark.read.format("graft-ipc-stream").load(dir)
    // stream files cannot split by batch: exactly one partition per file,
    // regardless of how many record batches each contains
    assert(back.rdd.getNumPartitions == 3,
      s"expected 3 file-partitions, got ${back.rdd.getNumPartitions}")
    assert(back.count() == n)
  }

  test("column pruning reaches the scan and results stay correct") {
    val orig = util.t(spark, "/root/testdata/sf0.001", "part")
    ArrowIpcStream.writeStream(orig, dir)
    val back = spark.read.format("graft-ipc-stream").load(dir)
      .select(col("p_partkey"), col("p_name"))
    val scan = back.queryExecution.executedPlan.toString
    assert(scan.contains("p_partkey"), s"pruned scan missing column:\n$scan")
    val expected = orig.select(col("p_partkey"), col("p_name"))
    assert(back.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(back).count() == 0)
  }

  test("multi-batch files stream every batch (batchRows smaller than data)") {
    val orig = util.t(spark, "/root/testdata/sf0.001", "part").coalesce(1)
    val n = orig.count()
    ArrowIpcStream.writeStream(orig, dir, batchRows = 16)
    val back = spark.read.format("graft-ipc-stream").load(dir)
    assert(back.rdd.getNumPartitions == 1)
    assert(back.count() == n, "every record batch of the stream must be read")
  }
}
