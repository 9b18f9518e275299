package graft

import org.apache.spark.sql.functions._
import graft.queries.util
import graft.sources.ArrowIpc

/** Arrow IPC DSv2 connector: roundtrip fidelity, per-batch split planning,
  * column pruning, and columnar execution. */
class ArrowIpcSpec extends SparkSpec {

  private val dir = "/tmp/graft_test/ipc_spec"

  test("roundtrip preserves every value and the schema (part table)") {
    val orig = util.t(spark, "/root/testdata/sf0.001", "part")
    ArrowIpc.write(orig, dir)
    val back = spark.read.format("graft-ipc").load(dir)
    assert(back.schema == orig.schema)
    assert(back.count() == orig.count())
    // exceptAll both ways = multiset equality, doubles compared bit-exactly
    assert(back.exceptAll(orig).count() == 0)
    assert(orig.exceptAll(back).count() == 0)
  }

  test("one input partition per record batch (footer-indexed splits)") {
    val orig = util.t(spark, "/root/testdata/sf0.001", "part").repartition(2)
    val n = orig.count()
    ArrowIpc.write(orig, dir, batchRows = 50)
    val back = spark.read.format("graft-ipc").load(dir)
    val parts = back.rdd.getNumPartitions
    // ceil(rows-per-file / 50) summed over 2 files; at least rows/50 total
    assert(parts >= (n / 50).toInt,
      s"expected >=${n / 50} batch splits, got $parts")
    assert(back.count() == n)
  }

  test("column pruning reaches the scan and results stay correct") {
    val back = spark.read.format("graft-ipc").load(dir)
      .select(col("p_partkey"), col("p_name"))
    val scan = back.queryExecution.executedPlan.toString
    // DSv2 scan line advertises the pruned ReadSchema
    assert(!scan.contains("p_retailprice"),
      s"pruned column still in scan:\n$scan")
    val expected = util.t(spark, "/root/testdata/sf0.001", "part")
      .select(col("p_partkey"), col("p_name"))
    assert(back.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(back).count() == 0)
  }

  test("reads are columnar (ArrowColumnVector batches, no row materialization)") {
    val plan = spark.read.format("graft-ipc").load(dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"), s"no columnar scan in plan:\n$plan")
  }
}
