package graft

import org.apache.spark.sql.functions._
import graft.{functions => gf}

/** TopKAgg: bounded-state grouped top-k must equal the sort-everything
  * formulation, plan with partial aggregation, and handle edge inputs. */
class TopKAggSpec extends SparkSpec {

  test("top-k and bottom-k equal the sort_array/collect_list formulation") {
    val df = graft.queries.util.t(spark, "/root/testdata/sf0.001", "lineitem")
    val got = df.groupBy(col("l_returnflag"))
      .agg(gf.topKAgg(col("l_quantity"), 5).as("t5"),
        gf.topKAgg(col("l_quantity"), 3, descending = false).as("b3"))
    val want = df.groupBy(col("l_returnflag"))
      .agg(slice(reverse(array_sort(collect_list(col("l_quantity")))), 1, 5).as("t5"),
        slice(array_sort(collect_list(col("l_quantity"))), 1, 3).as("b3"))
    val g = got.collect().map(r => r.getString(0) -> (r.getSeq[Double](1), r.getSeq[Double](2))).toMap
    val w = want.collect().map(r => r.getString(0) -> (r.getSeq[Double](1), r.getSeq[Double](2))).toMap
    assert(g == w)
  }

  test("groups smaller than k return all values; empty input returns no rows") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 2.0)).toDF("k", "v")
    val out = df.groupBy(col("k")).agg(gf.topKAgg(col("v"), 10).as("t"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(out("a") == Seq(3.0, 1.0) && out("b") == Seq(2.0))
    assert(df.filter(lit(false)).groupBy(col("k"))
      .agg(gf.topKAgg(col("v"), 2).as("t")).count() == 0)
  }

  test("nulls are ignored like builtin aggregates") {
    import spark.implicits._
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(5.0)))
      .toDF("k", "v")
    val out = df.groupBy(col("k")).agg(gf.topKAgg(col("v"), 2).as("t"))
      .collect()(0).getSeq[Double](1)
    assert(out == Seq(5.0, 1.0))
  }

  test("plans as partial + final aggregate around the shuffle (no window)") {
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .groupBy(col("l_returnflag"))
      .agg(gf.topKAgg(col("l_quantity"), 5).as("t5"))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"unexpected window in:\n$p")
    assert("ObjectHashAggregate|SortAggregate|HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final aggregate:\n$p")
  }
}
