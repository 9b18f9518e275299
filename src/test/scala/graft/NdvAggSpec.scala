package graft

import org.apache.spark.sql.functions._
import graft.{functions => gf}

/** One-pass exact NDV aggregate (functions/NdvAgg.scala): must equal
  * countDistinct on every input shape — the whole point is replacing the
  * Expand plan without changing a single answer. */
class NdvAggSpec extends SparkSpec {

  test("ndvAgg equals countDistinct per group (nulls ignored, zero counted)") {
    import spark.implicits._
    val df = Seq[(String, java.lang.Long)](
      ("a", 1L), ("a", 1L), ("a", 2L), ("a", null), ("a", 0L), ("a", 0L),
      ("b", -5L), ("b", 5L), ("b", null), ("b", null),
      ("c", 0L)).toDF("g", "v")
    val got = df.groupBy($"g")
      .agg(gf.ndvAgg($"v").as("ndv"), countDistinct($"v").as("cd"))
      .orderBy($"g").collect()
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 3L), ("b", 2L), ("c", 1L)))
    got.foreach(r => assert(r.getLong(1) == r.getLong(2), r.toString))
  }

  test("ndvAgg merges across partitions and grows past the initial capacity") {
    // 100k rows over 10 partitions, 37k distinct values scattered so every
    // partial set grows several times and the final merge unions overlaps
    val df = spark.range(100000).repartition(10)
      .select((col("id") % 3).as("g"), pmod(col("id") * 7919L, lit(37000L)).as("v"))
    val got = df.groupBy(col("g"))
      .agg(gf.ndvAgg(col("v")).as("ndv"), countDistinct(col("v")).as("cd"))
      .collect()
    assert(got.length == 3)
    got.foreach(r => assert(r.getLong(1) == r.getLong(2), r.toString))
  }

  test("two ndvAgg columns in one groupBy plan WITHOUT Expand") {
    val df = spark.range(1000)
      .select((col("id") % 5).as("g"), (col("id") % 11).as("a"),
        (col("id") % 13).as("b"))
    val q = df.groupBy(col("g"))
      .agg(gf.ndvAgg(col("a")).as("na"), gf.ndvAgg(col("b")).as("nb"))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"one-pass NDV must not Expand:\n$plan")
    // and the dual-countDistinct DOES, proving the assertion bites
    val dual = df.groupBy(col("g"))
      .agg(countDistinct(col("a")), countDistinct(col("b")))
    assert(dual.queryExecution.executedPlan.toString.contains("Expand"))
    val rows = q.orderBy(col("g")).collect()
    assert(rows.map(_.getLong(1)).forall(_ > 0))
  }

  test("graft_ndv is registered in SQL and type-checks its input") {
    spark.range(100).select((col("id") % 4).as("g"), (col("id") % 9).as("v"))
      .createOrReplaceTempView("ndv_t")
    val got = spark.sql(
      "SELECT g, graft_ndv(v) AS ndv FROM ndv_t GROUP BY g ORDER BY g")
      .collect().map(_.getLong(1))
    assert(got.toSeq == Seq(9L, 9L, 9L, 9L))
    val err = intercept[Exception] {
      spark.sql("SELECT graft_ndv(CAST(id AS STRING)) FROM ndv_t").collect()
    }
    assert(err.getMessage.contains("bigint"), err.getMessage)
  }

  test("LongSet survives serialize/deserialize round-trips with zero present") {
    val s = new graft.functions.LongSet()
    val vals = Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue, 42L, 42L)
    vals.foreach(s.add)
    assert(s.size == 6)
    val back = graft.functions.LongSet.fromBytes(s.toBytes)
    assert(back.size == 6)
    back.addAll(s)
    assert(back.size == 6)
  }
}
