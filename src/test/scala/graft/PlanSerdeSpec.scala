package graft

import org.apache.spark.sql.functions._
import graft.plans.PlanSerde
import graft.plans.PlanSerde._
import graft.testing.Assertions.assertFrameEqual

/** Plan serialization round-trip (polars LazyFrame::serialize analogue,
  * crates/polars-plan/src/client/mod.rs): build → toJson → fromJson →
  * build must execute the same logical plan, over scan / filter / select /
  * agg / join / window / sort / limit shapes. */
class PlanSerdeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def roundTrips(plan: Node): Unit = {
    val direct = PlanSerde.build(spark, plan)
    val json = PlanSerde.toJson(plan)
    val back = PlanSerde.fromJson(json)
    assert(back == plan, s"ADT round-trip diverged:\n$json\n$back")
    assertFrameEqual(direct, PlanSerde.build(spark, back))
  }

  test("scan + filter + select round-trips") {
    roundTrips(
      Select(
        Filter(Scan("parquet", s"$sf/lineitem.parquet"), "l_quantity > 40"),
        Seq("l_orderkey", "l_quantity * 2 AS dbl_qty")))
  }

  test("aggregate (grouped and global) round-trips") {
    roundTrips(
      Agg(Scan("parquet", s"$sf/lineitem.parquet"),
        Seq("l_returnflag"),
        Seq("sum(l_quantity) AS sum_qty", "count(*) AS n")))
    roundTrips(
      Agg(Scan("parquet", s"$sf/lineitem.parquet"),
        Nil, Seq("avg(l_extendedprice) AS avg_price")))
  }

  test("join + sort + limit round-trips") {
    roundTrips(
      Limit(
        Sort(
          Join(
            Scan("parquet", s"$sf/orders.parquet"),
            Select(Scan("parquet", s"$sf/customer.parquet"),
              Seq("c_custkey AS o_custkey", "c_mktsegment")),
            Seq("o_custkey"), "left"),
          Seq(SortKey("o_totalprice", desc = true),
            SortKey("o_orderkey"))),
        25))
  }

  test("window expressions ride through selectExpr strings") {
    roundTrips(
      Select(Scan("parquet", s"$sf/orders.parquet"),
        Seq("o_orderkey", "o_custkey",
          "rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC)" +
            " AS rnk")))
  }

  test("HOF expressions and scan options serialize") {
    roundTrips(
      Select(
        Scan("parquet", s"$sf/lineitem.parquet",
          Map("mergeSchema" -> "false")),
        Seq("l_orderkey",
          "aggregate(sequence(1, 4), 0L, (a, x) -> a + x) AS ten")))
  }

  test("the serialized form is plain JSON with an op discriminator") {
    val json = PlanSerde.toJson(
      Filter(Scan("parquet", "/x"), "a > 1"))
    assert(json.contains("\"jsonClass\""), json)
    assert(json.contains("Filter") && json.contains("Scan"), json)
  }
}
