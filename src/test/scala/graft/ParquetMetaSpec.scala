package graft

import org.apache.spark.sql.functions._
import graft.dsl.LazyFrame
import graft.sources.ParquetMeta
import graft.testing.FromRepr

/** Round-11 façade additions: parquet metadata readers, from_repr,
  * concat_arr, collect_all/explain_all. */
class ParquetMetaSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/tmp/graft_test/pqmeta"

  test("rowGroups: counts sum to the table, per-group column count is the leaf count") {
    val src = util_t("part")
    src.repartition(3).write.mode("overwrite").parquet(dir)
    val rg = ParquetMeta.rowGroups(spark, dir)
    assert(rg.agg(sum("num_rows")).head.getLong(0) == src.count())
    assert(rg.select("num_columns").distinct().head.getLong(0) ==
      src.schema.size) // part is flat — leaves == top-level fields
    assert(rg.select("file").distinct().count() == 3)
  }

  test("kvMetadata: Spark-written files carry the spark schema keys, md5/len consistent") {
    val kv = ParquetMeta.kvMetadata(spark, dir).collect()
    assert(kv.nonEmpty)
    assert(kv.exists(_.getString(1) == "org.apache.spark.sql.parquet.row.metadata"))
    kv.foreach { r =>
      assert(r.getLong(3) == r.getString(2).length.toLong)
      assert(r.getString(4).matches("[0-9a-f]{32}"))
    }
  }

  test("schemaOf: physical types use parquet format-spec names") {
    val sch = ParquetMeta.schemaOf(spark, dir)
      .select("name", "physical_type").as[(String, String)].collect().toMap
    assert(sch("p_partkey") == "INT64")
    assert(sch("p_name") == "BYTE_ARRAY") // never parquet-java's "BINARY"
    assert(sch("p_retailprice") == "DOUBLE")
  }

  test("from_repr round-trips a polars-style table repr") {
    val df = FromRepr.parse(spark,
      """shape: (3, 4)
        |┌─────┬───────┬───────┬──────┐
        |│ id  ┆ name  ┆ score ┆ ok   │
        |│ --- ┆ ---   ┆ ---   ┆ ---  │
        |│ i64 ┆ str   ┆ f64   ┆ bool │
        |╞═════╪═══════╪═══════╪══════╡
        |│ 1   ┆ alpha ┆ 0.5   ┆ true │
        |│ 2   ┆ null  ┆ 1.25  ┆ false│
        |│ 3   ┆ gamma ┆ null  ┆ true │
        |└─────┴───────┴───────┴──────┘""".stripMargin)
    assert(df.columns.toSeq == Seq("id", "name", "score", "ok"))
    assert(df.schema("id").dataType.typeName == "long")
    assert(df.count() == 3)
    val r = df.orderBy("id").collect()
    assert(r(1).isNullAt(1) && r(2).isNullAt(2))
    assert(r(0).getString(1) == "alpha" && r(1).getDouble(2) == 1.25)
  }

  test("from_repr: ascii table, wrapped header, truncation row dropped") {
    val df = FromRepr.parse(spark,
      """#| long_na | v   |
        #| me_col  | --- |
        #| ---     | i32 |
        #| str     |     |
        #|=========|=====|
        #| x       | 7   |
        #| …       | …   |
        #| y       | 9   |""".stripMargin('#'))
    assert(df.columns.toSeq == Seq("long_name_col", "v"))
    assert(df.count() == 2)
  }

  test("from_repr: width-truncated repr drops the … column (empty divider cells)") {
    val df = FromRepr.parse(spark,
      """┌─────┬─────┬─────┐
        |│ a   ┆ …   ┆ z   │
        |│ --- ┆     ┆ --- │
        |│ i64 ┆     ┆ i64 │
        |╞═════╪═════╪═════╡
        |│ 1   ┆ …   ┆ 5   │
        |│ 2   ┆ …   ┆ 6   │
        |└─────┴─────┴─────┘""".stripMargin)
    assert(df.columns.toSeq == Seq("a", "z"))
    assert(df.orderBy("a").collect().map(_.getLong(1)).toSeq == Seq(5L, 6L))
  }

  test("concatArr: scalars reshape, arrays pass through, width enforced") {
    val df = Seq((1, Seq(1.0, 2.0), 9.0), (2, Seq(3.0, 4.0), 8.0))
      .toDF("id", "xs", "s")
    val out = LazyFrame(df)
      .concatArr("arr", Seq(col("xs"), col("s"), col("id").cast("double")), 4)
      .df.orderBy("id").collect()
    assert(out(0).getSeq[Double](3) == Seq(1.0, 2.0, 9.0, 1.0))
    // wrong declared width raises at runtime (the polars Array contract)
    val bad = LazyFrame(df).concatArr("arr", Seq(col("xs")), 3).df
    val e = intercept[Exception](bad.collect())
    assert(e.getMessage.contains("fixed-size array"))
  }

  test("collectAll + explainAll run every frame") {
    val frames = Seq(
      LazyFrame(util_t("region")), LazyFrame(util_t("nation")))
    val rows = LazyFrame.collectAll(frames)
    assert(rows.map(_.length) == Seq(5, 25))
    val plans = LazyFrame.explainAll(frames)
    assert(plans.size == 2 && plans.forall(_.contains("Scan parquet")))
  }

  private def util_t(name: String) =
    graft.queries.util.t(spark, "/root/testdata/sf0.001", name)
}
