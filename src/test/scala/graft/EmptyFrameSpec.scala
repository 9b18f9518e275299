package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.dsl.LazyFrame

/** Empty-frame laws across the operator surface — the reference's unit
  * tests exercise zero-row frames heavily (crawl shards ARE sometimes
  * empty), so the engine must keep schemas and produce empty results
  * rather than erroring. */
class EmptyFrameSpec extends SparkSpec {
  import spark.implicits._

  private def empty = Seq.empty[(Long, String, Double)].toDF("id", "s", "v")

  test("filter/select/sort/limit on empty frames keep schema, zero rows") {
    val lf = LazyFrame(empty)
    val out = lf.filter(col("v") > 0).select(col("id"), col("v"))
      .sort(col("id")).limit(5).df
    assert(out.count() == 0)
    assert(out.schema.fieldNames.toSeq == Seq("id", "v"))
  }

  test("groupBy/agg on an empty frame yields zero groups; global agg one row") {
    val g = empty.groupBy(col("s")).agg(sum(col("v")).as("sv"))
    assert(g.count() == 0)
    val global = empty.agg(count(lit(1)).as("n"), sum(col("v")).as("sv")).collect()(0)
    assert(global.getLong(0) == 0 && global.isNullAt(1))
  }

  test("joins with an empty side produce the lawful row counts") {
    val full = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "s", "v")
    assert(full.join(empty.select(col("id")), Seq("id"), "inner").count() == 0)
    assert(full.join(empty.select(col("id")), Seq("id"), "left").count() == 2)
    assert(full.join(empty.select(col("id")), Seq("id"), "left_anti").count() == 2)
    assert(empty.join(full.select(col("id")), Seq("id"), "left_semi").count() == 0)
  }

  test("window/explode/distinct on empty frames are empty, not errors") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("s")).orderBy(col("id"))
    assert(empty.withColumn("rn", row_number().over(w)).count() == 0)
    assert(empty.select(explode(split(col("s"), " "))).count() == 0)
    assert(empty.distinct().count() == 0)
  }

  test("curation ops accept empty corpora") {
    val docs = Seq.empty[(Long, String, Boolean)].toDF("id", "text", "t")
    assert(graft.text.Dsir.importanceWeights(docs, "id", "text", col("t"))
      .count() == 0)
    assert(graft.text.Ranking.unigramNll(docs, "id", "text").count() == 0)
    assert(graft.text.Ranking.bm25(docs, "id", "text", Seq("x")).count() == 0)
    val vecs = Seq.empty[(Long, Array[Double])].toDF("id", "v")
    val cents = Seq(0 -> Array(0.0, 1.0))
    // train on an empty corpus: centroids retained, assignment empty
    val (c, a) = graft.ml.KMeans.train(vecs, "id", "v", cents, iters = 1)
    assert(c == cents && a.count() == 0)
    assert(graft.ops.Sampling.sampleWeightedLog(
      Seq.empty[(Long, Double)].toDF("id", "lw"), "id", "lw", 5).count() == 0)
  }

  test("write/read round-trip of an empty frame keeps the schema") {
    val dir = "/tmp/graft_test/empty_rt"
    empty.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 0)
    assert(back.schema == StructType(Seq(
      StructField("id", LongType), StructField("s", StringType),
      StructField("v", DoubleType))))
  }
}
