package graft

import org.apache.spark.sql.functions._
import graft.text.Dedup

/** Bloom sketch surface (graft.functions.bloomAgg / bloomMightContain and
  * Dedup.contaminationHitsBloom): the no-false-negative law, bounded false
  * positives, the superset relation to exact decontamination, and the SQL
  * registration. */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("bloom membership: every inserted value tests positive") {
    val vals = (1L to 500L).map(i => s"item-$i").toDF("v")
    val sketch = vals.agg(graft.functions.bloomAgg(col("v"), 500L, 1L << 16))
      .head.getAs[Array[Byte]](0)
    val misses = vals.filter(
      !graft.functions.bloomMightContain(lit(sketch), col("v"))).count()
    assert(misses == 0, "a Bloom filter can never false-negative")
  }

  test("bloom false positives stay near the designed rate") {
    val in = (1L to 1000L).map(i => s"in-$i").toDF("v")
    val out = (1L to 10000L).map(i => s"out-$i").toDF("v")
    val sketch = in.agg(graft.functions.bloomAgg(col("v"), 1000L, 1L << 16))
      .head.getAs[Array[Byte]](0)
    val fp = out.filter(
      graft.functions.bloomMightContain(lit(sketch), col("v"))).count()
    // 2^16 bits / 1000 items ≈ 65 bits/item → fpp well under 1%; allow 2%
    assert(fp <= 200, s"false-positive rate too high: $fp / 10000")
  }

  test("contaminationHitsBloom flags a superset of the exact hit set") {
    val docs = graft.queries.util.t(spark, "/root/testdata/sf0.001", "documents")
    val bench = docs.filter(col("doc_id") % 7 === 0)
    val exact = Dedup.contaminationHits(docs, "doc_id", "text", bench, "text", w = 5)
    val bloom = Dedup.contaminationHitsBloom(docs, "doc_id", "text", bench, "text", w = 5)
    val missed = exact.select("doc_id")
      .exceptAll(bloom.select("doc_id")).count()
    assert(missed == 0, "bloom path dropped an exactly-contaminated doc")
    // per-doc: bloom counts >= exact counts (sketch accepts a superset)
    val under = exact.join(bloom.withColumnRenamed("n_hits", "bn"), "doc_id")
      .filter(col("bn") < col("n_hits")).count()
    assert(under == 0)
  }

  test("graft_bloom_agg / graft_bloom_might_contain work from SQL") {
    (1L to 100L).map(i => s"k$i").toDF("v").createOrReplaceTempView("bloom_in")
    val sketch = spark.sql(
      "SELECT graft_bloom_agg(v, 65536) FROM bloom_in").head.getAs[Array[Byte]](0)
    spark.sql("SELECT * FROM bloom_in").createOrReplaceTempView("bloom_probe")
    val hits = spark.sql(
      "SELECT count(*) FROM bloom_probe WHERE graft_bloom_might_contain(" +
        s"${sketch.map(b => f"$b%02x").mkString("X'", "", "'")}, v)")
      .head.getLong(0)
    assert(hits == 100L, "all inserted keys must probe positive via SQL")
  }
}
