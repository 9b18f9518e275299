package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Distributed, Sampling}
import graft.text.{Dedup, TextAnalysis}

/** End-to-end integration of the training-data ops: quality filter →
  * exact dedup → near-dedup (LSH + clusters, keep canonical) →
  * benchmark decontamination → stratified sampling → shard packing.
  * Each stage is the library API; the spec asserts the pipeline-level
  * invariants (monotone row counts, canonical-only survivors, shard
  * budget) and full determinism across two runs — resumable ingestion is
  * a core 100 TB property and every stage here is hash- or
  * order-derived, never RNG. */
class PipelineSpec extends SparkSpec {

  private def runPipeline(): DataFrame = {
    val docs = graft.queries.util.t(spark, "/root/testdata/sf0.001", "documents")
    val bench = docs.filter(col("doc_id") < 3)
    val corpus = docs.filter(col("doc_id") >= 3)

    // 1. quality floor
    val kept = corpus
      .withColumn("q", TextAnalysis.qualityScore(col("text")))
      .filter(col("q") >= 0.4)
    // 2. exact dedup: keep the smallest id per distinct text
    val canonIds = Dedup.exact(kept, "doc_id", "text")
    val exact = kept.join(canonIds, Seq("doc_id"), "left_semi")
    // 3. near-dedup: LSH pairs → components → keep each cluster's min id
    val pairs = Dedup.nearDuplicates(exact, "doc_id", "text",
      w = 3, k = 4, b = 2, threshold = 0.5,
      parallelism = spark.sparkContext.defaultParallelism)
    val clusters = Dedup.duplicateClusters(pairs, "id_a", "id_b")
    val dropNearDups = clusters.filter(col("doc_id") =!= col("cluster_id"))
      .select("doc_id")
    val near = exact.join(dropNearDups, Seq("doc_id"), "left_anti")
    // 4. decontaminate against the benchmark slice
    val clean = Dedup.decontaminate(near, "doc_id", "text", bench, "text",
      w = 5, minHits = 1)
    // 5. deterministic stratified downsample per language
    val sampled = Sampling.sampleStratified(clean, Seq("lang"), "doc_id", 0.8)
    // 6. byte-budget shard packing on the running char count
    val summed = Distributed.withPrefixSum(
      sampled.select(col("doc_id"), col("lang"), col("n_chars")),
      col("n_chars"), Seq(col("doc_id")), "run_chars")
    summed.withColumn("shard", ((col("run_chars") - 1) / 2000).cast("long"))
  }

  test("the six-stage pipeline composes, shrinks monotonically, packs within budget") {
    val out = runPipeline()
    val docs = graft.queries.util.t(spark, "/root/testdata/sf0.001", "documents")
    val n0 = docs.filter(col("doc_id") >= 3).count()
    val n = out.count()
    assert(n > 0 && n < n0, s"pipeline must keep some and drop some: $n of $n0")
    // survivors are unique documents
    assert(out.select("doc_id").distinct().count() == n)
    // every shard respects the byte budget except single-doc overflows
    val bad = out.groupBy("shard")
      .agg(sum("n_chars").as("bytes"), count(lit(1)).as("docs"))
      .filter(col("bytes") > 2000 && col("docs") > 1)
      // a shard may exceed the budget only via its LAST doc straddling the
      // boundary (the pack contract): bytes - any one doc must fit
      .join(out.groupBy("shard").agg(max("n_chars").as("biggest")), Seq("shard"))
      .filter(col("bytes") - col("biggest") > 2000)
    assert(bad.isEmpty, "a shard exceeds the budget beyond one straddling doc")
  }

  test("the pipeline is deterministic end-to-end (two runs, identical output)") {
    val a = runPipeline().collect().map(_.toString).sorted.toSeq
    val b = runPipeline().collect().map(_.toString).sorted.toSeq
    assert(a == b, "hash/order-derived stages must reproduce exactly")
  }
}
