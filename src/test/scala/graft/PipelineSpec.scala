package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Distributed, Sampling}
import graft.text.{Dedup, TextAnalysis}

/** End-to-end integration of the training-data ops: quality filter →
  * PII scrub → exact dedup → near-dedup (LSH + clusters, keep canonical) →
  * benchmark decontamination → stratified sampling → shard packing →
  * sequence packing. Each stage is the library API; the spec asserts the
  * pipeline-level invariants (monotone row counts, canonical-only
  * survivors, shard budget, exact sequence lengths) and full determinism
  * across two runs — resumable ingestion is a core 100 TB property and
  * every stage here is hash- or order-derived, never RNG. */
class PipelineSpec extends SparkSpec {

  /** Stages 1-6: the surviving, sampled document set. */
  private def sampledDocs(): DataFrame = {
    val docs = graft.queries.util.t(spark, "/root/testdata/sf0.001", "documents")
    val bench = docs.filter(col("doc_id") < 3)
    val corpus = docs.filter(col("doc_id") >= 3)

    // 1. quality floor
    val kept = corpus
      .withColumn("q", TextAnalysis.qualityScore(col("text")))
      .filter(col("q") >= 0.4)
    // 2. PII scrub — identity on this clean corpus, but the codegen'd
    // regex kernel runs over every byte exactly as it would in production
    // (most real docs are also PII-free; the scrub is a full pass either way)
    val scrubbed = kept.withColumn("text", TextAnalysis.redactPii(col("text")))
    // 3. exact dedup: keep the smallest id per distinct text
    val canonIds = Dedup.exact(scrubbed, "doc_id", "text")
    val exact = scrubbed.join(canonIds, Seq("doc_id"), "left_semi")
    // 4. near-dedup: LSH pairs → components → keep each cluster's min id
    val pairs = Dedup.nearDuplicates(exact, "doc_id", "text",
      w = 3, k = 4, b = 2, threshold = 0.5,
      parallelism = spark.sparkContext.defaultParallelism)
    val clusters = Dedup.duplicateClusters(pairs, "id_a", "id_b")
    val dropNearDups = clusters.filter(col("doc_id") =!= col("cluster_id"))
      .select("doc_id")
    val near = exact.join(dropNearDups, Seq("doc_id"), "left_anti")
    // 5. decontaminate against the benchmark slice
    val clean = Dedup.decontaminate(near, "doc_id", "text", bench, "text",
      w = 5, minHits = 1)
    // 6. deterministic stratified downsample per language
    Sampling.sampleStratified(clean, Seq("lang"), "doc_id", 0.8)
  }

  /** + stage 7: byte-budget shard packing. */
  private def runPipeline(): DataFrame = {
    val sampled = sampledDocs()
    val summed = Distributed.withPrefixSum(
      sampled.select(col("doc_id"), col("lang"), col("n_chars")),
      col("n_chars"), Seq(col("doc_id")), "run_chars")
    summed.withColumn("shard", ((col("run_chars") - 1) / 2000).cast("long"))
  }

  test("the pipeline composes, shrinks monotonically, packs within budget") {
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

  test("stage 8: the survivor stream packs into exact 64-token sequences") {
    val L = 64L
    val docs = sampledDocs().select(col("doc_id"), col("text"))
    val toks = docs.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_toks"))
    val spans = graft.ops.SequencePacking.spans(
      docs, TextAnalysis.tokenCount(col("text")), Seq(col("doc_id")), L)
      .select(col("seq_id"), col("doc_id"), col("n_slice"))
      .cache()
    try {
      // per-doc slices reassemble the doc exactly
      val perDoc = spans.groupBy("doc_id").agg(sum("n_slice").as("got"))
        .join(toks, Seq("doc_id"))
        .filter(col("got") =!= col("n_toks"))
      assert(perDoc.isEmpty, "a doc's slices must sum to its token count")
      // every sequence except the last is exactly L tokens
      val lastSeq = spans.agg(max("seq_id")).head().getLong(0)
      val short = spans.groupBy("seq_id").agg(sum("n_slice").as("n"))
        .filter(col("seq_id") < lastSeq && col("n") =!= L)
      assert(short.isEmpty, s"every non-final sequence must carry exactly $L tokens")
    } finally spans.unpersist()
  }

  test("the pipeline is deterministic end-to-end (two runs, identical output)") {
    val a = runPipeline().collect().map(_.toString).sorted.toSeq
    val b = runPipeline().collect().map(_.toString).sorted.toSeq
    assert(a == b, "hash/order-derived stages must reproduce exactly")
  }
}
