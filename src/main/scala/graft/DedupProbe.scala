package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.Dedup

/** Scratch profiler for the dedup pipeline (not part of the library). */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // at replica SFs a verify shuffle is tens of GB; make the context
      // cleaner reclaim finished shuffles promptly so back-to-back runs
      // don't accumulate past the disk (default periodic GC is 30 min)
      .config("spark.cleaner.periodicGC.interval", "60s")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // mimic Bench: one tiny synthetic dedup warmup (JIT/classloading), then
    // the query cold, then again warm — synthetic, so the probe runs on
    // documents-only replica dirs (a full-table warmup key would need
    // lineitem at the replica SF)
    val tinyDocs = spark.range(64).select(
      col("id").as("doc_id"),
      concat(lit("warm up text number "), col("id").cast("string"),
        lit(" lorem ipsum dolor sit amet consectetur")).as("text"))
    Dedup.nearDuplicates(tinyDocs, "doc_id", "text", 3, 4, 2, 0.5)
      .write.format("noop").mode("overwrite").save()
    def run(tag: String): Unit = {
      val t0 = System.nanoTime()
      SparkEntry.queries("dedup_near_pairs")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[probe] $tag ${(System.nanoTime()-t0)/1e9}%.2f s")
      System.gc() // release the finished run's shuffle files (see above)
    }
    run("cold"); run("warm"); run("warm2")
    // GRAFT_PROBE_POISON=0 skips the degenerate-bucket probe (e.g. at
    // replica SFs where its two extra full-corpus scans aren't the point)
    if (sys.env.get("GRAFT_PROBE_POISON").contains("0")) {
      spark.stop(); return
    }

    // Degenerate-bucket probe: plant 10^4 byte-identical docs (one LSH bucket
    // of 10k ids → 5·10^7 pairs if expanded). With maxBucket the bucket is
    // dropped before pair expansion — candidate time stays bounded.
    val planted = spark.range(10000).select(
      (col("id") + 1000000).as("doc_id"),
      lit("identical degenerate filler text shared by every planted document").as("text"))
    val real = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val poisoned = real.unionByName(planted)
    def cands(tag: String, cap: Int): Unit = {
      val t0 = System.nanoTime()
      val n = Dedup.minhashCandidates(poisoned, "doc_id", "text", maxBucket = cap).count()
      println(f"[probe] candidates maxBucket=$cap%-6d $n%9d pairs  ${(System.nanoTime()-t0)/1e9}%.2f s  ($tag)")
    }
    cands("capped: hot bucket dropped", 1000)
    cands("uncapped: n^2/2 expansion of the planted bucket", 0)
    spark.stop()
  }
}
