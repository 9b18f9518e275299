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
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // mimic Bench: one unrelated warmup, then the query cold, then again warm
    SparkEntry.queries("agg_sum_two_keys")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    def run(tag: String): Unit = {
      val t0 = System.nanoTime()
      SparkEntry.queries("dedup_near_pairs")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[probe] $tag ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    run("cold"); run("warm"); run("warm2")
    spark.stop()
  }
}
