package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.Dedup

/** Scaling probe (not part of the library): runs the full MinHash-LSH
  * near-dup pipeline over the graft-docs DataSourceV2 generator at
  * increasing corpus sizes and prints seconds per size — evidence for the
  * SCALE.md claim that the pipeline scales with shuffle volume, not with
  * any single-node bottleneck. Usage: runMain graft.ScaleProbe [sizes...] */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq
                else Seq(5000L, 50000L, 200000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm code paths on a tiny corpus first
    def pipeline(n: Long) = Dedup.nearDuplicates(
      spark.read.format("graft-docs")
        .option("rows", n).option("partitions", 32).load(),
      "doc_id", "text", w = 3, k = 16, b = 4, threshold = 0.5)
    pipeline(512).write.format("noop").mode("overwrite").save()
    sizes.foreach { n =>
      val t0 = System.nanoTime()
      val pairs = pipeline(n).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[scale] docs=$n%d pairs=$pairs%d time=$s%.2f s")
    }
    spark.stop()
  }
}
