package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.{Dsir, QualityClassifier, TextAnalysis}

/** Measures the r12 featurize rewrite: sparse one-pass RLE vs the old
  * dense per-bucket re-filter (O(buckets·n_tok) md5 calls per row), at
  * hashed-BoW widths where the asymptotic difference is visible.
  *
  * Usage: runMain graft.FeaturizeProbe <sfDir> [buckets=1024]
  */
object FeaturizeProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val buckets = if (args.length > 1) args(1).toInt else 1024
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      // force every feature value: fold the array/entries to one double
      val s = mk.agg(sum(col("__chk"))).head.getDouble(0)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$label%-8s buckets=$buckets  $dt%8.2f s  (chk=$s%.3f)")
      dt
    }

    val tDense = time("dense") {
      val toks = TextAnalysis.tokens(col("text"))
      val nTok = size(toks)
      val xs = transform(sequence(lit(0), lit(buckets - 1)), b =>
        size(filter(toks, t =>
          Dsir.bucketOf(t, buckets) === b.cast("long"))).cast("double") /
          nTok.cast("double"))
      docs.withColumn("n_tok", nTok).filter(col("n_tok") > 0)
        .select(aggregate(xs, lit(0.0), (a, x) => a + x).as("__chk"))
    }
    val tSparse = time("sparse") {
      QualityClassifier.featurize(docs, "text", buckets)
        // exclude the bias entry so both checksums sum the same values
        .select(aggregate(filter(col("__xs"),
            e => e("b") < buckets.toLong),
          lit(0.0), (a, e) => a + e("v")).as("__chk"))
    }
    println(f"""{"buckets":$buckets,"dense_s":$tDense%.2f,"sparse_s":$tSparse%.2f,"speedup":${tDense / tSparse}%.1f}""")
    spark.stop()
  }
}
