package graft.testing

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.text.Dedup

/** r21 evidence probe: is the `cached` verify's corpus-shingle persist
  * worth its build cost on a SMALL input, versus simply recomputing the
  * shingle projection on the verify side (no persist, no extra jobs, one
  * action — "recompute")? The bench releases caches between passes since
  * r21, so every headline dedup pass pays the cache BUILD; if recompute
  * beats cached at bench scale the auto strategy should prefer it there.
  *
  * Times three result-identical pipelines on the given sf dir
  * (interleaved, min/median over `passes`):
  *   cached    — Dedup.nearDuplicates(verify="cached"), cache released
  *               after every timed run (the r21 bench regime)
  *   rescan    — verify="rescan" (pairs persist + count job + semi-joins)
  *   recompute — candidate pairs + verify joins against a freshly
  *               computed shingle projection, no persist anywhere
  *
  * Usage: runMain graft.testing.DedupVerifyProbe [sfDir] [passes]
  */
object DedupVerifyProbe {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val passes = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val par = spark.sparkContext.defaultParallelism

    def docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def cached: DataFrame =
      Dedup.nearDuplicates(docs, "doc_id", "text", w = 3, k = 4, b = 2,
        threshold = 0.5, parallelism = par, verify = "cached")
    def rescan: DataFrame =
      Dedup.nearDuplicates(docs, "doc_id", "text", w = 3, k = 4, b = 2,
        threshold = 0.5, parallelism = par, verify = "rescan")
    // recompute: same pipeline, shingle projection recomputed on the
    // verify side instead of persisted (public pieces only)
    def recompute: DataFrame = {
      def sh = docs.repartition(par)
        .select(col("doc_id").as("__id"),
          array_distinct(Dedup.shingles(col("text"), 3)).as("__sh"))
      val cands = Dedup.minhashCandidates(docs, "doc_id", "text",
        w = 3, k = 4, b = 2, parallelism = par)
      val inter = size(array_intersect(col("__sha"), col("__shb"))).cast("double")
      val uni = (size(col("__sha")) + size(col("__shb"))).cast("double") - inter
      cands
        .join(sh.select(col("__id").as("id_a"), col("__sh").as("__sha")), Seq("id_a"))
        .join(sh.select(col("__id").as("id_b"), col("__sh").as("__shb")), Seq("id_b"))
        .withColumn("jaccard", round(when(uni > 0, inter / uni).otherwise(0.0), 4))
        .filter(col("jaccard") >= 0.5)
        .select("id_a", "id_b", "jaccard")
    }

    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      Dedup.releaseCache()
      dt
    }
    time(cached); time(rescan); time(recompute) // warm all paths
    val triples = (1 to passes).map { i =>
      spark.sparkContext.setJobDescription(s"dedup-verify cached pass $i")
      val a = time(cached)
      spark.sparkContext.setJobDescription(s"dedup-verify rescan pass $i")
      val b = time(rescan)
      spark.sparkContext.setJobDescription(s"dedup-verify recompute pass $i")
      val c = time(recompute)
      (a, b, c)
    }
    def mm(v: Seq[Double]) = { val s = v.sorted; (s.head, s(s.size / 2)) }
    val ((aMin, aMed), (bMin, bMed), (cMin, cMed)) =
      (mm(triples.map(_._1)), mm(triples.map(_._2)), mm(triples.map(_._3)))
    println(f"""{"metric":"dedup_verify_probe","sf":"$sfDir","passes":$passes,"cached":{"min":$aMin%.3f,"median":$aMed%.3f},"rescan":{"min":$bMin%.3f,"median":$bMed%.3f},"recompute":{"min":$cMin%.3f,"median":$cMed%.3f}}""")
    spark.stop()
  }
}
