package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — driver runs this per-round on sf0.1 (BENCH_r{N}.json).
  * Prints ONE JSON line: {"metric":"total","value":N,"unit":"sec",
  * "queries":{name:sec,...},"sf":dir}.
  *
  * Each headline query is forced through the `noop` sink so the full plan
  * executes (a bare count() would let Catalyst prune projections).
  */
object Bench {

  /** Representative slice of the battery: scan+agg, shuffles, joins, windows,
    * asof, dedup/LSH, similarity, text scoring, explode, top-k. */
  val headline: Seq[String] = Seq(
    "agg_tpch_q1", "agg_sum_two_keys", "agg_count_distinct", "agg_dynamic_1h",
    "join_inner", "join_left_agg", "join_star", "join_asof_backward",
    "win_rank", "win_rolling_time", "topk_global", "explode_words",
    "text_quality", "dedup_near_pairs", "sim_bruteforce_topk")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // one warm-up action so JIT/classloading doesn't bill the first query
    SparkEntry.queries("agg_sum_two_keys")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()

    val results = headline.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}") }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
