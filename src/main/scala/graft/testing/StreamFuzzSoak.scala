package graft.testing

import org.apache.spark.sql.SparkSession

/** Long-horizon StreamFuzz soak runner — the streaming twin of [[FuzzSoak]]
  * (the 220-seed spec sweep is the per-commit gate; this main extends the
  * search reproducibly).
  *
  * Usage: runMain graft.testing.StreamFuzzSoak <fromSeed> <toSeed> [sfDir]
  * Prints one JSON line with the failure count; exits 1 on any divergence
  * (each diverging seed reproduces via
  * `StreamFuzz.runCase(spark, sfDir, seed)`).
  */
object StreamFuzzSoak {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val from = args(0).toLong
    val to = args(1).toLong
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    var failures = 0L
    val t0 = System.nanoTime()
    (from to to).foreach { s =>
      StreamFuzz.runCase(spark, sfDir, s) match {
        case Some(msg) =>
          failures += 1
          System.err.println(s"[stream-soak] seed $s DIVERGED:\n$msg")
        case None => ()
      }
      if (s % 50 == 0) {
        val el = (System.nanoTime() - t0) / 1e9
        System.err.println(
          f"[stream-soak] through seed $s ($failures failures, $el%.0f s)")
      }
    }
    println(s"""{"stream_soak_from":$from,"stream_soak_to":$to,"failures":$failures}""")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
