package graft.testing

import org.apache.spark.sql.SparkSession

/** Long-horizon PlanFuzz soak runner (the 10k/20k-seed sweeps recorded in
  * SURVEY §2.14 previously ran ad hoc; this main makes them reproducible).
  *
  * Usage: runMain graft.testing.FuzzSoak <fromSeed> <toSeed> [cpus]
  * Prints one JSON line with the failure count; exits 1 on any divergence
  * (each diverging seed reproduces via `PlanFuzz.runCase(spark, seed)`).
  */
object FuzzSoak {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val from = args(0).toLong
    val to = args(1).toLong
    val cpus = if (args.length > 2) args(2) else
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.timeType.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    var failures = 0L
    val t0 = System.nanoTime()
    (from to to).foreach { s =>
      PlanFuzz.runCase(spark, s) match {
        case Some(msg) =>
          failures += 1
          System.err.println(s"[soak] seed $s DIVERGED:\n$msg")
        case None => ()
      }
      if (s % 500 == 0) {
        val el = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[soak] through seed $s ($failures failures, $el%.0f s)")
      }
    }
    println(s"""{"soak_from":$from,"soak_to":$to,"failures":$failures}""")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
