package graft.testing

import org.apache.spark.sql.SparkSession

/** Long-horizon soak driver for [[PlanFuzz]]: sweeps an arbitrary seed
  * range beyond the 240 seeds pinned in PlanFuzzSpec, printing every
  * divergence with its reproducing seed. The spec's seeds gate the suite;
  * this main is how a round hunts NEW divergences cheaply (thousands of
  * seeds in one JVM) before promoting interesting ones into the spec.
  *
  * Usage: runMain graft.testing.PlanFuzzSoak [fromSeed=241] [toSeed=1000]
  */
object PlanFuzzSoak {
  def main(args: Array[String]): Unit = {
    val from = if (args.length > 0) args(0).toLong else 241L
    val to = if (args.length > 1) args(1).toLong else 1000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var failures = 0
    (from to to).foreach { seed =>
      try {
        PlanFuzz.runCase(spark, seed).foreach { diag =>
          failures += 1
          println(s"[fuzz-soak] DIVERGED\n$diag")
        }
      } catch {
        case e: Throwable =>
          failures += 1
          println(s"[fuzz-soak] seed=$seed THREW: ${e.getMessage}")
      }
      if (seed % 100 == 0) println(s"[fuzz-soak] ...$seed done, $failures failures")
    }
    println(s"""{"metric":"fuzz_soak","from":$from,"to":$to,"failures":$failures}""")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
