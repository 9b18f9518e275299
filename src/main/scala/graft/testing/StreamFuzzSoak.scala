package graft.testing

import org.apache.spark.sql.SparkSession

/** Long-horizon StreamFuzz soak runner — the streaming twin of [[FuzzSoak]]
  * (the spec sweeps are the per-commit gate; this main extends the search
  * reproducibly across all three grammars).
  *
  * Usage: runMain graft.testing.StreamFuzzSoak <fromSeed> <toSeed>
  *          [sfDir] [grammar: v1|late|join]
  * Prints one JSON line with the failure count (late mode also reports the
  * drop/kept-late seed shares); exits 1 on any divergence (each diverging
  * seed reproduces via `StreamFuzz.runCase` / `runLateCase` /
  * `runJoinCase`).
  */
object StreamFuzzSoak {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val from = args(0).toLong
    val to = args(1).toLong
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.001"
    val grammar = if (args.length > 3) args(3) else "v1"
    require(Set("v1", "late", "join")(grammar),
      s"grammar must be v1|late|join, got '$grammar'")
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
    var droppedSeeds = 0L
    var keptLateSeeds = 0L
    val t0 = System.nanoTime()
    (from to to).foreach { s =>
      val failure = grammar match {
        case "late" =>
          val o = StreamFuzz.runLateCase(spark, sfDir, s)
          if (o.dropped > 0) droppedSeeds += 1
          if (o.keptLate > 0) keptLateSeeds += 1
          o.failure
        case "join" => StreamFuzz.runJoinCase(spark, sfDir, s)
        case _      => StreamFuzz.runCase(spark, sfDir, s)
      }
      failure.foreach { msg =>
        failures += 1
        System.err.println(s"[stream-soak] seed $s DIVERGED:\n$msg")
      }
      if (s % 50 == 0) {
        val el = (System.nanoTime() - t0) / 1e9
        System.err.println(
          f"[stream-soak] through seed $s ($failures failures, $el%.0f s)")
      }
    }
    val lateStats =
      if (grammar == "late")
        s""","dropped_seeds":$droppedSeeds,"kept_late_seeds":$keptLateSeeds"""
      else ""
    println(s"""{"stream_soak_from":$from,"stream_soak_to":$to,""" +
      s""""grammar":"$grammar","failures":$failures$lateStats}""")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
