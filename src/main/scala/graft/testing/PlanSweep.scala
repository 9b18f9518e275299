package graft.testing

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Plan-shape sweep over the WHOLE declared-query inventory (r21 opt round):
  * plans every SparkEntry key (no execution) and emits one CSV row per key
  * with the red-flag counts the optimization guide says to look for —
  * Exchange count, join strategies (CartesianProduct / BroadcastNestedLoop
  * flagged), scans whose ReadSchema is wider than 12 columns, scans with a
  * Filter directly above but no PushedFilters, and interpreted (non-codegen)
  * eval markers. The checklist in OPTIMIZATION_r21.md is generated from this
  * sweep.
  *
  * Usage: runMain graft.testing.PlanSweep <outCsv> [sfDir]
  * Keys whose very CONSTRUCTION executes jobs (stream_* run a streaming
  * query to produce their result frame) are skipped — their plans are
  * pinned by the streaming specs instead.
  */
object PlanSweep {
  def main(args: Array[String]): Unit = {
    val outCsv = if (args.length > 0) args(0) else "/tmp/plan_sweep.csv"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.timeType.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sb = new StringBuilder(
      "key,exchanges,sorts,smj,bhj,shj,bnlj,cartesian,generate,window," +
        "inmemory,unpushed_scan_filters,wide_scans,err\n")
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.startsWith("stream_"))
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.executedPlan.toString
        val lines = plan.linesIterator.toSeq
        def c(p: String) = lines.count(_.contains(p))
        // scans that push nothing while the plan filters somewhere —
        // candidate missed pushdowns, reviewed by hand from the CSV.
        // ADVICE r21: count Filter OPERATORS, not lines containing the
        // substring "Filter" (every scan line carries "PushedFilters: ...",
        // which made the old guard always-true).
        val scans = c("FileScan parquet")
        val pushedScans = lines.count(l =>
          l.contains("PushedFilters: [") && !l.contains("PushedFilters: []"))
        val filterOps = lines.count(
          _.matches("""\s*(?:[+:]- )?(?:\*\(\d+\) )?Filter .*"""))
        val unpushed =
          if (filterOps > 0 && scans > 0) scans - pushedScans else 0
        val wideScans = lines.count { l =>
          l.contains("ReadSchema: struct<") &&
            l.substring(l.indexOf("ReadSchema")).count(_ == ',') >= 12
        }
        sb.append(s"$name,${c("Exchange")},${c("Sort ")},${c("SortMergeJoin")}," +
          s"${c("BroadcastHashJoin")},${c("ShuffledHashJoin")}," +
          s"${c("BroadcastNestedLoopJoin")},${c("CartesianProduct")}," +
          s"${c("Generate")},${c("Window")},${c("InMemoryRelation")}," +
          s"$unpushed,$wideScans,\n")
      } catch {
        case e: Throwable =>
          sb.append(s"$name,,,,,,,,,,,,,${e.getClass.getSimpleName}\n")
      }
    }
    Files.write(Paths.get(outCsv), sb.toString.getBytes(StandardCharsets.UTF_8))
    println(s"[plansweep] wrote $outCsv (${names.size} keys)")
    spark.stop()
  }
}
