package graft.testing

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** r21 evidence probe: where do the sub-second headline keys spend their
  * wall time at sf0.1 — executor compute, or the scheduling/stage floor?
  *
  * Runs each named query (default: the full headline) once cold + once
  * timed in a warm session with a SparkListener attached, and prints per
  * query: wall seconds, #jobs, #stages, #tasks, summed stage wall
  * (max task window per stage), and summed executor run time. The gap
  * between wall and summed-stage time is driver/AQE scheduling; the gap
  * between stage wall and executorRunTime/32 is task-launch overhead +
  * stragglers.
  *
  * Usage: runMain graft.testing.StageProfileProbe [query ...]
  */
object StageProfileProbe {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val picked = if (args.nonEmpty) args.toSeq else graft.Bench.headline
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.timeType.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var stageWallMs = 0L
    @volatile var execRunMs = 0L
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onJobEnd(j: SparkListenerJobEnd): Unit = ()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
        for (a <- s.stageInfo.completionTime; b <- s.stageInfo.submissionTime)
          stageWallMs += a - b
        execRunMs += s.stageInfo.taskMetrics.executorRunTime
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val rows = mutable.ArrayBuffer[String]()
    picked.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warm
      Thread.sleep(200) // let listener drain
      jobs = 0; stages = 0; tasks = 0; stageWallMs = 0; execRunMs = 0
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // listener is async — drain before reading counters
      rows += f""""$name":{"wall_s":$wall%.3f,"jobs":$jobs,"stages":$stages,"tasks":$tasks,"stage_wall_ms":$stageWallMs,"exec_run_ms":$execRunMs}"""
      graft.text.Dedup.releaseCache()
    }
    println(rows.mkString("{\"metric\":\"stage_profile\",\"queries\":{", ",", s"},\"sf\":\"$sfDir\",\"cpus\":$cpus}"))
    spark.stop()
  }
}
