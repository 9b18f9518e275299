package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicLong

/** Spill-regime probe (not part of the library; r12 verdict task 3): runs
  * the heaviest headline queries under a CONSTRAINED executor heap
  * (SPARK_DRIVER_MEM, default 8g via build.sbt) at a large SF and reports
  * wall time plus the actual external-sort/shuffle spill volumes from
  * TaskMetrics — evidence that the operators complete correctly when the
  * working set exceeds RAM, which is the normal state at 100 TB (the
  * reference's own out-of-core story is crates/polars-ooc/src/lib.rs:27;
  * here Spark's UnsafeExternalSorter/ShuffleExternalSorter supply it).
  *
  * Usage: SPARK_DRIVER_MEM=4g SPARK_GRAFT_SF_DIR=/tmp/graft_sf100 \
  *          sbt "runMain graft.SpillProbe dedup_near_pairs join_inner win_rank"
  */
object SpillProbe {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
                else Seq("dedup_near_pairs", "join_inner", "win_rank")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val heap = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    println(s"[spill] heap=${heap}MB sf=$sfDir")

    val memSpill = new AtomicLong(0L)
    val diskSpill = new AtomicLong(0L)
    val shuffleWrite = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          memSpill.addAndGet(m.memoryBytesSpilled)
          diskSpill.addAndGet(m.diskBytesSpilled)
          shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })

    names.foreach { name =>
      memSpill.set(0); diskSpill.set(0); shuffleWrite.set(0)
      val t0 = System.nanoTime()
      val outcome =
        try {
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          "ok"
        } catch { case e: Throwable => s"ERR ${e.getClass.getSimpleName}: ${e.getMessage.take(120)}" }
      val s = (System.nanoTime() - t0) / 1e9
      // listener events are posted async; give the bus a moment to drain
      // (SparkContext.listenerBus.waitUntilEmpty is private[spark])
      Thread.sleep(2000)
      def gb(b: Long) = b / 1e9
      println(f"[spill] $name%-18s $s%8.2f s  memSpill=${gb(memSpill.get)}%.2f GB" +
        f"  diskSpill=${gb(diskSpill.get)}%.2f GB  shufWrite=${gb(shuffleWrite.get)}%.2f GB  $outcome")
    }
    spark.stop()
  }
}
