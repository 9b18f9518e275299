package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Long-run streaming endurance probe (r15 verdict task 7): a ≥10-minute
  * SUSTAINED FileStreamSource run on the RocksDB state backend with a
  * mid-run kill + checkpoint recovery — the three production questions the
  * one-shot throughput probe (StreamThroughputProbe) can't answer:
  *   1. does state stay bounded under a watermark over wall-clock time
  *      (not just 15 micro-batches)?
  *   2. what does recovery from a checkpoint cost mid-stream?
  *   3. does sustained throughput hold the arrival rate with headroom?
  *
  * Layout: `files` parquet files are pre-generated, each one event-minute
  * of data (`rowsPerFile` rows); the stream consumes ONE file per
  * `triggerSec`-second trigger, so the run lasts files × triggerSec
  * wall-seconds at an arrival rate of rowsPerFile/triggerSec rows/s. The
  * shape is the stream_tumble_agg one: watermarked per-minute per-user
  * aggregation — state is bounded by horizon × |users| regardless of run
  * length, which the probe asserts empirically (max numRowsTotal over the
  * second half ≤ 1.2× the max over the first half). Halfway through, the
  * query is stopped cold and restarted from its checkpoint; recovery time
  * is start() → first committed batch.
  *
  * Usage: runMain graft.StreamEnduranceProbe [files=120] [rowsPerFile=1e6]
  *        [triggerSec=5]
  * Defaults: 120 files × 1 M rows / 5 s ≈ 10 min at 200 k rows/s arrival.
  * Prints one JSON line for SCALE.md.
  */
object StreamEnduranceProbe {

  def main(args: Array[String]): Unit = {
    val files = if (args.length > 0) args(0).toInt else 120
    val rowsPerFile = if (args.length > 1) args(1).toDouble.toLong else 1000000L
    val triggerSec = if (args.length > 2) args(2).toInt else 5
    val spark = BenchSession.build()
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    val root = "/tmp/graft_endurance"
    val dataDir = s"$root/in"
    val ckpt = s"$root/ckpt"
    val fs = org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)

    // one parquet file per event-minute: ts spans minute i, 100k users,
    // text payload so the agg does real work per row
    println(s"[endurance] generating $files files x $rowsPerFile rows")
    val t0gen = System.nanoTime()
    (0 until files).foreach { i =>
      spark.range(rowsPerFile).select(
        timestamp_millis(lit(1700000000000L) + lit(i * 60000L) +
          expr(s"id * 60000 div $rowsPerFile")).as("ts"),
        (col("id") % 100000).as("user_id"),
        concat(lit("doc "), col("id") % 97,
          lit(" body text with tokens "), col("id")).as("text"))
        .coalesce(4)
        .write.mode("overwrite").parquet(f"$dataDir/minute_$i%04d")
    }
    // FileStreamSource consumes FILES; glob the part files across subdirs
    val schema = spark.read.parquet(s"$dataDir/minute_0000").schema
    println(f"[endurance] generated in ${(System.nanoTime() - t0gen) / 1e9}%.0f s")

    def shape(df: DataFrame): DataFrame = df
      .withWatermark("ts", "2 minutes")
      .groupBy(window(col("ts"), "1 minute"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(length(col("text"))).as("bytes"))

    // maxFilesPerTrigger counts PART files: 4 per minute-dir → one
    // event-minute per trigger
    def start() = shape(spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(s"$dataDir/minute_*"))
      .writeStream.format("noop").outputMode("update")
      .trigger(Trigger.ProcessingTime(triggerSec * 1000L))
      .option("checkpointLocation", ckpt)
      .start()

    final case class Obs(batch: Long, rows: Long, execMs: Long,
                         stateRows: Long, stateBytes: Long)
    // recentProgress retains only the last ~100 updates
    // (spark.sql.streaming.numRecentProgressUpdates), so a single snapshot
    // at the end of a half silently DROPS early batches once
    // files/2 + empty-trigger tail exceeds that window (any run with
    // files > ~160, or a short triggerSec against the 2 s poll). The wait
    // loops below therefore accumulate each poll's snapshot merged by
    // batchId — no retention bound can lose a batch that survived one
    // 2 s poll window, and the stats never silently exclude the start of
    // a half. (ADVICE r16 low item, closed r17.)
    def observe(q: org.apache.spark.sql.streaming.StreamingQuery): Seq[Obs] =
      q.recentProgress.toSeq.filter(_.numInputRows > 0).map { p =>
        val so = p.stateOperators.headOption
        Obs(p.batchId, p.numInputRows,
          p.durationMs.get("triggerExecution"),
          so.map(_.numRowsTotal).getOrElse(0L),
          so.map(_.memoryUsedBytes).getOrElse(0L))
      }

    val halfMs = files.toLong * triggerSec * 1000L / 2
    val q1 = start()
    val t0 = System.nanoTime()
    var obs1 = Seq.empty[Obs]
    while ((System.nanoTime() - t0) / 1e6 < halfMs) {
      Thread.sleep(2000)
      if (q1.exception.isDefined) throw q1.exception.get
      obs1 = (obs1 ++ observe(q1)).distinctBy(_.batch)
    }
    obs1 = (obs1 ++ observe(q1)).distinctBy(_.batch).sortBy(_.batch)
    // cold kill: stop() without waiting for the in-flight batch
    q1.stop()
    println(s"[endurance] first half: ${obs1.size} batches; killed mid-run")

    // recovery: start() → first committed batch from the SAME checkpoint
    val tRec0 = System.nanoTime()
    val q2 = start()
    var recovered = Seq.empty[Obs]
    while (recovered.isEmpty) {
      Thread.sleep(250)
      if (q2.exception.isDefined) throw q2.exception.get
      recovered = observe(q2)
    }
    val recoverySec = (System.nanoTime() - tRec0) / 1e9

    // run out the remaining files (plus watermark tail), observing state
    var obs2 = recovered.distinctBy(_.batch)
    val tEnd = System.nanoTime()
    var idle = 0
    while (idle < 6 && (System.nanoTime() - tEnd) / 1e9 < files * triggerSec) {
      Thread.sleep(2000)
      if (q2.exception.isDefined) throw q2.exception.get
      val merged = (obs2 ++ observe(q2)).distinctBy(_.batch)
      if (merged.size == obs2.size) idle += 1
      else idle = 0
      obs2 = merged
    }
    q2.stop()
    obs2 = obs2.sortBy(_.batch)

    val all = (obs1 ++ obs2).distinctBy(_.batch).sortBy(_.batch)
    val steady = all.drop(2)
    val rows = steady.map(_.rows).sum
    val execS = steady.map(_.execMs).sum / 1000.0
    val wallS = (System.nanoTime() - t0) / 1e9
    val maxState1 = if (obs1.size > 2) obs1.drop(2).map(_.stateRows).max else 0L
    val maxState2 = if (obs2.nonEmpty) obs2.map(_.stateRows).max else 0L
    val maxBytes = all.map(_.stateBytes).max
    println(f"""{"metric":"stream_endurance","files":$files,"rows_per_file":$rowsPerFile,""" +
      f""""arrival_rows_per_sec":${rowsPerFile.toDouble / triggerSec}%.0f,""" +
      f""""processed_rows_per_sec":${rows / execS}%.0f,""" +
      f""""busy_fraction":${execS / wallS}%.3f,""" +
      f""""batches":${all.size},"wall_sec":$wallS%.0f,""" +
      f""""recovery_sec":$recoverySec%.2f,""" +
      f""""max_state_rows_first_half":$maxState1,"max_state_rows_second_half":$maxState2,""" +
      f""""max_state_bytes":$maxBytes}""")
    require(maxState2 <= math.max(maxState1, 1L) * 12 / 10,
      s"state grew past the watermark bound: $maxState1 -> $maxState2")
    spark.stop()
  }
}
