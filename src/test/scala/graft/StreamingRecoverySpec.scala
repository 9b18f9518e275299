package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.streaming.{KeyRunning, Streams}

/** Checkpoint recovery: the six stream_* oracle keys replay to completion
  * in one run; these specs prove streaming STATE survives a genuine
  * stop/restart — a new query object resumes from checkpointLocation with
  * the source offsets, the watermark, and the state store intact, for a
  * watermarked tumbling aggregation and for mapGroupsWithState. */
class StreamingRecoverySpec extends SparkSpec {

  /** Drop one parquet file into the stream input dir (a new file = a new
    * micro-batch for the file source). */
  private def addPart(df: DataFrame, inDir: String, name: String): Unit = {
    val staging = Files.createTempDirectory("graft-ckpt-stage").toString
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    val part = new java.io.File(staging).listFiles()
      .find(f => f.getName.endsWith(".parquet")).get
    Files.copy(part.toPath, Paths.get(inDir, name),
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("tumbling agg: open-window state survives a stop/restart") {
    import spark.implicits._
    val part1 = Seq(
      (ts("2024-01-01 00:05:00"), 1.0),
      (ts("2024-01-01 00:15:00"), 2.0),
      (ts("2024-01-01 00:25:00"), 4.0)).toDF("ts", "value")
    val part2 = Seq(
      (ts("2024-01-01 00:35:00"), 8.0),
      (ts("2024-01-01 01:10:00"), 16.0)).toDF("ts", "value")
    // far-future sentinel: advances the watermark past every real window
    // so append mode flushes them; its own window stays open and unemitted
    val sentinel = Seq((ts("2024-01-02 00:00:00"), 0.0)).toDF("ts", "value")

    val in = Files.createTempDirectory("graft-ckpt-in").toString
    val chk = Files.createTempDirectory("graft-ckpt-chk").toString
    val out = Files.createTempDirectory("graft-ckpt-out").toString + "/sink"

    def start() = {
      val stream = Streams.readParquetStream(spark, in, part1.schema,
        maxFilesPerTrigger = 1, basePath = Some(in))
      Streams.windowedAgg(stream, "ts", "10 minutes", "0 seconds",
          Seq(count(lit(1)).as("n"), sum(col("value")).as("s")))
        .select(col("_window_start"), col("n"), col("s"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", chk)
        .outputMode("append").start()
    }

    addPart(part1, in, "p1.parquet")
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    val after1 = spark.read.parquet(out).count()

    addPart(part2, in, "p2.parquet")
    addPart(sentinel, in, "p3.parquet")
    val q2 = start(); q2.processAllAvailable(); q2.stop()

    val got = spark.read.parquet(out)
    val want = part1.unionAll(part2)
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("s"))
      .select(col("window.start").as("_window_start"), col("n"), col("s"))
    // identical final table across the restart — watermark, offsets, and
    // window state all came back from the checkpoint
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      s"got ${got.collect().toSeq} want ${want.collect().toSeq}")
    // exactly-once across the restart: no window emitted twice
    assert(got.count() == got.dropDuplicates("_window_start").count())
    // and some windows only became emittable AFTER the restart, so open
    // state genuinely crossed the checkpoint boundary
    assert(after1 < got.count(),
      s"restart emitted nothing new (before=$after1, after=${got.count()})")
  }

  test("mapGroupsWithState: per-key totals include pre-restart rows") {
    import spark.implicits._
    val part1 = Seq((1L, 1.0), (1L, 2.0), (2L, 10.0)).toDF("user_id", "value")
    val part2 = Seq((1L, 4.0), (3L, 5.0)).toDF("user_id", "value")

    val in = Files.createTempDirectory("graft-mgs-in").toString
    val chk = Files.createTempDirectory("graft-mgs-chk").toString
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Double)]()

    def start() = {
      val stream = Streams.readParquetStream(spark, in, part1.schema,
        maxFilesPerTrigger = 1, basePath = Some(in))
      Streams.runningTotals(stream)
        .writeStream.outputMode("update")
        .option("checkpointLocation", chk)
        .foreachBatch { (batch: Dataset[KeyRunning], _: Long) =>
          batch.collect().foreach(k => buf.add((k.user_id, k.n, k.total)))
        }
        .start()
    }

    addPart(part1, in, "p1.parquet")
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    import scala.jdk.CollectionConverters._
    assert(buf.asScala.toSet == Set((1L, 2L, 3.0), (2L, 1L, 10.0)))

    buf.clear()
    addPart(part2, in, "p2.parquet")
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    // user 1's count/total continue from the checkpointed state (2 rows,
    // 3.0) — not from zero — and the untouched user 2 is not re-emitted
    assert(buf.asScala.toSet == Set((1L, 3L, 7.0), (3L, 1L, 5.0)),
      s"state did not survive the restart: ${buf.asScala.toSet}")
  }
}
