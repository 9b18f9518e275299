package graft

import org.apache.spark.sql.functions._
import graft.streaming.Streams
import graft.queries.util

class StreamingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("streaming windowed agg over events matches the batch result") {
    // batch events (ns-normalized) re-written as µs parquet for the stream
    val batch = util.t(spark, dir, "events")
      .select(col("ts"), col("event_type"), col("value"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream").toString
    batch.write.mode("overwrite").parquet(tmp)

    val stream = Streams.readParquetStream(spark, tmp, batch.schema)
    val agg = Streams.windowedAgg(stream, "ts", "1 hour", "2 hours",
      Seq(count(lit(1)).as("n"), sum(col("value")).as("s")))
    // complete mode: append would withhold the final (un-watermarked) window
    val got = Streams.replayToTable(agg, "win_agg", outputMode = "complete")
      .select(col("_window_start"), col("n"), round(col("s"), 4).as("s"))

    val want = batch.groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("s"))
      .select(col("window.start").as("_window_start"), col("n"), col("s"))

    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("streaming dedup drops re-delivered rows") {
    import spark.implicits._
    val rows = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L),
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L), // dup
      (java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), 2L))
      .toDF("ts", "k")
    val tmp = java.nio.file.Files.createTempDirectory("graft-dedup").toString
    rows.write.mode("overwrite").parquet(tmp)
    val out = Streams.replayToTable(
      Streams.dedupStream(Streams.readParquetStream(spark, tmp, rows.schema),
        "ts", "1 hour", Seq("k")), "dedup_out")
    assert(out.count() == 2)
  }
}
