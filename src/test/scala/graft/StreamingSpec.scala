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

  test("streaming session windows match the batch session_window result") {
    val batch = util.t(spark, dir, "events")
      .filter(col("user_id") <= 5)
      .select(col("ts"), col("user_id"), col("value"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-sess").toString
    batch.write.mode("overwrite").parquet(tmp)

    val stream = Streams.readParquetStream(spark, tmp, batch.schema)
    val agg = Streams.sessionAgg(stream, "ts", "30 minutes", "2 hours",
      Seq(col("user_id")), Seq(count(lit(1)).as("n")))
    val got = Streams.replayToTable(agg, "sess_agg", outputMode = "complete")
      .select(col("user_id"), col("_session_start"), col("n"))

    val want = batch.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("session_window.start").as("_session_start"), col("n"))

    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("stream-static enrichment join stays broadcast (no stream shuffle)") {
    import spark.implicits._
    val dim = Seq((1L, "gold"), (2L, "base")).toDF("user_id", "tier")
    val batch = util.t(spark, dir, "events")
      .filter(col("user_id") <= 2)
      .select(col("ts"), col("user_id"), col("value"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-enrich").toString
    batch.write.mode("overwrite").parquet(tmp)
    val out = Streams.replayToTable(
      Streams.enrich(Streams.readParquetStream(spark, tmp, batch.schema), dim,
        Seq("user_id")), "enrich_out")
    assert(out.count() == batch.count())
    // only user_id 1 and 2 exist in the dimension; user_id 0 stays null
    assert(out.filter(col("tier").isNotNull).count() ==
      batch.filter(col("user_id").isin(1, 2)).count())
  }

  test("mapGroupsWithState running totals converge to the batch aggregate") {
    val batch = util.t(spark, dir, "events")
      .filter(col("user_id") <= 5)
      .select(col("ts"), col("user_id"), col("value"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-state").toString
    // two files so the stream sees at least two micro-batch-able splits
    batch.repartition(2).write.mode("overwrite").parquet(tmp)

    val stream = Streams.readParquetStream(spark, tmp, batch.schema,
      maxFilesPerTrigger = 1)
    val out = Streams.replayDatasetToTable(
      Streams.runningTotals(stream), "running_out")
    // update mode emits one row per key per trigger: the LAST row per key is
    // the converged state
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("n").desc)
    val finalRows = out.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("n"), round(col("total"), 4).as("total"))

    val want = batch.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total"))

    assert(finalRows.exceptAll(want).isEmpty && want.exceptAll(finalRows).isEmpty)
  }

  test("stream-stream interval join matches the batch interval join") {
    val base = util.t(spark, dir, "events").filter(col("user_id") <= 3)
    val clicks = base.filter(col("event_type") === "click")
      .select(col("ts").as("c_ts"), col("user_id").as("c_uid"),
        col("event_id").as("c_id"))
    val errors = base.filter(col("event_type") === "error")
      .select(col("ts").as("e_ts"), col("user_id").as("e_uid"),
        col("event_id").as("e_id"))
    val d1 = java.nio.file.Files.createTempDirectory("graft-ij1").toString
    val d2 = java.nio.file.Files.createTempDirectory("graft-ij2").toString
    clicks.write.mode("overwrite").parquet(d1)
    errors.write.mode("overwrite").parquet(d2)

    val joined = Streams.intervalJoin(
      Streams.readParquetStream(spark, d1, clicks.schema),
      Streams.readParquetStream(spark, d2, errors.schema),
      "c_ts", "e_ts", "1 hour",
      col("c_uid") === col("e_uid"), "30 minutes", "30 minutes")
    val got = Streams.replayToTable(joined, "ij_out")
      .select(col("c_id"), col("e_id"))

    val want = clicks.join(errors,
      col("c_uid") === col("e_uid") &&
        col("e_ts") >= col("c_ts") - expr("interval 30 minutes") &&
        col("e_ts") <= col("c_ts") + expr("interval 30 minutes"))
      .select(col("c_id"), col("e_id"))

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
