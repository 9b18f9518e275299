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

  test("mapGroupsWithState EventTimeTimeout: watermark fires the timeout, state resets") {
    // The one stateful surface the fuzz grammars don't reach: event-time
    // TIMEOUTS. Timeline (delay 31m; timeout = group max ts + 10m):
    //   b0: A@10:00, A@10:02 (A: n=2, timeout 10:12), D@10:50 (timeout
    //       11:00)                                  -> wm(b1) = 10:19:00
    //   b1: D@11:10 (D: n=2, timeout 11:20); wm 10:19 > A's 10:12 fires
    //       A's timeout -> (A, 2, timeout), state removed -> wm(b2) = 10:39
    //   b2: A@10:52 — fresh (not late), and A's state must be GONE: the
    //       fold restarts at n=1. Final wm stays 10:39 < every live
    //       timeout, so nothing else fires.
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val files = Seq(
      Seq((ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 10:02:00"), 1L),
          (ts("2024-01-01 10:50:00"), 4L)),
      Seq((ts("2024-01-01 11:10:00"), 4L)),
      Seq((ts("2024-01-01 10:52:00"), 1L)))
    val out = java.nio.file.Files.createTempDirectory("graft-mgs-timeout")
    try {
    files.zipWithIndex.foreach { case (rows, i) =>
      val tmp = java.nio.file.Files.createTempDirectory("graft-mgs-part")
      rows.toDF("ts", "k").coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val src = tmp.toFile.listFiles()
        .filter(_.getName.endsWith(".parquet")).head.toPath
      val dst = out.resolve(f"chunk_$i%04d.parquet")
      java.nio.file.Files.move(src, dst,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 60000L))
      graft.testing.StreamFuzz.deleteRec(tmp)
    }
    val schema = Seq((ts("2024-01-01 00:00:00"), 1L)).toDF("ts", "k").schema
    val stream = Streams.readParquetStream(spark, out.toString, schema,
      maxFilesPerTrigger = 1)
      .withWatermark("ts", "31 minutes")
    val folded = stream.as[(java.sql.Timestamp, Long)]
      .groupByKey(_._2)
      .mapGroupsWithState(
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rows: Iterator[(java.sql.Timestamp, Long)],
         st: org.apache.spark.sql.streaming.GroupState[Long]) =>
          if (st.hasTimedOut) {
            val n = st.get
            st.remove()
            (key, n, "timeout")
          } else {
            val batch = rows.toSeq
            val n = st.getOption.getOrElse(0L) + batch.size
            st.update(n)
            st.setTimeoutTimestamp(
              batch.map(_._1.getTime).max + 10L * 60000L)
            (key, n, "update")
          }
      }
    val got = Streams.replayDatasetToTable(folded, "mgs_timeout",
      outputMode = "update")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == Set(
      (1L, 2L, "update"),   // b0: A folds both rows
      (4L, 1L, "update"),   // b0: D
      (4L, 2L, "update"),   // b1: D folds its second row
      (1L, 2L, "timeout"),  // b1: watermark 10:19 passes A's 10:12
      (1L, 1L, "update")),  // b2: A restarts from empty state
      s"unexpected timeout/update sequence: $got")
    } finally graft.testing.StreamFuzz.deleteRec(out)
  }

  test("append-mode sessions RE-OPEN on a kept late row (why no batch oracle)") {
    // Pins the asymmetry that keeps session·append OUT of the late-data
    // fuzz grammar (StreamFuzz scaladoc): once a session is emitted, a
    // late row that survives the proto-end filter (ts+gap > previous
    // watermark) but overlaps the emitted interval starts a NEW session —
    // the emitted multiset is a function of ARRIVAL ORDER, so no batch
    // frame can be its oracle. Timeline (gap 5m, delay 31m):
    //   b0: A=10:00:00, driver 10:37:10          -> wm(b1) = 10:06:10
    //   b1: driver 10:50:10 — eviction with wm(b1) emits A's session
    //       [10:00,10:05) n=1                    -> wm(b2) = 10:19:10
    //   b2: L=10:04:00 — late (raw ts behind both watermarks) but kept
    //       (proto end 10:09 > thr = wm(b1) = 10:06:10); it overlaps the
    //       EMITTED session yet cannot rejoin it; driver 10:55:10
    //       -> final wm 10:24:10 emits L's session [10:04,10:09) n=1.
    // A batch session_window over the kept rows would merge A and L into
    // ONE session [10:00,10:09) n=2 — the stream instead emits two
    // overlapping sessions.
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val files = Seq(
      Seq((ts("2024-01-01 10:00:00"), "A", 1L), (ts("2024-01-01 10:37:10"), "d0", 1L)),
      Seq((ts("2024-01-01 10:50:10"), "d1", 1L)),
      Seq((ts("2024-01-01 10:04:00"), "L", 1L), (ts("2024-01-01 10:55:10"), "d2", 1L)))
    val out = java.nio.file.Files.createTempDirectory("graft-sess-reopen")
    try {
    files.zipWithIndex.foreach { case (rows, i) =>
      val tmp = java.nio.file.Files.createTempDirectory("graft-sess-part")
      rows.toDF("ts", "k", "v").coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val src = tmp.toFile.listFiles()
        .filter(_.getName.endsWith(".parquet")).head.toPath
      val dst = out.resolve(f"chunk_$i%04d.parquet")
      java.nio.file.Files.move(src, dst,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 60000L))
      graft.testing.StreamFuzz.deleteRec(tmp)
    }
    val schema = Seq((ts("2024-01-01 00:00:00"), "x", 1L))
      .toDF("ts", "k", "v").schema
    val stream = Streams.readParquetStream(spark, out.toString, schema,
      maxFilesPerTrigger = 1)
    val agg = Streams.sessionAgg(stream, "ts", "5 minutes", "31 minutes",
      Seq(col("v")), Seq(count(lit(1)).as("n"), collect_set(col("k")).as("ks")))
    val got = Streams.replayToTable(agg, "sess_reopen", outputMode = "append")
      .select(col("_session_start"), col("_session_end"), col("n"),
        array_join(col("ks"), ",").as("ks"))
      .collect().map(r => (r.getTimestamp(0).toString, r.getTimestamp(1).toString,
        r.getLong(2), r.getString(3))).toSet
    assert(got == Set(
      ("2024-01-01 10:00:00.0", "2024-01-01 10:05:00.0", 1L, "A"),
      ("2024-01-01 10:04:00.0", "2024-01-01 10:09:00.0", 1L, "L")),
      s"expected two OVERLAPPING single-row sessions, got $got")
    } finally graft.testing.StreamFuzz.deleteRec(out)
  }
}
