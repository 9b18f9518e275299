package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Measured streaming throughput for SCALE.md's streaming section — the one
  * operator family whose scale story was design-only until round 14.
  *
  * Drives the SAME shapes the oracle-pinned `stream_*` keys use (stateless
  * curation filter, watermarked tumbling aggregation, watermark-bounded
  * dedup) from Spark's `rate-micro-batch` source (deterministic
  * rows-per-batch, so runs are comparable) and reports the steady-state
  * processedRowsPerSecond from StreamingQueryProgress — the number a
  * capacity plan divides arrival rate by. The reference's streaming engine
  * is pipelined batch (no event time); these are strictly stronger
  * semantics on the Spark side, so a ≥reference-throughput result here
  * closes the streaming perf question in kind.
  *
  * Usage: runMain graft.StreamThroughputProbe [rowsPerBatch] [batches]
  */
object StreamThroughputProbe {
  def main(args: Array[String]): Unit = {
    val rowsPerBatch = if (args.length > 0) args(0).toDouble.toLong else 2000000L
    val batches = if (args.length > 1) args(1).toInt else 15
    // recentProgress retains only the last ~100 updates (the wait loop
    // would spin forever past that), and the steady-state window drops 2
    // warm-up batches (fewer than 3 total would measure nothing)
    require(batches >= 3 && batches <= 95,
      s"batches must be in [3, 95], got $batches")
    val cpus = BenchSession.cpus
    val spark = BenchSession.build()
    // SPARK_GRAFT_STATE_STORE=rocksdb measures the production state
    // backend (what a real cluster runs) against the default in-memory
    // HDFS-backed provider — the stateful shapes' cost is the state-store
    // read-modify-write, so the backend choice IS the throughput knob.
    if (sys.env.get("SPARK_GRAFT_STATE_STORE").contains("rocksdb"))
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    // rate-micro-batch emits exactly rowsPerBatch rows per trigger with a
    // monotonically increasing `value` and a synthetic `timestamp` — event
    // time advances deterministically, so watermarks close windows on a
    // fixed schedule and every run processes identical data.
    def src(): DataFrame = spark.readStream
      .format("rate-micro-batch")
      .option("rowsPerBatch", rowsPerBatch)
      .option("numPartitions", cpus)
      .option("advanceMillisPerBatch", 60000) // 1 event-minute per batch
      .load()
      .select(col("timestamp").as("ts"), col("value"),
        (col("value") % 1000).as("user_id"),
        concat(lit("doc "), col("value") % 97,
          lit(" body text with tokens "), col("value")).as("text"))

    val shapes: Seq[(String, DataFrame => DataFrame)] = Seq(
      // stateless curation filter: the batch quality expression as a stream
      // filter — no state store; throughput = scan+codegen rate
      "stateless_filter" -> (df => df
        .filter(length(col("text")) > 20 && col("user_id") % 7 =!= 0)
        .select(col("value"), (length(col("text")) * 31 + col("user_id"))
          .as("score"))),
      // watermarked tumbling agg: per-minute per-user counts, 2-min horizon
      // → state bounded by horizon × |users|, the stream_tumble_agg shape
      "tumbling_agg" -> (df => df
        .withWatermark("ts", "2 minutes")
        .groupBy(window(col("ts"), "1 minute"), col("user_id"))
        .agg(count(lit(1)).as("n"), sum(length(col("text"))).as("bytes"))),
      // watermark-bounded dedup: the stream_dedup shape — state holds only
      // keys inside the horizon
      "dedup" -> (df => df
        .withWatermark("ts", "2 minutes")
        .dropDuplicates("user_id", "ts"))
    )

    shapes.foreach { case (name, shape) =>
      // fresh checkpoint per run — a stale one would replay old offsets
      val ckpt = s"/tmp/graft_stp/$name"
      org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(ckpt), true)
      val q = shape(src()).writeStream
        .format("noop")
        .outputMode(if (name == "tumbling_agg") "update" else "append")
        .trigger(Trigger.ProcessingTime(0))
        .option("checkpointLocation", ckpt)
        .start()
      // wait for `batches` micro-batches, then read steady-state progress
      var seen = 0
      while (seen < batches) {
        Thread.sleep(500)
        seen = q.recentProgress.count(_.numInputRows > 0)
        if (q.exception.isDefined) throw q.exception.get
      }
      val prog = q.recentProgress.toSeq
        .filter(_.numInputRows > 0)
        .drop(2) // skip warm-up batches (JIT + state-store open)
      val rows = prog.map(_.numInputRows).sum
      val secs = prog.map(p => p.durationMs.get("triggerExecution").toDouble / 1000).sum
      q.stop()
      println(f"[stp] $name%-18s ${rows / secs / 1e6}%.2f M rows/s " +
        f"(${prog.length} batches, $rows rows, $secs%.1f s)")
    }
    spark.stop()
  }
}
