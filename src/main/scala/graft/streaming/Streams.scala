package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Structured Streaming extensions (SURVEY §2.10 / §7.2 M6).
  *
  * The reference's "streaming engine" is pipelined batch (no watermarks or
  * event-time semantics); these operators go beyond it: the same graft
  * transforms applied to unbounded sources with watermark-driven state
  * eviction, so a pipeline written against LazyFrame can be re-pointed at a
  * stream. At scale, state size is bounded by (watermark horizon × key
  * cardinality) — choose the horizon accordingly.
  */
object Streams {

  /** Open a parquet directory as an unbounded stream (new files = new data).
    * Schema must be supplied — streams can't infer. */
  def readParquetStream(spark: SparkSession, path: String, schema: StructType,
                        maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(path)

  /** Tumbling/hopping event-time aggregation with late-data handling — the
    * streaming version of LazyFrame.groupByDynamic. */
  def windowedAgg(events: DataFrame, ts: String, every: String,
                  watermark: String, aggs: Seq[org.apache.spark.sql.Column],
                  extraKeys: Seq[org.apache.spark.sql.Column] = Nil): DataFrame =
    events
      .withWatermark(ts, watermark)
      .groupBy(window(col(ts), every) +: extraKeys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("_window_start", col("window.start"))
      .withColumn("_window_end", col("window.end"))
      .drop("window")

  /** Streaming exact dedup on a key expression: drops duplicates across
    * triggers; watermark bounds the dedup state. */
  def dedupStream(events: DataFrame, ts: String, watermark: String,
                  keyCols: Seq[String]): DataFrame =
    events.withWatermark(ts, watermark)
      .dropDuplicates(keyCols :+ ts)

  /** Run a streaming query to completion over the files already in the
    * source dir (batch-replay harness for tests/backfills): memory sink,
    * processAllAvailable, return the materialized result. */
  def replayToTable(df: DataFrame, queryName: String,
                    outputMode: String = "append"): DataFrame = {
    val q = df.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .start()
    q.processAllAvailable()
    q.stop()
    df.sparkSession.table(queryName)
  }
}
