package graft.testing

import java.nio.file.{Files, Path, StandardCopyOption}
import java.nio.file.attribute.FileTime
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType, TimestampType}

import graft.streaming.Streams

/** Semantics probe for stream-stream interval joins on THIS Spark build
  * (r20): pins, with hand-placed timestamps, the exact rules the outer-join
  * and late-join fuzz oracles must model —
  *
  *   1. OUTER EMISSION: which unmatched rows are null-padded by the final
  *      watermark under replay-to-completion, and the boundary strictness
  *      (left rows close at l_ts + upper vs the global watermark; right
  *      rows at r_ts + lower).
  *   2. LATE DROP: the pre-join late filter's predicate form (raw ts vs
  *      condition-adjusted value watermark) and its one-batch lag.
  *   3. EVICTION vs LATE MATCH: whether a late-but-kept row can still match
  *      buffered state from the other side, and when that state is evicted.
  *
  * Each scenario prints the emitted multiset plus per-batch watermark and
  * numRowsDroppedByWatermark; the conclusions are recorded in the
  * [[StreamFuzz]] scaladoc and asserted by StreamingSpec hand tests.
  *
  * Usage: runMain graft.testing.StreamJoinProbe
  */
object StreamJoinProbe {

  private val T0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime

  /** T0 + `min` minutes + `micros` microseconds, exact to the microsecond. */
  private def tsm(min: Long, micros: Long = 0L): Timestamp = {
    val totalUs = (T0 + min * 60000L) * 1000L + micros
    val t = new Timestamp(totalUs / 1000000L * 1000L)
    t.setNanos((totalUs % 1000000L).toInt * 1000)
    t
  }

  private val schema = StructType(Seq(
    StructField("ts", TimestampType), StructField("k", LongType),
    StructField("id", LongType)))

  private def writeFiles(spark: SparkSession,
                         chunks: Seq[Seq[(Timestamp, Long, Long)]]): Path = {
    val out = Files.createTempDirectory("graft-joinprobe")
    chunks.zipWithIndex.foreach { case (part, i) =>
      val rows = part.map { case (t, k, id) => Row(t, k, id) }
      val tmp = Files.createTempDirectory("graft-joinprobe-part")
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val src = tmp.toFile.listFiles()
        .filter(_.getName.endsWith(".parquet")).head.toPath
      Files.move(src, out.resolve(f"chunk_$i%04d.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(out.resolve(f"chunk_$i%04d.parquet"),
        FileTime.fromMillis(1700000000000L + i * 60000L))
      import scala.jdk.CollectionConverters._
      Files.walk(tmp).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
    out
  }

  private val seq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Run a join scenario to completion, print emitted rows + per-batch
    * watermark/drop telemetry. */
  private def run(spark: SparkSession, label: String,
                  left: Seq[Seq[(Timestamp, Long, Long)]],
                  right: Seq[Seq[(Timestamp, Long, Long)]],
                  joinType: String, delay: String,
                  lower: String, upper: String): Unit = {
    val ldir = writeFiles(spark, left)
    val rdir = writeFiles(spark, right)
    val sl = Streams.readParquetStream(spark, ldir.toString, schema,
      maxFilesPerTrigger = 1)
    val sr = Streams.readParquetStream(spark, rdir.toString, schema,
      maxFilesPerTrigger = 1)
      .select(col("ts").as("r_ts"), col("k").as("r_k"), col("id").as("r_id"))
    val l = sl.withWatermark("ts", delay)
    val r = sr.withWatermark("r_ts", delay)
    val joined = l.join(r, col("k") === col("r_k") &&
      col("r_ts") >= col("ts") - expr(s"interval $lower") &&
      col("r_ts") <= col("ts") + expr(s"interval $upper"), joinType)
      .select(col("id").as("l_id"), col("r_id"))
    val name = s"probe_${seq.incrementAndGet()}"
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    q.processAllAvailable()
    val prog = q.recentProgress.toSeq
    q.stop()
    val rows = spark.table(name).collect()
      .map(rw => (Option(rw.get(0)), Option(rw.get(1)))).sortBy(_.toString)
    println(s"== $label (type=$joinType delay=$delay lower=$lower upper=$upper)")
    prog.foreach { p =>
      val so = p.stateOperators.headOption
      println(f"   batch ${p.batchId} in=${p.numInputRows} " +
        s"wm=${p.eventTime.get("watermark")} " +
        s"dropped=${so.map(_.numRowsDroppedByWatermark).getOrElse(-1L)} " +
        s"stateRows=${so.map(_.numRowsTotal).getOrElse(-1L)}")
    }
    println(s"   emitted: ${rows.mkString(", ")}")
    spark.catalog.dropTempView(name)
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // ---- P-A: leftOuter emission boundary, single batch per side --------
    // delay=10m lower=0 upper=10m. Right max T0+120 (k=99, no match) drives
    // wmR=T0+110; left max T0+105 (k=98) drives wmL=T0+95 -> wmF=T0+95.
    // Unmatched left closes iff l_ts + 10m </<= T0+95 i.e. l_ts ~ T0+85.
    run(spark, "P-A leftOuter boundary",
      left = Seq(Seq(
        (tsm(50), 1L, 10L),              // matched by r0
        (tsm(80), 1L, 11L),              // 90 < 95  -> expect null-pad
        (tsm(84, 59999999L), 1L, 12L),   // 84:59.999999 -> expect pad
        (tsm(85), 1L, 13L),              // exactly 95 == 95 -> boundary
        (tsm(85, 1), 1L, 14L),           // 95:00.000001 -> expect NO pad
        (tsm(105), 98L, 15L))),          // wm driver; 115 > 95 -> no pad
      right = Seq(Seq(
        (tsm(55), 1L, 20L),              // matches id 10
        (tsm(120), 99L, 21L))),
      joinType = "leftOuter", delay = "10 minutes",
      lower = "0 seconds", upper = "10 minutes")

    // ---- P-B: rightOuter emission boundary ------------------------------
    // lower=10m upper=0: unmatched right closes iff r_ts + 10m < wmF.
    run(spark, "P-B rightOuter boundary",
      left = Seq(Seq(
        (tsm(55), 1L, 10L),              // matches id 20
        (tsm(120), 99L, 11L))),          // wmL = 110
      right = Seq(Seq(
        (tsm(50), 1L, 20L),              // matched
        (tsm(80), 1L, 21L),              // 90 < 95 -> expect pad
        (tsm(85), 1L, 22L),              // boundary
        (tsm(85, 1), 1L, 23L),           // expect NO pad
        (tsm(105), 98L, 24L))),          // wmR = 95 -> wmF = 95
      joinType = "rightOuter", delay = "10 minutes",
      lower = "10 minutes", upper = "0 seconds")

    // ---- P-C: late-drop predicate form, 2 files / side ------------------
    // delay=10m lower=0 upper=30m. File0 maxima both sides T0+100
    // -> thr(batch1) = T0+90. Left file1 carries LATE rows:
    //   lateB ts=55: 55+30=85  < 90 -> dropped under either form
    //   lateD ts=60: 60+30=90 == 90 -> boundary
    //   lateA ts=85: raw 85 < 90 but 85+30=115 >= 90 -> KEPT iff value-form
    //   lateC ts=95: raw 95 > 90 -> kept under either form
    // wmF = T0+290 closes everything kept -> leftOuter pads = kept rows.
    run(spark, "P-C late-drop form",
      left = Seq(
        Seq((tsm(100), 98L, 10L)),
        Seq((tsm(55), 1L, 11L), (tsm(60), 1L, 12L), (tsm(85), 1L, 13L),
          (tsm(95), 1L, 14L), (tsm(300), 98L, 15L))),
      right = Seq(
        Seq((tsm(100), 99L, 20L)),
        Seq((tsm(300), 99L, 21L))),
      joinType = "leftOuter", delay = "10 minutes",
      lower = "0 seconds", upper = "30 minutes")

    // ---- P-D: eviction vs late match, 3 files / side, INNER -------------
    // delay=60m lower=0 upper=120m. Per-file maxima both sides:
    // 100 / 200 / 320. wm(1)=T0+40, thr(2)=wm(1)=40? no: wm entering
    // batch2 = min maxima through file1 - 60 = T0+140.
    //   r  (k=3) ts=30 right file0: evicted end-of-batch-1 iff
    //       30 + lower(0) < wm(1)=T0+40 -> candidate forms differ:
    //       E-raw: 30 < 40 evict; E-upper-adjusted: 30 < 40-120 no.
    //   l  (k=3) ts=25 left file2 (late): kept iff 25+120=145 >= 140.
    //       pair (l,r): r in [25, 145] -> matches IF r still buffered.
    //   r2 (k=4) ts=45 right file0: 45 >= 40 -> survives batch1 end.
    //   l2 (k=4) ts=25 left file2: matches r2 in [25,145] -> expect pair.
    run(spark, "P-D eviction vs late match",
      left = Seq(
        Seq((tsm(100), 98L, 10L)),
        Seq((tsm(200), 98L, 11L)),
        Seq((tsm(25), 3L, 12L), (tsm(25), 4L, 13L), (tsm(320), 98L, 14L))),
      right = Seq(
        Seq((tsm(30), 3L, 20L), (tsm(45), 4L, 21L), (tsm(100), 99L, 22L)),
        Seq((tsm(200), 99L, 23L)),
        Seq((tsm(320), 99L, 24L))),
      joinType = "inner", delay = "60 minutes",
      lower = "0 seconds", upper = "120 minutes")

    // ---- P-F: eviction/pad boundary fine grid (whole-second wm) ---------
    // wmF = T0+95:00.000 (max rows exact). upper=10m. Hypothesis: value
    // watermark = wm - upper - 1s = 84:59.000; pad iff l_ts </<= that.
    run(spark, "P-F pad boundary grid",
      left = Seq(Seq(
        (tsm(84, 58999999L), 1L, 10L),   // 84:58.999999 -> pad expected
        (tsm(84, 59000000L), 1L, 11L),   // 84:59.000000 -> boundary
        (tsm(84, 59000001L), 1L, 12L),   // 84:59.000001 -> no pad expected
        (tsm(84, 59500000L), 1L, 13L),   // 84:59.5      -> no pad expected
        (tsm(105), 98L, 14L))),
      right = Seq(Seq((tsm(120), 99L, 20L))),
      joinType = "leftOuter", delay = "10 minutes",
      lower = "0 seconds", upper = "10 minutes")

    // ---- P-G: pad boundary with fractional-ms watermark ------------------
    // left max row at 105:00.250 -> wmL = 95:00.250; wmR=110 -> wmF=95:00.250.
    // Hypothesized threshold = 84:59.250.
    run(spark, "P-G pad boundary fractional wm",
      left = Seq(Seq(
        (tsm(84, 59249999L), 1L, 10L),   // just below -> pad?
        (tsm(84, 59250000L), 1L, 11L),   // exactly    -> boundary
        (tsm(84, 59250001L), 1L, 12L),   // just above -> no pad?
        (tsm(105, 250000L), 98L, 13L))),
      right = Seq(Seq((tsm(120), 99L, 20L))),
      joinType = "leftOuter", delay = "10 minutes",
      lower = "0 seconds", upper = "10 minutes")

    // ---- P-H: late-filter boundary (raw-ts form, whole-ms thr) ----------
    // file0 maxima both sides T0+100:00.000, delay=10m. Displayed wm for
    // batch1 = 90:00. Hypothesis: filter in batch b uses wm(b-1), so
    // batch1's filter threshold = wm(0) = epoch -> nothing drops in batch1;
    // need a THIRD batch: thr(2) = wm(1) = 90:00.000.
    // Left file2 rows: 89:59.999999 / 90:00.000000 / 90:00.000001.
    // Last-file max 400 pushes wmF to 390 so every KEPT row pads.
    run(spark, "P-H late-filter boundary",
      left = Seq(
        Seq((tsm(100), 98L, 10L)),
        Seq((tsm(200), 98L, 11L)),
        Seq((tsm(89, 59999999L), 1L, 12L), (tsm(90, 0L), 1L, 13L),
          (tsm(90, 1L), 1L, 14L), (tsm(400), 98L, 15L))),
      right = Seq(
        Seq((tsm(100), 99L, 20L)),
        Seq((tsm(200), 99L, 21L)),
        Seq((tsm(400), 99L, 22L))),
      joinType = "leftOuter", delay = "10 minutes",
      lower = "0 seconds", upper = "30 minutes")

    // ---- P-I: late-filter boundary with fractional-ms watermark ----------
    // file1 left max at 200:00.750 -> wm(2) = 190:00.750 (if left governs:
    // right file1 max 200:00.000 -> min -> wm(2)=190:00.000). Make right
    // file1 max 210 so LEFT governs: wm(2) = 190:00.750.
    run(spark, "P-I late-filter fractional thr",
      left = Seq(
        Seq((tsm(100), 98L, 10L)),
        Seq((tsm(200, 750000L), 98L, 11L)),
        Seq((tsm(190, 749999L), 1L, 12L), (tsm(190, 750000L), 1L, 13L),
          (tsm(190, 750001L), 1L, 14L), (tsm(400), 98L, 15L))),
      right = Seq(
        Seq((tsm(100), 99L, 20L)),
        Seq((tsm(210), 99L, 21L)),
        Seq((tsm(400), 99L, 22L))),
      joinType = "leftOuter", delay = "10 minutes",
      lower = "0 seconds", upper = "30 minutes")

    // ---- P-J: late-kept row matches buffered state ------------------------
    // delay=60m. Maxima 100/200/400 both sides. thr(2)=wm(1)=T0+40.
    //   r1 (k=4) ts=70 right file0: alive through batch2 (evict needs
    //       70 < wm - 0 - 1s; wm(2)=140 at END of batch2 -> evicted after,
    //       but l arrives IN batch2 -> match emits).
    //   l1 (k=4) ts=65 left file2: raw 65 >= 40 -> KEPT late; matches r1
    //       (r in [65, 65+30]) -> pair expected.
    //   l2 (k=3) ts=35 left file2: raw 35 < 40 -> DROPPED; r2 (k=3) ts=50
    //       in range -> NO pair, and NO pad for l2 despite leftOuter.
    run(spark, "P-J late-kept match + dropped no-pad",
      left = Seq(
        Seq((tsm(100), 98L, 10L)),
        Seq((tsm(200), 98L, 11L)),
        Seq((tsm(65), 4L, 12L), (tsm(35), 3L, 13L), (tsm(400), 98L, 14L))),
      right = Seq(
        Seq((tsm(70), 4L, 20L), (tsm(50), 3L, 21L), (tsm(100), 99L, 22L)),
        Seq((tsm(200), 99L, 23L)),
        Seq((tsm(400), 99L, 24L))),
      joinType = "leftOuter", delay = "60 minutes",
      lower = "0 seconds", upper = "30 minutes")

    // ---- P-G2: discriminate the pad threshold under fractional wm -------
    // wmF = 95:00.250 -> predicted threshold floor((5700250-600000-1)/1000)
    // = 5100 s = 85:00.000000 INCLUSIVE.
    run(spark, "P-G2 pad threshold fractional discriminator",
      left = Seq(Seq(
        (tsm(84, 59999999L), 1L, 10L),   // pad expected
        (tsm(85, 0L), 1L, 11L),          // exactly 5100 s -> pad expected
        (tsm(85, 1L), 1L, 12L),          // 5100.000001 -> NO pad expected
        (tsm(105, 250000L), 98L, 13L))),
      right = Seq(Seq((tsm(120), 99L, 20L))),
      joinType = "leftOuter", delay = "10 minutes",
      lower = "0 seconds", upper = "10 minutes")

    // ---- P-I2: late-filter boundary at fractional-ms threshold ----------
    // 4 files; left file1 max 200:00.750, right file1 max 210 -> displayed
    // wm(batch2) = 190:00.750 = the filter threshold for batch 3.
    // Predicted: drop iff ts_us <= 190:00.750 exactly (inclusive).
    run(spark, "P-I2 late-filter fractional boundary",
      left = Seq(
        Seq((tsm(100), 98L, 10L)),
        Seq((tsm(200, 750000L), 98L, 11L)),
        Seq((tsm(300), 98L, 12L)),
        Seq((tsm(190, 749999L), 1L, 13L), (tsm(190, 750000L), 1L, 14L),
          (tsm(190, 750001L), 1L, 15L), (tsm(700), 98L, 16L))),
      right = Seq(
        Seq((tsm(100), 99L, 20L)),
        Seq((tsm(210), 99L, 21L)),
        Seq((tsm(300), 99L, 22L)),
        Seq((tsm(700), 99L, 23L))),
      joinType = "leftOuter", delay = "10 minutes",
      lower = "0 seconds", upper = "30 minutes")

    // ---- P-E: fullOuter sanity -------------------------------------------
    run(spark, "P-E fullOuter boundary",
      left = Seq(Seq(
        (tsm(50), 1L, 10L),
        (tsm(80), 1L, 11L),              // 90 < 95 -> pad
        (tsm(105), 98L, 12L))),
      right = Seq(Seq(
        (tsm(55), 1L, 20L),
        (tsm(70), 2L, 21L),              // 80 < 85? lower=0: 70+0 < 95 -> pad
        (tsm(120), 99L, 22L))),
      joinType = "fullOuter", delay = "10 minutes",
      lower = "0 seconds", upper = "10 minutes")

    spark.stop()
  }
}
