package graft.testing

import java.nio.file.{Files, StandardCopyOption}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout
import org.apache.spark.sql.types.StructType

import graft.queries.util
import graft.streaming.Streams

/** Seeded streaming-vs-batch differential fuzzer (SURVEY §2.13; r17 verdict
  * task 4). PlanFuzz reaches every batch path; the nine `stream_*` oracle
  * keys are hand-written — this generator searches the streaming state
  * machinery (window-state merge, session merge rules, watermark-driven
  * append emission, dedup state, mapGroupsWithState folds) with random
  * shapes the hand tests don't enumerate.
  *
  * Grammar (all draws from `new Random(seed)`, fully deterministic):
  *
  *  - shape ∈ { tumble·complete, tumble·append, hop·complete, hop·append,
  *              session·complete, dedup·append, mapGroupsWithState·update }
  *  - input: the sf events fixture under one of 4 pre-filters, split into
  *    1–3 TIME-CONTIGUOUS parquet files (sorted by ts, chunked) replayed
  *    one file per micro-batch. Contiguity is the determinism invariant:
  *    minTs(batch i+1) ≥ maxTs(batch i), so no row is ever behind the
  *    watermark and the stream drops nothing — the batch frame is then an
  *    exact oracle. File order is pinned by both name and mtime.
  *  - window `every` ∈ {23m, 45m, 1h, 97m, 3h, 8h, 1d}; hop `slide` drawn
  *    strictly smaller; session `gap` ∈ {9m, 30m, 1h, 2h}; watermark delay
  *    in whole odd minutes/hours so the final watermark (maxTs − delay,
  *    where maxTs has seconds ≈ :16.2) never coincides with a window
  *    boundary and the append cutoff is unambiguous.
  *  - aggs: 1–3 of {count, round(sum(value),4), min/max(value),
  *    sum(user_id), min/max(event_id)} — sums of the 2-decimal fixture
  *    values are integer cents, so round(·,4) can never straddle a
  *    half-ulp rounding boundary between the stream's incremental state
  *    order and the batch hash-agg order; everything else is exact.
  *  - extra group keys ⊂ {event_type, user_id, pmod(user_id,3)}.
  *
  * Oracles:
  *  - complete mode: the full batch aggregate (complete-mode memory sink
  *    holds exactly the final result).
  *  - append mode: the batch aggregate filtered to windows with
  *    end ≤ floor_ms(maxTs) − delay — Spark emits a window when the event
  *    -time watermark reaches its end (boundary verified inclusive on this
  *    Spark build), and the watermark is tracked in whole milliseconds.
  *  - dedup: distinct projection of (keys, date_trunc(unit, ts)); the
  *    coarsened event-time column is the watermark column, and the delay
  *    pool starts at 2 h ≥ trunc-unit + one batch of slack so a duplicate
  *    spanning two files can never arrive behind the watermark.
  *  - mapGroupsWithState: batch groupBy fold; the update-mode sink holds
  *    one row per (key, trigger), so the final state is the max-n row per
  *    key (n is the running count, strictly increasing per key).
  *
  * A failing seed reproduces standalone:
  * `StreamFuzz.runCase(spark, "/root/testdata/sf0.001", seed)`.
  */
object StreamFuzz {

  // ---- deterministic multi-batch input ----------------------------------

  private case class Input(dir: String, schema: StructType, maxTsMillis: Long)

  private val inputCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Input]()

  private val filterPool: Vector[(String, DataFrame => DataFrame)] = Vector(
    ("all", identity[DataFrame] _),
    ("user_le_7", (df: DataFrame) => df.filter(col("user_id") <= 7)),
    ("value_gt_50", (df: DataFrame) => df.filter(col("value") > 50)),
    ("two_types",
      (df: DataFrame) => df.filter(col("event_type").isin("click", "purchase"))))

  /** Split the (filtered) events fixture into `nFiles` time-contiguous
    * parquet files in one directory, ordered by name AND mtime so the file
    * stream source replays them oldest-first. Collect is fixture-scale
    * (≤ thousands of rows) — this is a test harness, not an operator. */
  private def prepare(spark: SparkSession, sfDir: String,
                      filterIdx: Int, nFiles: Int): Input =
    inputCache.computeIfAbsent((filterIdx, nFiles), { _ =>
      val df = filterPool(filterIdx)._2(
        util.t(spark, sfDir, "events")
          .select("ts", "event_id", "user_id", "event_type", "value"))
      val rows = df.orderBy("ts", "event_id").collect()
      require(rows.nonEmpty, s"empty fuzz input for filter $filterIdx")
      val out = Files.createTempDirectory("graft-streamfuzz")
      val chunk = math.max(1, math.ceil(rows.length.toDouble / nFiles).toInt)
      var i = 0
      var written = 0
      while (written < rows.length) {
        val part = rows.slice(written, math.min(written + chunk, rows.length))
        written += part.length
        val tmp = Files.createTempDirectory("graft-streamfuzz-part")
        spark.createDataFrame(java.util.Arrays.asList(part: _*), df.schema)
          .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val src = tmp.toFile.listFiles()
          .filter(_.getName.endsWith(".parquet")).head.toPath
        val dst = out.resolve(f"chunk_$i%04d.parquet")
        Files.move(src, dst, StandardCopyOption.REPLACE_EXISTING)
        Files.setLastModifiedTime(dst,
          FileTime.fromMillis(1700000000000L + i * 60000L))
        i += 1
      }
      val tsIdx = df.schema.fieldIndex("ts")
      val maxTsMillis = rows.last.getTimestamp(tsIdx).getTime
      Input(out.toString, df.schema, maxTsMillis)
    })

  // ---- draw pools --------------------------------------------------------

  private val everyPool =
    Vector("23 minutes", "45 minutes", "1 hour", "97 minutes", "3 hours",
      "8 hours", "1 day")
  private val slidePool =
    Vector("7 minutes", "15 minutes", "30 minutes", "1 hour")
  private val gapPool = Vector("9 minutes", "30 minutes", "1 hour", "2 hours")
  // (interval string, milliseconds) — whole odd minutes/hours; see scaladoc
  private val delayPool = Vector(
    ("31 minutes", 31L * 60000L),
    ("2 hours", 2L * 3600000L),
    ("7 hours", 7L * 3600000L),
    ("26 hours", 26L * 3600000L))

  private def minutesOf(interval: String): Long = {
    val Array(n, unit) = interval.split(" ")
    unit match {
      case u if u.startsWith("minute") => n.toLong
      case u if u.startsWith("hour")   => n.toLong * 60
      case u if u.startsWith("day")    => n.toLong * 1440
    }
  }

  private case class AggPick(name: String, c: Column)
  private val aggPool = Vector(
    AggPick("n", count(lit(1)).as("n")),
    AggPick("sv", round(sum(col("value")), 4).as("sv")),
    AggPick("mxv", max(col("value")).as("mxv")),
    AggPick("mnv", min(col("value")).as("mnv")),
    AggPick("su", sum(col("user_id")).as("su")),
    AggPick("mxe", max(col("event_id")).as("mxe")),
    AggPick("mne", min(col("event_id")).as("mne")))

  private val keyPool: Vector[(String, Column)] = Vector(
    ("event_type", col("event_type")),
    ("user_id", col("user_id")),
    ("ub", pmod(col("user_id"), lit(3)).as("ub")))

  private def drawDistinct[T](rnd: scala.util.Random, pool: Vector[T],
                              n: Int): Vector[T] =
    rnd.shuffle(pool).take(n)

  // ---- comparison --------------------------------------------------------

  /** Exact multiset equality over the shared (sorted) column set. */
  private def diff(got: DataFrame, want: DataFrame): Option[String] = {
    val cols = want.columns.sorted.map(col)
    val g = got.select(cols.toIndexedSeq: _*)
    val w = want.select(cols.toIndexedSeq: _*)
    val extra = g.exceptAll(w)
    val missing = w.exceptAll(g)
    if (extra.isEmpty && missing.isEmpty) None
    else Some(
      s"extra=[${extra.collect().take(3).mkString("; ")}] " +
        s"missing=[${missing.collect().take(3).mkString("; ")}] " +
        s"(got ${g.count()} rows, want ${w.count()})")
  }

  // ---- the case runner ---------------------------------------------------

  /** Run one seeded case; None = stream and batch agree. */
  def runCase(spark: SparkSession, sfDir: String, seed: Long): Option[String] = {
    val rnd = new scala.util.Random(seed)
    val shape = rnd.nextInt(10)
    val res = shape match {
      case 0 | 1 => windowCase(spark, sfDir, rnd, hop = false, append = false)
      case 2 | 3 => windowCase(spark, sfDir, rnd, hop = false, append = true)
      case 4     => windowCase(spark, sfDir, rnd, hop = true, append = false)
      case 5     => windowCase(spark, sfDir, rnd, hop = true, append = true)
      case 6 | 7 => sessionCase(spark, sfDir, rnd)
      case 8     => dedupCase(spark, sfDir, rnd)
      case _     => mgsCase(spark, sfDir, rnd)
    }
    res.map(msg => s"seed $seed: $msg")
  }

  private def windowCase(spark: SparkSession, sfDir: String,
                         rnd: scala.util.Random,
                         hop: Boolean, append: Boolean): Option[String] = {
    val filterIdx = rnd.nextInt(filterPool.length)
    val nFiles = if (append) 2 + rnd.nextInt(2) else 1 + rnd.nextInt(3)
    val in = prepare(spark, sfDir, filterIdx, nFiles)
    val every = everyPool(rnd.nextInt(everyPool.length))
    val slide =
      if (hop) {
        val cands = slidePool.filter(s => minutesOf(s) < minutesOf(every))
        Some(cands(rnd.nextInt(cands.length)))
      } else None
    val (delayStr, delayMs) = delayPool(rnd.nextInt(delayPool.length))
    val keys = drawDistinct(rnd, keyPool, rnd.nextInt(3)).map(_._2)
    val aggs = drawDistinct(rnd, aggPool, 1 + rnd.nextInt(3)).map(_.c)

    val stream = Streams.readParquetStream(spark, in.dir, in.schema,
      maxFilesPerTrigger = 1)
    val agg = Streams.windowedAgg(stream, "ts", every, delayStr, aggs,
      extraKeys = keys, slide = slide)
    val mode = if (append) "append" else "complete"
    val name = s"sfz_w_${rnd.nextInt(Int.MaxValue)}"
    val got = Streams.replayToTable(agg, name, outputMode = mode)

    val batch = spark.read.schema(in.schema).parquet(in.dir)
    val win = slide.map(s => window(col("ts"), every, s))
      .getOrElse(window(col("ts"), every))
    val full = batch.groupBy(win +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("_window_start", col("window.start"))
      .withColumn("_window_end", col("window.end"))
      .drop("window")
    val want =
      if (append) {
        val cutoffMs = in.maxTsMillis - delayMs
        full.filter(col("_window_end") <= expr(s"timestamp_millis(${cutoffMs}L)"))
      } else full
    diff(got, want).map(d =>
      s"window hop=$hop mode=$mode every=$every slide=$slide delay=$delayStr " +
        s"filter=${filterPool(filterIdx)._1} nFiles=$nFiles: $d")
  }

  private def sessionCase(spark: SparkSession, sfDir: String,
                          rnd: scala.util.Random): Option[String] = {
    val filterIdx = rnd.nextInt(filterPool.length)
    val nFiles = 1 + rnd.nextInt(3)
    val in = prepare(spark, sfDir, filterIdx, nFiles)
    val gap = gapPool(rnd.nextInt(gapPool.length))
    val (delayStr, _) = delayPool(rnd.nextInt(delayPool.length))
    // streaming session aggregation requires ≥1 non-session group key
    val keys = drawDistinct(rnd, keyPool, 1 + rnd.nextInt(2)).map(_._2)
    val aggs = drawDistinct(rnd, aggPool, 1 + rnd.nextInt(3)).map(_.c)

    val stream = Streams.readParquetStream(spark, in.dir, in.schema,
      maxFilesPerTrigger = 1)
    val agg = Streams.sessionAgg(stream, "ts", gap, delayStr, keys, aggs)
    val name = s"sfz_s_${rnd.nextInt(Int.MaxValue)}"
    val got = Streams.replayToTable(agg, name, outputMode = "complete")

    val batch = spark.read.schema(in.schema).parquet(in.dir)
    val want = batch.groupBy(session_window(col("ts"), gap) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("_session_start", col("session_window.start"))
      .withColumn("_session_end", col("session_window.end"))
      .drop("session_window")
    diff(got, want).map(d =>
      s"session gap=$gap delay=$delayStr filter=${filterPool(filterIdx)._1} " +
        s"nFiles=$nFiles: $d")
  }

  private def dedupCase(spark: SparkSession, sfDir: String,
                        rnd: scala.util.Random): Option[String] = {
    val filterIdx = rnd.nextInt(filterPool.length)
    val nFiles = 2 + rnd.nextInt(2)
    val in = prepare(spark, sfDir, filterIdx, nFiles)
    val unit = if (rnd.nextBoolean()) "hour" else "minute"
    // delay ≥ 2 h: larger than the trunc unit, so a cross-file duplicate's
    // coarsened event time can never be behind the watermark (see scaladoc)
    val (delayStr, _) = delayPool(1 + rnd.nextInt(delayPool.length - 1))
    val keyNames = drawDistinct(rnd,
      Vector("user_id", "event_type"), 1 + rnd.nextInt(2))

    val stream = Streams.readParquetStream(spark, in.dir, in.schema,
      maxFilesPerTrigger = 1)
      .withColumn("tsh", date_trunc(unit, col("ts")))
      .select(("tsh" +: keyNames).map(col): _*)
    val deduped = Streams.dedupStream(stream, "tsh", delayStr, keyNames)
    val name = s"sfz_d_${rnd.nextInt(Int.MaxValue)}"
    val got = Streams.replayToTable(deduped, name, outputMode = "append")

    val want = spark.read.schema(in.schema).parquet(in.dir)
      .withColumn("tsh", date_trunc(unit, col("ts")))
      .select(("tsh" +: keyNames).map(col): _*)
      .distinct()
    diff(got, want).map(d =>
      s"dedup unit=$unit keys=$keyNames delay=$delayStr " +
        s"filter=${filterPool(filterIdx)._1} nFiles=$nFiles: $d")
  }

  private def mgsCase(spark: SparkSession, sfDir: String,
                      rnd: scala.util.Random): Option[String] = {
    val filterIdx = rnd.nextInt(filterPool.length)
    val nFiles = 2 + rnd.nextInt(2)
    val in = prepare(spark, sfDir, filterIdx, nFiles)
    val keyExprs = Vector(
      ("user_id", col("user_id")),
      ("ub3", pmod(col("user_id"), lit(3))),
      ("ub5", pmod(col("user_id"), lit(5))))
    val valExprs = Vector(
      ("value", col("value")),
      ("scaled", col("value") * 0.5 + 1),
      ("eid97", (col("event_id") % 97).cast("double")))
    val (kName, kExpr) = keyExprs(rnd.nextInt(keyExprs.length))
    val (vName, vExpr) = valExprs(rnd.nextInt(valExprs.length))
    val op = rnd.nextInt(3) // 0=sum 1=max 2=min

    val stream = Streams.readParquetStream(spark, in.dir, in.schema,
      maxFilesPerTrigger = 1)
    val s = spark
    import s.implicits._
    val folded = stream
      .select(kExpr.cast("long").as("k"), vExpr.cast("double").as("v"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Double)],
         st: org.apache.spark.sql.streaming.GroupState[FuzzFoldState]) =>
          val next = rows.foldLeft(st.getOption.orNull) { case (acc, (_, v)) =>
            if (acc == null) FuzzFoldState(key, 1L, v)
            else FuzzFoldState(key, acc.n + 1, op match {
              case 0 => acc.acc + v
              case 1 => math.max(acc.acc, v)
              case _ => math.min(acc.acc, v)
            })
          }
          st.update(next)
          next
      }
    val name = s"sfz_m_${rnd.nextInt(Int.MaxValue)}"
    val updates = Streams.replayDatasetToTable(folded, name,
      outputMode = "update")
    // final state per key = the max-n update (n strictly increases per key)
    val got = updates.groupBy(col("k"))
      .agg(max(col("n")).as("n"), max_by(col("acc"), col("n")).as("acc"))
      .select(col("k"), col("n"), round(col("acc"), 4).as("acc"))

    val batchAcc = op match {
      case 0 => sum(col("v"))
      case 1 => max(col("v"))
      case _ => min(col("v"))
    }
    val want = spark.read.schema(in.schema).parquet(in.dir)
      .select(kExpr.cast("long").as("k"), vExpr.cast("double").as("v"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"), round(batchAcc, 4).as("acc"))
    diff(got, want).map(d =>
      s"mgs key=$kName val=$vName op=$op filter=${filterPool(filterIdx)._1} " +
        s"nFiles=$nFiles: $d")
  }
}

/** Running fold state for [[StreamFuzz]] mapGroupsWithState cases. */
case class FuzzFoldState(k: Long, n: Long, acc: Double)
