package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** H2O.ai db-benchmark join suite shape (the reference's benchmark family,
  * BASELINE.md): fact table x (N rows) joined against small (N/1e6),
  * medium (N/1e3) and big (N) dimension tables on int and string keys —
  * j1/j2/j4 exercise Spark's automatic broadcast of the small/medium side,
  * j5 is the genuine N:N shuffle join.
  *
  * Usage: runMain graft.JoinBench [N] [query...]  (default 1e7, all five).
  * At N=1e9 set SPARK_GRAFT_SHUFFLE_CODEC=zstd — j5's two-sided ~1.6e9-row
  * shuffle is scratch-disk-bound on one host and zstd halves the on-disk
  * bytes (the same lesson as tools/h2o_big.sh); between-query GC nudges
  * let the ContextCleaner drop finished shuffle files before the next
  * query stacks its own on top; tables cache MEMORY_ONLY so the default
  * MEMORY_AND_DISK overflow cannot silently eat the scratch disk the
  * shuffle needs (measured: j5 warm at 1e9 with MEMORY_AND_DISK dies
  * SPILL_OUT_OF_MEMORY/no-space); and at 1e9 run j5 in its OWN JVM.
  */
object JoinBench {

  /** n rows over the key domains of a FACT table with `base` rows: id1
    * spans base/1e6 values, id2/id5 base/1e3, id3 base. The dims must pass
    * the fact's `base` explicitly — r14 fix: dims previously derived key
    * domains from their OWN row count, which collapsed small's id1 to the
    * single value 1 (j1 degenerated to a one-hot-key fan-out) and shrank
    * medium's id2/id5 domain 1000× (j2/j4 probes missed 99.9% of x). */
  private def keyed(spark: SparkSession, n: Long, salt: Int,
                    base: Long = -1L): DataFrame = {
    val b = if (base > 0) base else n
    spark.range(n).select(
      (pmod(xxhash64(col("id"), lit(salt)), lit(b / 1000000L max 1L)) + 1).as("id1"),
      (pmod(xxhash64(col("id"), lit(salt + 1)), lit(b / 1000L max 1L)) + 1).as("id2"),
      (pmod(xxhash64(col("id"), lit(salt + 2)), lit(b)) + 1).as("id3"),
      concat(lit("id"), (pmod(xxhash64(col("id"), lit(salt + 3)), lit(b / 1000L max 1L)) + 1)
        .cast("string")).as("id5"),
      round(pmod(xxhash64(col("id"), lit(salt + 4)), lit(1000000)) / 10000.0, 6).as("v"))
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toDouble.toLong else 10000000L
    val spark = BenchSession.build()
    import BenchSession.reclaim
    // The H2O medium dim is N/1e3 rows — ~15-20 MB at N=1e9, above Spark's
    // conservative 10 MB default broadcast threshold, so j2-j4 silently
    // degrade from a broadcast probe to a two-sided 1e9-row shuffle join
    // (measured at the 10 MB default: the suite goes disk-bound, j3 at
    // 367.8 s; BASELINE.md records the broadcast-vs-fallback pair).
    // A dim that fits comfortably in every executor SHOULD
    // broadcast at any fact size — raise the threshold to the bench's
    // documented rig value (overridable for the fallback experiment).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      sys.env.getOrElse("SPARK_GRAFT_BCAST_THRESHOLD", "268435456"))

    val only = args.drop(1).toSeq
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_ONLY

    // every table is lazy so a scoped run (e.g. j5 in its own JVM at 1e9)
    // never generates, dedups, or caches a table no selected query reads;
    // forcing happens at query construction, outside the timed window
    lazy val x = { val t = keyed(spark, n, 10).persist(mem); t.count(); t }
    lazy val small = {
      val t = keyed(spark, n / 1000000L max 10L, 20, base = n)
        .select(col("id1"), col("v").as("v2"))
        .dropDuplicates("id1").persist(mem)
      t.count(); t
    }
    lazy val medium = {
      val t = keyed(spark, n / 1000L max 100L, 30, base = n)
        .select(col("id2"), col("id5"), col("v").as("v2"))
        .dropDuplicates("id2").persist(mem)
      t.count(); t
    }
    lazy val mediumS = {
      // the string-keyed j4 dim dedups on ITS join key — a dim deduped on
      // id2 would carry duplicate id5 values and fan j4 out
      val t = keyed(spark, n / 1000L max 100L, 35, base = n)
        .select(col("id5"), col("v").as("v2"))
        .dropDuplicates("id5").persist(mem)
      t.count(); t
    }
    lazy val big = {
      val b = keyed(spark, n, 40, base = n)
        .select(col("id3"), col("v").as("v2")).dropDuplicates("id3").persist(mem)
      b.count(); b
    }

    val queries: Seq[(String, () => DataFrame)] = Seq(
      "j1_small_inner_id1" -> (() => x.join(small, "id1")),
      "j2_medium_inner_id2" -> (() => x.join(medium.select("id2", "v2"), "id2")),
      "j3_medium_left_id2" -> (() => x.join(medium.select("id2", "v2"), Seq("id2"), "left")),
      "j4_medium_inner_id5" -> (() => x.join(mediumS, "id5")),
      "j5_big_inner_id3" -> (() => x.join(big, "id3")))
    val selected = BenchSession.select(queries, only)
      .map { case (name, mk) => name -> mk() }

    selected.foreach { q =>
      q._2.write.format("noop").mode("overwrite").save(); reclaim()
    } // warm
    val results = selected.map { case (name, q) =>
      val t0 = System.nanoTime()
      q.write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      reclaim()
      name -> s
    }
    val qs = results.map { case (q, s) => "\"" + q + f"""\":$s%.3f""" }
      .mkString("{", ",", "}")
    println(f"""{"metric":"join_total","value":${results.map(_._2).sum}%.3f,"unit":"sec","queries":$qs,"n":$n}""")
    spark.stop()
  }
}
