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

  private def keyed(spark: SparkSession, n: Long, salt: Int): DataFrame =
    spark.range(n).select(
      (pmod(xxhash64(col("id"), lit(salt)), lit(n / 1000000L max 1L)) + 1).as("id1"),
      (pmod(xxhash64(col("id"), lit(salt + 1)), lit(n / 1000L max 1L)) + 1).as("id2"),
      (pmod(xxhash64(col("id"), lit(salt + 2)), lit(n)) + 1).as("id3"),
      concat(lit("id"), (pmod(xxhash64(col("id"), lit(salt + 3)), lit(n / 1000L max 1L)) + 1)
        .cast("string")).as("id5"),
      round(pmod(xxhash64(col("id"), lit(salt + 4)), lit(1000000)) / 10000.0, 6).as("v"))

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toDouble.toLong else 10000000L
    val spark = BenchSession.build()
    import BenchSession.reclaim

    val only = args.drop(1).toSeq
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_ONLY

    val x = keyed(spark, n, 10).persist(mem); x.count()
    val small = keyed(spark, n / 1000000L max 10L, 20)
      .select(col("id1"), col("v").as("v2")).distinct().persist(mem); small.count()
    val medium = keyed(spark, n / 1000L max 100L, 30)
      .select(col("id2"), col("id5"), col("v").as("v2"))
      .dropDuplicates("id2").persist(mem); medium.count()
    lazy val big = {
      val b = keyed(spark, n, 40)
        .select(col("id3"), col("v").as("v2")).dropDuplicates("id3").persist(mem)
      b.count(); b
    }

    val queries: Seq[(String, () => DataFrame)] = Seq(
      "j1_small_inner_id1" -> (() => x.join(small, "id1")),
      "j2_medium_inner_id2" -> (() => x.join(medium.select("id2", "v2"), "id2")),
      "j3_medium_left_id2" -> (() => x.join(medium.select("id2", "v2"), Seq("id2"), "left")),
      "j4_medium_inner_id5" -> (() => x.join(medium.select("id5", "v2"), "id5")),
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
