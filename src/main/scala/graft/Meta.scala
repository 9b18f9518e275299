package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's session/meta utilities (`show_versions`, `build_info`,
  * `set_random_seed` — py-polars `functions/random.py` and the meta
  * module), mapped to their Spark-session analogues. */
object Meta {

  /** polars build_info: the component versions a bug report needs.
    * (Keep "graft" in sync with ThisBuild/version in build.sbt.) */
  def buildInfo(spark: SparkSession): Map[String, String] = Map(
    "graft" -> "0.1.0",
    "spark" -> spark.version,
    "scala" -> scala.util.Properties.versionNumberString,
    "java" -> System.getProperty("java.version"))

  /** polars show_versions, as a frame (sorted for determinism). */
  def showVersions(spark: SparkSession): DataFrame = {
    import spark.implicits._
    buildInfo(spark).toSeq.sorted.toDF("component", "version")
  }

  /** polars set_random_seed: the reference seeds its global RNG; graft's
    * sampling surface is deliberately stateless (content-hash thresholds,
    * `ops/Sampling`), so the session seed is a conf that seeded operations
    * fold into their hash input via [[saltedId]] —
    * `Sampling.sampleStratified` consults it — same determinism contract
    * (one seed, reproducible draws), no RNG state to ship to executors. */
  def setRandomSeed(spark: SparkSession, seed: Long): Unit =
    spark.conf.set("graft.random.seed", seed.toString)

  def randomSeed(spark: SparkSession): Option[Long] =
    spark.conf.getOption("graft.random.seed").map(_.toLong)

  /** The id column for hash-sampling under the session seed: different
    * seeds draw different (still deterministic) samples. */
  def saltedId(spark: SparkSession, id: Column): Column =
    randomSeed(spark) match {
      case Some(s) => concat(id.cast("string"), lit(":"), lit(s.toString))
      case None    => id
    }

  /** polars thread_pool_size (functions/misc.py): the engine's worker
    * parallelism — in Spark terms, the scheduler's default parallelism
    * (executor cores in local mode, total cores on a cluster). */
  def threadPoolSize(spark: SparkSession): Int =
    spark.sparkContext.defaultParallelism

  /** polars get_index_type: the dtype backing row indices. polars returns
    * UInt32; graft's `row_index`/gather surface is 64-bit (Spark has no
    * unsigned 32-bit type and 100 TB corpora overflow u32 row counts
    * anyway), so this reports the actual engine contract. */
  def indexType: String = "Int64"

  /** polars read_ipc_schema (io/ipc/functions.py): footer-only schema of
    * an Arrow IPC file/directory through the graft-ipc DSv2 connector —
    * resolving the relation reads schema metadata, never record batches
    * (the scan stays lazy and unexecuted). */
  def readIpcSchema(spark: SparkSession, path: String):
      org.apache.spark.sql.types.StructType =
    spark.read.format("graft-ipc").load(path).schema
}
