package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      // the whole suite runs with graft's extensions active, proving the
      // spark.sql.extensions entry point end-to-end
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/tmp/graft_test/warehouse")
      // TIME dtype keys run in the ContractSpec sweep; the flag lives in
      // the builder so no query lambda mutates session state
      .config("spark.sql.timeType.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

/** Env gate for the soak portion of the suite (r21 verdict item 2: the
  * full fuzz-seed sweeps put `sbt test` at 1h15m, which no CI window fits
  * — the default suite must complete in minutes). `SPARK_GRAFT_SOAK=1`
  * runs everything; the default keeps the FIRST seed block of every fuzz
  * family (each family's grammar, oracle, and non-vacuity assertions all
  * execute) and marks the deeper blocks ignored, so coverage loss is
  * visible in the run summary rather than silent. */
object Soak {
  val on: Boolean = sys.env.get("SPARK_GRAFT_SOAK").exists(_.trim == "1")
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  /** Register `name` as a live test when `SPARK_GRAFT_SOAK=1`, as an
    * ignored test otherwise. */
  def soakTest(name: String)(body: => Any): Unit =
    if (Soak.on) test(name)(body) else ignore(name)(body)

  /** Run `body` with the given SQL confs set, restoring prior values after. */
  def withSQLConf[T](pairs: (String, String)*)(body: => T): T = {
    val conf = spark.conf
    val saved = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
