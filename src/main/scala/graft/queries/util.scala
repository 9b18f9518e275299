package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.dsl.LazyFrame

/** Shared helpers for the oracle-checked query battery. */
object util {
  /** Read one of the driver-provided tables from an sf dir.
    *
    * `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses by
    * default (SURVEY §1.2: polars ns datetimes normalize to Spark µs). Read
    * nanos as long and truncate to µs — the same truncation DuckDB applies,
    * so oracle comparisons line up. */
  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // integral `div`, NOT `/`: ns-scale longs exceed double's 2^53 mantissa
      s.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    } else s.read.parquet(s"$dir/$name.parquet")
  }

  def lf(s: SparkSession, dir: String, name: String): LazyFrame =
    LazyFrame(t(s, dir, name))

  type Q = (SparkSession, String) => DataFrame
}
