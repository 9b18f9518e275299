package graft

import org.apache.spark.sql.functions._
import graft.sources.Database

/** JDBC source/sink round-trip against embedded Derby — a real database,
  * no network: write_database modes, table read, partitioned parallel
  * read, and whole-query pushdown. */
class DatabaseSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("write_database replace/append modes + read_database round-trip") {
    val df = Seq((1L, "a", 1.5), (2L, "b", -2.0), (3L, "c", 0.25))
      .toDF("id", "name", "v")
    Database.write(df, url, "t_rt", ifTableExists = "replace")
    Database.write(df.filter(col("id") === 1L), url, "t_rt", ifTableExists = "append")
    val back = Database.read(spark, url, "t_rt")
    assert(back.count() == 4)
    assert(back.filter(col("id") === 1L).count() == 2)
    assert(back.schema.fieldNames.map(_.toLowerCase).toSeq == Seq("id", "name", "v"))
    intercept[Exception] { // fail mode on an existing table
      Database.write(df, url, "t_rt", ifTableExists = "fail")
    }
  }

  test("partitioned read splits into N parallel range queries") {
    val df = spark.range(0, 1000).select(col("id"), (col("id") % 7).as("v"))
    Database.write(df, url, "t_part", ifTableExists = "replace")
    val part = Database.read(spark, url, "t_part",
      partition = Some(("id", 0L, 1000L, 4)))
    assert(part.rdd.getNumPartitions == 4, "JDBC scan must run as 4 range tasks")
    assert(part.count() == 1000)
    assert(part.agg(sum("v")).head().getLong(0) ==
      (0L until 1000L).map(_ % 7).sum)
  }

  test("readQuery pushes the whole statement into the database") {
    // Spark writes quoted (case-sensitive) identifiers — quote them back
    val agg = Database.readQuery(spark, url,
      """SELECT "v", count(*) AS n FROM t_part GROUP BY "v"""")
    assert(agg.count() == 7)
    // only the 7-row result crosses the JDBC boundary: the scan's schema
    // IS the aggregate's schema (no post-aggregation in Spark's plan)
    assert(agg.schema.fieldNames.map(_.toLowerCase).sorted.toSeq == Seq("n", "v"))
    assert(!agg.queryExecution.executedPlan.toString.contains("HashAggregate"))
  }
}
