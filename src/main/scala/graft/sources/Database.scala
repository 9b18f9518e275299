package graft.sources

import java.util.Properties
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC database source/sink (reference
  * `py-polars/src/polars/io/database/` `read_database`/`read_database_uri`
  * and `DataFrame.write_database`). polars executes one cursor and pulls
  * rows through connectorx/ADBC; the Spark-native story is
  * `spark.read.jdbc`, where the 100 TB-relevant difference is PARTITIONED
  * reads — `partitionColumn/lowerBound/upperBound/numPartitions` turn one
  * serial cursor into N parallel range queries, one per task. [[read]]
  * surfaces exactly that switch; [[readQuery]] maps polars' arbitrary-SQL
  * form (pushes the whole statement to the database as a derived table);
  * [[write]] maps write_database's if_table_exists to SaveMode.
  *
  * Spec'd offline against embedded Derby (on the Spark classpath); any
  * JDBC url + driver jar works the same way on a cluster.
  */
object Database {

  private def props(options: Map[String, String]): Properties = {
    val p = new Properties()
    options.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  /** polars read_database over a table. `partition` = (column, lower,
    * upper, numPartitions) splits the scan into parallel range queries —
    * always set it for big tables; without it the read is one task. */
  def read(spark: SparkSession, url: String, table: String,
           options: Map[String, String] = Map.empty,
           partition: Option[(String, Long, Long, Int)] = None): DataFrame =
    partition match {
      case Some((col, lo, hi, n)) =>
        spark.read.jdbc(url, table, col, lo, hi, n, props(options))
      case None => spark.read.jdbc(url, table, props(options))
    }

  /** polars read_database with an arbitrary SQL query: pushed down whole
    * as a derived table, so filters/aggregations in `sql` run inside the
    * database and only the result crosses the wire. */
  def readQuery(spark: SparkSession, url: String, sql: String,
                options: Map[String, String] = Map.empty): DataFrame =
    spark.read.jdbc(url, s"($sql) graft_q", props(options))

  /** polars write_database. `ifTableExists`: "fail" | "append" |
    * "replace" (the reference's options) → SaveMode. */
  def write(df: DataFrame, url: String, table: String,
            ifTableExists: String = "fail",
            options: Map[String, String] = Map.empty): Unit = {
    val mode = ifTableExists match {
      case "fail"    => SaveMode.ErrorIfExists
      case "append"  => SaveMode.Append
      case "replace" => SaveMode.Overwrite
      case other => throw new IllegalArgumentException(
        s"if_table_exists must be fail|append|replace, got $other")
    }
    df.write.mode(mode).jdbc(url, table, props(options))
  }
}
