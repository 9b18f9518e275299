package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** polars parquet metadata surface (`read_parquet_metadata` — file-level
  * key-value metadata — and `read_parquet_schema`,
  * py-polars/src/polars/io/parquet/functions.py) rebuilt on
  * parquet-hadoop footer reads.
  *
  * Scale shape: footers only — no data pages are touched. The file list
  * resolves on the driver (one listing RPC), then footer decoding fans out
  * one task per file across the cluster, so a 100 TB lake of many files
  * reads its metadata in parallel; nothing here scales with row count.
  * (The RDD hop is the documented per-partition imperative-IO exception:
  * footer decoding is library calls, not a query.)
  */
object ParquetMeta {

  /** Recursive: hive-partitioned datasets nest their part files under
    * key=value directories, and a non-recursive listing would silently
    * return an empty metadata frame where `spark.read.parquet` works. */
  private def listFiles(spark: SparkSession, path: String): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(st: org.apache.hadoop.fs.FileStatus): Seq[String] =
      if (st.isDirectory) fs.listStatus(st.getPath).toSeq.flatMap(walk)
      else if (st.getPath.getName.endsWith(".parquet")) Seq(st.getPath.toString)
      else Nil
    val st = fs.getFileStatus(p)
    val files = if (st.isDirectory) walk(st).sorted else Seq(path)
    require(files.nonEmpty, s"ParquetMeta: no .parquet files under $path")
    files
  }

  private def fanOut(spark: SparkSession, files: Seq[String],
                     schema: StructType)(
      rowsOf: (String, ParquetFileReader) => Iterator[Row]): DataFrame = {
    // ship the session's Hadoop conf to the tasks: a fresh Configuration()
    // would drop spark.hadoop.* settings (s3a credentials/endpoints,
    // fs.defaultFS, kerberos), so remote filesystems would list on the
    // driver and then fail in the executors. Configuration itself is not
    // Serializable — carry its entries as a plain map.
    val confEntries: Array[(String, String)] = {
      import scala.jdk.CollectionConverters._
      spark.sparkContext.hadoopConfiguration.iterator().asScala
        .map(e => e.getKey -> e.getValue).toArray
    }
    val rdd = spark.sparkContext
      .parallelize(files, math.max(1, files.size))
      .flatMap { f =>
        val conf = new Configuration()
        confEntries.foreach { case (k, v) => conf.set(k, v) }
        val in = HadoopInputFile.fromPath(new Path(f), conf)
        val reader = ParquetFileReader.open(in)
        try rowsOf(f, reader).toVector finally reader.close()
      }
    spark.createDataFrame(rdd, schema)
  }

  /** File-level custom key-value metadata (polars `read_parquet_metadata`).
    * Values can be megabytes (pandas/arrow schema JSON blobs), so the
    * frame carries length + md5 alongside the raw value — comparisons
    * and filters stay cheap without losing access to the payload. */
  def kvMetadata(spark: SparkSession, path: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("file", StringType, nullable = false),
      StructField("key", StringType, nullable = false),
      StructField("value", StringType),
      StructField("value_len", LongType, nullable = false),
      StructField("value_md5", StringType)))
    import scala.jdk.CollectionConverters._
    fanOut(spark, listFiles(spark, path), schema) { (file, reader) =>
      reader.getFileMetaData.getKeyValueMetaData.asScala.iterator.map {
        case (k, v) =>
          // length and md5 must describe the SAME payload: UTF-8 bytes
          val bytes = if (v == null) null else v.getBytes("UTF-8")
          val md5 = if (bytes == null) null
            else java.security.MessageDigest.getInstance("MD5")
              .digest(bytes).map("%02x".format(_)).mkString
          Row(file, k, v, if (bytes == null) 0L else bytes.length.toLong, md5)
      }
    }
  }

  /** Row-group structure (the polars `read_parquet_metadata` statistics
    * companion; mirrors DuckDB's `parquet_metadata` row-group columns). */
  def rowGroups(spark: SparkSession, path: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("file", StringType, nullable = false),
      StructField("row_group_id", LongType, nullable = false),
      StructField("num_rows", LongType, nullable = false),
      StructField("num_columns", LongType, nullable = false),
      StructField("total_byte_size", LongType, nullable = false)))
    import scala.jdk.CollectionConverters._
    fanOut(spark, listFiles(spark, path), schema) { (file, reader) =>
      reader.getRowGroups.asScala.iterator.zipWithIndex.map { case (bk, i) =>
        Row(file, i.toLong, bk.getRowCount,
          bk.getColumns.size.toLong, bk.getTotalByteSize)
      }
    }
  }

  /** Leaf-column physical schema (polars `read_parquet_schema`: name →
    * dtype, here with the parquet physical type and repetition). */
  def schemaOf(spark: SparkSession, path: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("file", StringType, nullable = false),
      StructField("name", StringType, nullable = false),
      StructField("physical_type", StringType, nullable = false),
      StructField("max_definition_level", IntegerType, nullable = false),
      StructField("max_repetition_level", IntegerType, nullable = false)))
    import scala.jdk.CollectionConverters._
    fanOut(spark, listFiles(spark, path), schema) { (file, reader) =>
      val msg = reader.getFileMetaData.getSchema
      msg.getPaths.asScala.iterator.map { parts =>
        val cd = msg.getColumnDescription(parts)
        // parquet-java's enum says BINARY where the parquet format spec
        // (and every other reader) says BYTE_ARRAY — emit the spec name
        val pt = cd.getPrimitiveType.getPrimitiveTypeName.toString match {
          case "BINARY" => "BYTE_ARRAY"
          case other    => other
        }
        Row(file, parts.mkString("."), pt,
          cd.getMaxDefinitionLevel, cd.getMaxRepetitionLevel)
      }
    }
  }
}
