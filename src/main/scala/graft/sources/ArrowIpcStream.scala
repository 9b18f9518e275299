package graft.sources

import java.util

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.VectorSchemaRoot
import org.apache.arrow.vector.ipc.{ArrowStreamReader, ArrowStreamWriter}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.graft.ArrowBridge
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.{ArrowColumnVector, ColumnVector, ColumnarBatch}

/** Arrow IPC STREAM format (polars `write_ipc_stream` / `read_ipc_stream`,
  * reference `py-polars/src/polars/io/ipc/functions.py` stream variants) —
  * the footer-less framing used for pipes and sockets, as a second DSv2
  * connector beside the file-format [[ArrowIpcSource]].
  *
  * Scale shape: a stream file has NO footer/block index, so it cannot be
  * split — the reader plans ONE input partition per file and iterates its
  * batches sequentially (each still surfaced zero-copy as a columnar
  * [[ArrowColumnVector]] batch). Parallelism therefore equals the file
  * count; the writer emits one file per upstream partition, so a
  * write-then-read round trip preserves cluster parallelism. That is the
  * honest contract for this format — anyone needing splittable scans
  * should sink the file format (graft-ipc) instead, and the scaladoc of
  * both connectors says so.
  */
class ArrowIpcStreamSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-ipc-stream"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val files = ArrowIpcStream.listFiles(options.get("path"))
    require(files.nonEmpty, s"no .arrows files under ${options.get("path")}")
    ArrowIpcStream.withReader(files.head) { r =>
      ArrowBridge.fromArrowSchema(r.getVectorSchemaRoot.getSchema)
    }
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ArrowIpcStreamTable(properties.get("path"), schema)
}

class ArrowIpcStreamTable(path: String, tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft-ipc-stream($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch with SupportsPushDownRequiredColumns {
      private var required: StructType = tableSchema

      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def build(): Scan = this
      override def readSchema(): StructType = required
      override def toBatch: Batch = this

      /** One partition per FILE: the stream framing has no block index to
        * split on (see class scaladoc). */
      override def planInputPartitions(): Array[InputPartition] =
        ArrowIpcStream.listFiles(path)
          .map(f => IpcStreamFile(f): InputPartition).toArray

      override def createReaderFactory(): PartitionReaderFactory =
        new IpcStreamReaderFactory(required.fieldNames)
    }
}

case class IpcStreamFile(file: String) extends InputPartition

class IpcStreamReaderFactory(columns: Array[String]) extends PartitionReaderFactory {
  override def supportColumnarReads(partition: InputPartition): Boolean = true

  override def createColumnarReader(p: InputPartition): PartitionReader[ColumnarBatch] = {
    val ip = p.asInstanceOf[IpcStreamFile]
    new PartitionReader[ColumnarBatch] {
      private var reader: ArrowStreamReader = _
      private var in: java.io.InputStream = _
      private var allocator: RootAllocator = _

      override def next(): Boolean = {
        if (reader == null) {
          allocator = new RootAllocator(Long.MaxValue)
          in = ArrowIpcStream.openStream(ip.file)
          reader = new ArrowStreamReader(in, allocator)
        }
        reader.loadNextBatch()
      }

      override def get(): ColumnarBatch = {
        val root = reader.getVectorSchemaRoot
        val vecs: Array[ColumnVector] =
          columns.map(c => new ArrowColumnVector(root.getVector(c)): ColumnVector)
        new ColumnarBatch(vecs, root.getRowCount)
      }

      override def close(): Unit = {
        if (reader != null) reader.close()
        if (in != null) in.close()
        if (allocator != null) allocator.close()
      }
    }
  }

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    IpcCommon.rowFallback(createColumnarReader(p))
}

object ArrowIpcStream {

  /** Distributed IPC-stream sink: each non-empty partition streams to its
    * own `part-NNNNN.arrows` in `batchRows`-row record batches — identical
    * memory/shuffle posture to [[ArrowIpc.write]] (shared
    * [[IpcCommon.writeLoop]]), different framing. */
  def writeStream(df: DataFrame, dir: String, batchRows: Int = 4096): Unit =
    IpcCommon.writeLoop(df, dir, "arrows", batchRows)(
      (root, ch) => new ArrowStreamWriter(root, null, ch))

  private[sources] def listFiles(path: String): Seq[String] =
    IpcCommon.listFiles(path, ".arrows")

  private[sources] def openStream(file: String): java.io.InputStream = {
    val p = new Path(file)
    val fs = p.getFileSystem(new Configuration())
    fs.open(p)
  }

  private[sources] def withReader[A](file: String)(f: ArrowStreamReader => A): A = {
    val allocator = new RootAllocator(Long.MaxValue)
    val in = openStream(file)
    val r = new ArrowStreamReader(in, allocator)
    try f(r) finally { r.close(); in.close(); allocator.close() }
  }
}
