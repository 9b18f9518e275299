package graft.sources

import java.nio.channels.{Channels, WritableByteChannel}

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.VectorSchemaRoot
import org.apache.arrow.vector.ipc.ArrowWriter
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.graft.ArrowBridge
import org.apache.spark.sql.vectorized.ColumnarBatch

/** Shared plumbing of the two Arrow IPC connectors (file + stream): the
  * distributed batch-streamed write loop, extension-filtered file
  * listing, and the row-based reader fallback. Factored so a fix lands
  * in both framings at once (the review that created this file caught
  * the row fallback dropping batches after an empty one — only here,
  * where both connectors now get the loop). */
private[sources] object IpcCommon {

  /** Per-partition write loop: each non-empty partition streams to its
    * own `part-NNNNN.<ext>` in `batchRows`-row record batches through
    * whatever [[ArrowWriter]] framing `mkWriter` builds. Memory per task
    * is one batch of vectors; nothing touches the driver. */
  def writeLoop(df: DataFrame, dir: String, ext: String, batchRows: Int)
               (mkWriter: (VectorSchemaRoot, WritableByteChannel) => ArrowWriter): Unit = {
    val schema = df.schema
    val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    val out = new Path(dir)
    val fs = out.getFileSystem(new Configuration())
    fs.delete(out, true)
    fs.mkdirs(out)
    df.queryExecution.toRdd.foreachPartition { iter: Iterator[InternalRow] =>
      if (iter.hasNext) {
        val pid = TaskContext.getPartitionId()
        val path = new Path(dir, f"part-$pid%05d.$ext")
        val pfs = path.getFileSystem(new Configuration())
        val os = pfs.create(path, true)
        val allocator = new RootAllocator(Long.MaxValue)
        val root = VectorSchemaRoot.create(ArrowBridge.toArrowSchema(schema, tz), allocator)
        val (writeRow, finishBatch, resetBatch) = ArrowBridge.batchWriter(root)
        val writer = mkWriter(root, Channels.newChannel(os))
        try {
          writer.start()
          var n = 0
          while (iter.hasNext) {
            writeRow(iter.next())
            n += 1
            if (n == batchRows) {
              finishBatch(); writer.writeBatch(); resetBatch(); n = 0
            }
          }
          if (n > 0) { finishBatch(); writer.writeBatch() }
          writer.end()
        } finally {
          writer.close(); root.close(); allocator.close(); os.close()
        }
      }
    }
  }

  def listFiles(path: String, ext: String): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    val st = fs.getFileStatus(p)
    if (st.isDirectory)
      fs.listStatus(p).toSeq.map(_.getPath)
        .filter(_.getName.endsWith(ext)).sortBy(_.getName).map(_.toString)
    else Seq(path)
  }

  /** Row-based fallback over a columnar reader. Loops past ZERO-ROW
    * batches: `rowIterator().hasNext` of an empty batch is false, and a
    * naive `columnar.next() && hasNext` would end the partition there,
    * silently dropping every later batch of the stream. */
  def rowFallback(columnar: PartitionReader[ColumnarBatch]): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var rows: java.util.Iterator[InternalRow] =
        java.util.Collections.emptyIterator()
      override def next(): Boolean = {
        while (!rows.hasNext) {
          if (!columnar.next()) return false
          rows = columnar.get().rowIterator()
        }
        true
      }
      override def get(): InternalRow = rows.next()
      override def close(): Unit = columnar.close()
    }
}
