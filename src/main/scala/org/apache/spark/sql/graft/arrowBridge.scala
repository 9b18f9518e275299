package org.apache.spark.sql.graft

import org.apache.arrow.vector.VectorSchemaRoot
import org.apache.arrow.vector.types.pojo.{Schema => ArrowSchema}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.arrow.ArrowWriter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.ArrowUtils

/** Access shim for Spark's `private[sql]` Arrow interop: the canonical
  * Spark ⇄ Arrow schema mapping and the InternalRow → Arrow vector writer
  * (the same machinery Spark's own toArrow/Python-interop paths use).
  * Like [[Bridge]], lives under `org.apache.spark.sql` purely for access. */
object ArrowBridge {

  def toArrowSchema(schema: StructType, timeZoneId: String): ArrowSchema =
    ArrowUtils.toArrowSchema(schema, timeZoneId,
      errorOnDuplicatedFieldNames = true, largeVarTypes = false)

  def fromArrowSchema(schema: ArrowSchema): StructType =
    ArrowUtils.fromArrowSchema(schema)

  /** Row writer into `root`'s vectors; values are copied on write, so
    * reused UnsafeRows from an InternalRow iterator are safe. */
  def rowWriter(root: VectorSchemaRoot): InternalRow => Unit = {
    val w = ArrowWriter.create(root)
    w.write(_)
  }

  /** (writeRow, finishBatch, resetBatch) triple over `root`. */
  def batchWriter(root: VectorSchemaRoot): (InternalRow => Unit, () => Unit, () => Unit) = {
    val w = ArrowWriter.create(root)
    (w.write(_), () => w.finish(), () => w.reset())
  }
}
