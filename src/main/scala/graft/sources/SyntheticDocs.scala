package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 example — the Spark-native analogue of the reference's IO
  * plugins (`register_io_source`, SURVEY §2.11): a pluggable scan that
  * Catalyst treats like any table (column pruning, AQE, the lot).
  *
  * This one generates deterministic synthetic documents — (doc_id, text) —
  * split across `partitions` independent input partitions, each generated
  * on its executor from the doc id alone (no driver-side data, no shuffle):
  * the shape a 100 TB-scale custom source must have. Usage:
  * {{{
  *   spark.read.format("graft-docs")
  *     .option("rows", 100000).option("partitions", 64).load()
  * }}}
  */
class SyntheticDocs extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-docs"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticDocs.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SyntheticDocsTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "8").toInt)
}

object SyntheticDocs {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))

  private val vocab: Array[String] =
    ("the quick brown fox jumps over lazy dog data spark engine query scan " +
      "shuffle partition column row table join group window stream batch " +
      "hash sort merge filter project cache spill broadcast skew salt").split(" ")

  /** Deterministic text for a doc id: 64-bit mix seeds length and words.
    * Every 20th id duplicates its predecessor's text, so dedup pipelines
    * over this source find a known ~5% duplicate rate. */
  def textFor(id: Long): UTF8String = {
    val eid = if (id % 20 == 19) id - 1 else id
    var x = eid * 0x9e3779b97f4a7c15L + 0x165667b19e3779f9L
    def next(): Long = { x ^= x >>> 27; x *= 0x3c79ac492ba7b653L; x ^= x >>> 33; x }
    val len = 20 + (Math.floorMod(next(), 80L)).toInt
    val sb = new java.lang.StringBuilder(len * 6)
    var i = 0
    while (i < len) {
      if (i > 0) sb.append(' ')
      sb.append(vocab(Math.floorMod(next(), vocab.length.toLong).toInt))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

class SyntheticDocsTable(rows: Long, partitions: Int) extends Table with SupportsRead {
  override def name(): String = s"graft-docs($rows)"
  override def schema(): StructType = SyntheticDocs.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = SyntheticDocs.schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] = {
        val per = (rows + partitions - 1) / partitions
        (0 until partitions).flatMap { p =>
          val lo = p * per
          val hi = math.min(lo + per, rows)
          if (lo < hi) Some(DocRange(lo, hi): InputPartition) else None
        }.toArray
      }
      override def createReaderFactory(): PartitionReaderFactory = DocReaderFactory
    }
}

case class DocRange(lo: Long, hi: Long) extends InputPartition

object DocReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[DocRange]
    new PartitionReader[InternalRow] {
      private var id = r.lo - 1
      private val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
      override def next(): Boolean = { id += 1; id < r.hi }
      override def get(): InternalRow = {
        row.update(0, id)
        row.update(1, SyntheticDocs.textFor(id))
        row
      }
      override def close(): Unit = ()
    }
  }
}
