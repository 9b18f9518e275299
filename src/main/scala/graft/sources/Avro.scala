package graft.sources

import java.nio.ByteBuffer
import java.util

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.avro.util.Utf8
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Avro container-file source + sink (reference `crates/polars-io/src/avro/`),
  * built as a DataSourceV2 connector directly on the avro-core classes Spark
  * ships (`avro-1.12.1.jar` — the spark-avro external module is absent in
  * this container, so the connector speaks the container format itself).
  *
  * Scale shape: the WRITER streams each upstream partition to its own
  * `part-NNNNN.avro` (bounded memory, no driver collect, no shuffle). The
  * READER plans byte-range splits per file (`maxSplitBytes`, default 32 MiB)
  * and aligns each split to the container's sync markers — `reader.sync
  * (start)` / `pastSync(end)` — exactly how a 1000-executor cluster fans out
  * over a 100 TB Avro lake. Column pruning rides Avro schema resolution: the
  * reader schema is the pruned projection, so non-requested fields are
  * skip-decoded, never materialized.
  *
  * Type mapping (both directions): boolean/int/long/float/double/string/
  * bytes, timestamp-micros ↔ TimestampType (millis widened on read), date ↔
  * DateType, array ↔ ArrayType, map(string→v) ↔ MapType, record ↔
  * StructType, nullability ↔ union(null, T). Unsupported Avro branches
  * (multi-branch unions, fixed, decimal) raise with the offending field name
  * rather than mis-reading.
  *
  * Usage:
  * {{{
  *   Avro.write(df, "/path/dir")                         // part-*.avro files
  *   spark.read.format("graft-avro").load("/path/dir")
  * }}}
  */
class AvroSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-avro"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val files = Avro.listFiles(options.get("path"))
    require(files.nonEmpty, s"no .avro files under ${options.get("path")}")
    Avro.toSparkSchema(Avro.fileSchema(files.head))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new AvroTable(properties.get("path"), schema)
}

class AvroTable(path: String, tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft-avro($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch with SupportsPushDownRequiredColumns {
      private var required: StructType = tableSchema
      private val maxSplitBytes =
        Option(options.get("maxSplitBytes")).map(_.toLong).getOrElse(32L << 20)

      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def build(): Scan = this
      override def readSchema(): StructType = required
      override def toBatch: Batch = this

      /** Byte-range splits; the reader aligns each to the next sync marker,
        * so ranges never tear a block and every block lands in exactly one
        * split (the split containing its first post-sync byte). */
      override def planInputPartitions(): Array[InputPartition] =
        Avro.listFilesWithLen(path).flatMap { case (f, len) =>
          (0L until math.max(len, 1L) by maxSplitBytes).map { start =>
            AvroSplit(f, start, math.min(start + maxSplitBytes, len)): InputPartition
          }
        }.toArray

      override def createReaderFactory(): PartitionReaderFactory =
        new AvroReaderFactory(required)
    }
}

case class AvroSplit(file: String, start: Long, end: Long) extends InputPartition

class AvroReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val split = p.asInstanceOf[AvroSplit]
    new PartitionReader[InternalRow] {
      private val in = new FsInput(new Path(split.file), new Configuration())
      private val writerSchema = Avro.fileSchema(split.file)
      // pruned reader schema → Avro schema resolution skip-decodes the rest
      private val readerSchema = Avro.projectSchema(writerSchema, required)
      private val reader = new DataFileReader[GenericRecord](
        in, new GenericDatumReader[GenericRecord](writerSchema, readerSchema))
      reader.sync(split.start)
      private val fromAvro = Avro.avroToRow(readerSchema, required)
      private var row: InternalRow = _

      override def next(): Boolean =
        reader.hasNext && !reader.pastSync(split.end) && {
          row = fromAvro(reader.next()); true
        }
      override def get(): InternalRow = row
      override def close(): Unit = { reader.close(); in.close() }
    }
  }
}

object Avro {

  /** Distributed Avro sink: each non-empty partition streams to its own
    * `part-NNNNN.avro`. Memory per task is one record; nothing touches the
    * driver. `syncInterval` bounds block size (smaller → more read splits). */
  def write(df: DataFrame, dir: String, syncInterval: Int = 64 * 1024): Unit = {
    val schema = df.schema
    val out = new Path(dir)
    val fs = out.getFileSystem(new Configuration())
    fs.delete(out, true)
    fs.mkdirs(out)
    df.queryExecution.toRdd.foreachPartition { iter: Iterator[InternalRow] =>
      if (iter.hasNext) {
        val pid = TaskContext.getPartitionId()
        val path = new Path(dir, f"part-$pid%05d.avro")
        val pfs = path.getFileSystem(new Configuration())
        val os = pfs.create(path, true)
        val avroSchema = toAvroSchema(schema)
        val writer = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](avroSchema))
        writer.setSyncInterval(syncInterval)
        val toAvro = rowToAvro(schema, avroSchema)
        try {
          writer.create(avroSchema, os)
          while (iter.hasNext) writer.append(toAvro(iter.next()))
        } finally writer.close() // closes os
      }
    }
  }

  // ---- schema conversion ------------------------------------------------

  private[sources] def toAvroSchema(st: StructType): Schema = {
    val fields = st.fields.map { f =>
      val base = toAvroType(f.dataType, f.name)
      val t = if (f.nullable) Schema.createUnion(
        util.Arrays.asList(Schema.create(Schema.Type.NULL), base)) else base
      new Schema.Field(f.name, t, null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord("spark_record", null, "graft.avro", false, fields.toList.asJava)
  }

  private def toAvroType(dt: DataType, name: String): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case TimestampNTZType =>
      LogicalTypes.localTimestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case DateType =>
      LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case ArrayType(et, containsNull) =>
      val e = toAvroType(et, name)
      Schema.createArray(if (containsNull) Schema.createUnion(
        util.Arrays.asList(Schema.create(Schema.Type.NULL), e)) else e)
    case MapType(StringType, vt, valueContainsNull) =>
      val v = toAvroType(vt, name)
      Schema.createMap(if (valueContainsNull) Schema.createUnion(
        util.Arrays.asList(Schema.create(Schema.Type.NULL), v)) else v)
    case st: StructType =>
      val fields = st.fields.map { f =>
        val base = toAvroType(f.dataType, f.name)
        val t = if (f.nullable) Schema.createUnion(
          util.Arrays.asList(Schema.create(Schema.Type.NULL), base)) else base
        new Schema.Field(f.name, t, null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
      }
      Schema.createRecord(s"${name}_record", null, "graft.avro", false, fields.toList.asJava)
    case other => throw new IllegalArgumentException(
      s"graft-avro: unsupported Spark type $other for field $name")
  }

  private[sources] def toSparkSchema(s: Schema): StructType = {
    require(s.getType == Schema.Type.RECORD,
      s"graft-avro: top-level Avro schema must be a record, got ${s.getType}")
    StructType(s.getFields.asScala.map { f =>
      val (dt, nullable) = toSparkType(f.schema(), f.name())
      StructField(f.name(), dt, nullable)
    }.toArray)
  }

  private def toSparkType(s: Schema, name: String): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1,
        s"graft-avro: field $name has a multi-branch union — unsupported")
      (toSparkType(nonNull.head, name)._1, true)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.INT =>
      (if (s.getLogicalType.isInstanceOf[LogicalTypes.Date]) DateType else IntegerType, false)
    case Schema.Type.LONG => s.getLogicalType match {
      case _: LogicalTypes.TimestampMicros | _: LogicalTypes.TimestampMillis =>
        (TimestampType, false)
      case _: LogicalTypes.LocalTimestampMicros | _: LogicalTypes.LocalTimestampMillis =>
        (TimestampNTZType, false)
      case _ => (LongType, false)
    }
    case Schema.Type.FLOAT => (FloatType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.STRING | Schema.Type.ENUM => (StringType, false)
    case Schema.Type.BYTES => (BinaryType, false)
    case Schema.Type.ARRAY =>
      val (et, n) = toSparkType(s.getElementType, name)
      (ArrayType(et, n), false)
    case Schema.Type.MAP =>
      val (vt, n) = toSparkType(s.getValueType, name)
      (MapType(StringType, vt, n), false)
    case Schema.Type.RECORD =>
      (toSparkSchema(s), false)
    case other => throw new IllegalArgumentException(
      s"graft-avro: unsupported Avro type $other for field $name")
  }

  /** Reader schema = the writer record restricted to `required`'s fields
    * (schema resolution then skip-decodes everything else). */
  private[sources] def projectSchema(writer: Schema, required: StructType): Schema = {
    val keep = required.fieldNames.toSet
    val fields = writer.getFields.asScala.filter(f => keep(f.name())).map { f =>
      new Schema.Field(f.name(), f.schema(), f.doc(), f.defaultVal())
    }
    Schema.createRecord(writer.getName, null, writer.getNamespace, false,
      fields.toList.asJava)
  }

  // ---- value conversion -------------------------------------------------

  /** Unwrap union(null, T) → T (field schemas as written by toAvroSchema). */
  private def nonNull(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  private[sources] def rowToAvro(st: StructType, avro: Schema): InternalRow => GenericRecord = {
    val getters = st.fields.zipWithIndex.map { case (f, i) =>
      // converters carry the EXACT field schema from `avro` — nested records
      // must reuse it (union resolution matches records by full name)
      val conv = toAvroValue(f.dataType, nonNull(avro.getFields.get(i).schema()))
      (row: InternalRow) => if (row.isNullAt(i)) null else conv(row.get(i, f.dataType))
    }
    row => {
      val rec = new GenericData.Record(avro)
      var i = 0
      while (i < getters.length) { rec.put(i, getters(i)(row)); i += 1 }
      rec
    }
  }

  private def toAvroValue(dt: DataType, schema: Schema): Any => Any = dt match {
    case StringType => v => v.toString
    case BinaryType => v => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
    case ArrayType(et, _) =>
      val conv = toAvroValue(et, nonNull(schema.getElementType))
      v => {
        val arr = v.asInstanceOf[ArrayData]
        val out = new util.ArrayList[Any](arr.numElements())
        var i = 0
        while (i < arr.numElements()) {
          out.add(if (arr.isNullAt(i)) null else conv(arr.get(i, et))); i += 1
        }
        out
      }
    case MapType(StringType, vt, _) =>
      val conv = toAvroValue(vt, nonNull(schema.getValueType))
      v => {
        val m = v.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
        val out = new util.HashMap[String, Any](m.numElements())
        val ks = m.keyArray(); val vs = m.valueArray()
        var i = 0
        while (i < m.numElements()) {
          out.put(ks.getUTF8String(i).toString,
            if (vs.isNullAt(i)) null else conv(vs.get(i, vt)))
          i += 1
        }
        out
      }
    case st: StructType =>
      val conv = rowToAvro(st, schema)
      v => conv(v.asInstanceOf[InternalRow])
    case ShortType => v => v.asInstanceOf[Short].toInt
    case ByteType => v => v.asInstanceOf[Byte].toInt
    case _ => identity // int/long/float/double/boolean/timestamp-µs/date pass through
  }

  private[sources] def avroToRow(reader: Schema, required: StructType): GenericRecord => InternalRow = {
    // field order follows the READER schema projection, which preserves
    // writer order — map it back to the required (Spark) column order
    val idx = required.fieldNames.zipWithIndex.toMap
    val fields = reader.getFields.asScala.map { f =>
      val sparkField = required(idx(f.name()))
      (f.name(), idx(f.name()), fromAvroValue(f.schema(), sparkField.dataType))
    }.toArray
    rec => {
      val out = new Array[Any](required.size)
      fields.foreach { case (name, i, conv) =>
        val v = rec.get(name)
        out(i) = if (v == null) null else conv(v)
      }
      new GenericInternalRow(out)
    }
  }

  private def fromAvroValue(s: Schema, dt: DataType): Any => Any = {
    val schema = if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get else s
    dt match {
      case StringType => v => UTF8String.fromString(v.toString)
      case BinaryType => v => {
        val bb = v.asInstanceOf[ByteBuffer]
        val bytes = new Array[Byte](bb.remaining()); bb.duplicate().get(bytes); bytes
      }
      case TimestampType =>
        if (schema.getLogicalType.isInstanceOf[LogicalTypes.TimestampMillis])
          v => v.asInstanceOf[Long] * 1000L
        else identity
      case ArrayType(et, _) =>
        val conv = fromAvroValue(schema.getElementType, et)
        v => {
          val list = v.asInstanceOf[util.Collection[Any]].asScala
          new GenericArrayData(list.map(e => if (e == null) null else conv(e)).toArray)
        }
      case MapType(StringType, vt, _) =>
        val conv = fromAvroValue(schema.getValueType, vt)
        v => {
          val m = v.asInstanceOf[util.Map[Any, Any]].asScala
          val keys = new Array[Any](m.size); val vals = new Array[Any](m.size)
          var i = 0
          m.foreach { case (k, value) =>
            keys(i) = UTF8String.fromString(k.toString)
            vals(i) = if (value == null) null else conv(value)
            i += 1
          }
          ArrayBasedMapData(keys, vals)
        }
      case st: StructType =>
        val conv = avroToRow(schema, st)
        v => conv(v.asInstanceOf[GenericRecord])
      case _ => identity // int/long/float/double/boolean/date pass through
    }
  }

  // ---- file listing -----------------------------------------------------

  private[sources] def fileSchema(file: String): Schema = {
    val in = new FsInput(new Path(file), new Configuration())
    val r = new DataFileReader[GenericRecord](in, new GenericDatumReader[GenericRecord]())
    try r.getSchema finally { r.close(); in.close() }
  }

  private[sources] def listFiles(path: String): Seq[String] =
    listFilesWithLen(path).map(_._1)

  private[sources] def listFilesWithLen(path: String): Seq[(String, Long)] = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    val st = fs.getFileStatus(p)
    if (st.isDirectory)
      fs.listStatus(p).toSeq.filter(_.getPath.getName.endsWith(".avro"))
        .sortBy(_.getPath.getName).map(s => (s.getPath.toString, s.getLen))
    else Seq((path, st.getLen))
  }
}
