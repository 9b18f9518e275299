package graft.testing

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** polars `from_repr` (py-polars/src/polars/convert/general.py:805):
  * reconstruct a frame from its printed table repr — the round-trip makes
  * reprs pasteable as test fixtures. Handles the UTF8 box table (polars
  * default) and the ASCII variant, the `---` header/dtype divider, `null`
  * cells, and truncation markers (`…` rows/columns are dropped, as in the
  * reference). Scalar dtypes only (the reference excludes List/Struct/
  * Object too). Driver-side by design: a repr is human-scale input, never
  * data-scale. */
object FromRepr {

  private val dtypes: Map[String, DataType] = Map(
    "i8" -> ByteType, "i16" -> ShortType, "i32" -> IntegerType,
    "i64" -> LongType, "u8" -> ShortType, "u16" -> IntegerType,
    "u32" -> LongType, "u64" -> DecimalType(20, 0),
    "f32" -> FloatType, "f64" -> DoubleType,
    "str" -> StringType, "bool" -> BooleanType,
    "date" -> DateType, "datetime[μs]" -> TimestampNTZType,
    "datetime[us]" -> TimestampNTZType, "datetime[ms]" -> TimestampNTZType)

  def parse(spark: SparkSession, repr: String): DataFrame = {
    val lines = repr.linesIterator.map(_.trim).filter(_.nonEmpty)
      .filterNot(l => l.startsWith("shape:") || l.matches("^(Out\\[\\d+\\]:?)$"))
      .toVector
    def cells(l: String): Vector[String] =
      l.stripPrefix("│").stripPrefix("|").stripSuffix("│").stripSuffix("|")
        .split("[┆|]").toVector.map(_.trim)
    // the `╞═╪═╡` (or `|=+=|`) rule splits header block from data block;
    // a cell row starts with the vertical bar of its dialect
    def isCellRow(l: String) = l.startsWith("│") || (l.startsWith("|") && !l.startsWith("|="))
    val ruleIdx = lines.indexWhere(l => l.startsWith("╞") || l.startsWith("|="))
    require(ruleIdx > 0, "from_repr: missing header rule line")
    val headRows = lines.take(ruleIdx).filter(isCellRow).map(cells)
    val dataRows = lines.drop(ruleIdx + 1).filter(isCellRow).map(cells)
      .filterNot(_.forall(_ == "…")) // truncation row
    require(headRows.nonEmpty, "from_repr: no header rows found")
    // header cells parse COLUMN-wise: wrapped name fragments until the
    // per-column `---` divider (divider height varies when headers wrap
    // unevenly — see the reference's UTF8_FULL example), then the dtype
    // fragments; fragments join with no separator, matching the unwrap
    val perCol = headRows.head.indices.map(j => headRows.map(_(j)))
    val names = perCol.map { c =>
      if (c.contains("---")) c.take(c.indexOf("---")).mkString else c.mkString
    }
    // a width-truncated repr renders the ellipsis column with `…` as its
    // name and EMPTY divider/dtype cells — only real columns need `---`
    require(perCol.indices.forall(j =>
        names(j) == "…" || perCol(j).contains("---")),
      "from_repr: missing --- divider")
    val dtypeRow = perCol.map(c =>
      if (c.contains("---")) c.drop(c.indexOf("---") + 1).mkString else "")
    // truncation column: a `…` header admits no data — drop that position
    val keep = names.indices.filter(i => names(i) != "…")
    val fields = keep.map { i =>
      val dt = dtypes.getOrElse(dtypeRow(i),
        throw new IllegalArgumentException(
          s"from_repr: unsupported dtype ${dtypeRow(i)}"))
      StructField(names(i), dt)
    }
    val schema = StructType(fields)
    def cast(v: String, dt: DataType): Any =
      if (v == "null" || (v.isEmpty && dt != StringType)) null
      else dt match {
        case ByteType     => v.toByte
        case ShortType    => v.toShort
        case IntegerType  => v.toInt
        case LongType     => v.toLong
        case _: DecimalType => new java.math.BigDecimal(v)
        case FloatType    => v.toFloat
        case DoubleType   => v.toDouble
        case BooleanType  => v.toBoolean
        case DateType     => java.sql.Date.valueOf(v)
        case TimestampNTZType =>
          java.time.LocalDateTime.parse(v.replace(" ", "T"))
        case _            => v
      }
    val parsed = dataRows.map { r =>
      Row.fromSeq(keep.zipWithIndex.map { case (i, k) =>
        cast(r(i), fields(k).dataType)
      })
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(parsed).asJava), schema)
  }
}
