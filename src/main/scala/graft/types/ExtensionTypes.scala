package graft.types

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Extension dtype (reference `crates/polars-core/src/datatypes/dtype.rs:143`
  * `Extension(instance, storage)`: a NAMED logical type riding on a physical
  * storage type, preserved through IO). Spark's native analogue is
  * `UserDefinedType`: the storage type is `sqlType`, the name/class ride in
  * the schema metadata, and parquet round-trips reconstruct the logical
  * type. [[GeoPoint]] is the shipped example instance — a logical point
  * stored as `struct<lat:double, lon:double>` — and the pattern for any
  * further extension type: subclass UserDefinedType, register via
  * [[ExtensionTypes.register]], and every frame/sink/scan in the library
  * handles the column like any other.
  */
case class GeoPoint(lat: Double, lon: Double)

class GeoPointUDT extends UserDefinedType[GeoPoint] {
  override def sqlType: DataType = StructType(Seq(
    StructField("lat", DoubleType, nullable = false),
    StructField("lon", DoubleType, nullable = false)))

  override def serialize(p: GeoPoint): InternalRow =
    new GenericInternalRow(Array[Any](p.lat, p.lon))

  override def deserialize(datum: Any): GeoPoint = datum match {
    case r: InternalRow => GeoPoint(r.getDouble(0), r.getDouble(1))
    case other => throw new IllegalArgumentException(
      s"cannot deserialize $other to GeoPoint")
  }

  override def userClass: Class[GeoPoint] = classOf[GeoPoint]
  override def typeName: String = "geopoint"
}

object ExtensionTypes {
  /** Register the shipped extension types with Spark's UDT registry (safe
    * to call repeatedly). After this, encoders and schema resolution find
    * the UDT for the user class automatically. */
  def register(): Unit =
    UDTRegistration.register(classOf[GeoPoint].getName, classOf[GeoPointUDT].getName)
}
