package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.types.{ExtensionTypes, GeoPoint, GeoPointUDT}

/** Extension dtype contract (dtype.rs:143 → UserDefinedType): the logical
  * type survives expression work and a parquet round-trip, and the storage
  * mapping is the documented struct. */
class ExtensionTypeSpec extends SparkSpec {

  private def pointsDf = {
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("p", new GeoPointUDT())))
    spark.createDataFrame(Seq(
      Row(1L, GeoPoint(48.85, 2.35)),
      Row(2L, GeoPoint(40.71, -74.0)),
      Row(3L, GeoPoint(-33.86, 151.2))).asJava, schema)
  }

  test("UDT column: storage type is the documented struct; values round-trip") {
    ExtensionTypes.register()
    val df = pointsDf
    assert(df.schema("p").dataType.isInstanceOf[GeoPointUDT])
    assert(df.schema("p").dataType.asInstanceOf[GeoPointUDT].sqlType ==
      StructType(Seq(StructField("lat", DoubleType, nullable = false),
        StructField("lon", DoubleType, nullable = false))))
    val got = df.orderBy("id").collect().map(_.getAs[GeoPoint]("p"))
    assert(got.head == GeoPoint(48.85, 2.35))
  }

  test("UDT survives a parquet round-trip with the logical type intact") {
    ExtensionTypes.register()
    val dir = java.nio.file.Files.createTempDirectory("graft-udt").toString
    pointsDf.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema("p").dataType.isInstanceOf[GeoPointUDT],
      s"logical type lost on read: ${back.schema("p").dataType}")
    val southern = back.filter(col("id") === 3L).collect()
      .map(_.getAs[GeoPoint]("p"))
    assert(southern.toSeq == Seq(GeoPoint(-33.86, 151.2)))
  }
}
