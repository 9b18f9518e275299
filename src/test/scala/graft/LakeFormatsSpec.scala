package graft

import graft.sources.LakeFormats

/** Config-level Delta/Iceberg contract: the exact session confs and reader
  * options a cluster deploy needs, pinned offline (the connector jars are
  * absent in this container by design — the probes and raise paths are
  * part of the contract). */
class LakeFormatsSpec extends SparkSpec {

  test("delta wiring: extension + catalog confs, time-travel reader options") {
    val w = LakeFormats.deltaWiring(version = Some(12L))
    assert(w.sessionConfs == Map(
      "spark.sql.extensions" -> "io.delta.sql.DeltaSparkSessionExtension",
      "spark.sql.catalog.spark_catalog" ->
        "org.apache.spark.sql.delta.catalog.DeltaCatalog"))
    assert(w.readerFormat == "delta")
    assert(w.readerOptions == Map("versionAsOf" -> "12"))
    assert(LakeFormats.deltaWiring(timestamp = Some("2024-01-01")).readerOptions ==
      Map("timestampAsOf" -> "2024-01-01"))
  }

  test("iceberg wiring: extension + hadoop catalog confs, snapshot pins") {
    val w = LakeFormats.icebergWiring(catalogName = "lake",
      warehouse = Some("s3a://bkt/wh"), snapshotId = Some(99L))
    assert(w.sessionConfs == Map(
      "spark.sql.extensions" ->
        "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
      "spark.sql.catalog.lake" -> "org.apache.iceberg.spark.SparkCatalog",
      "spark.sql.catalog.lake.type" -> "hadoop",
      "spark.sql.catalog.lake.warehouse" -> "s3a://bkt/wh"))
    assert(w.readerFormat == "iceberg")
    assert(w.readerOptions == Map("snapshot-id" -> "99"))
  }

  test("offline container: probes report absent, scans raise with the artifact list") {
    assert(!LakeFormats.deltaAvailable && !LakeFormats.icebergAvailable,
      "this container ships no lakehouse jars; if one appears, wire a live scan spec")
    val de = intercept[IllegalStateException](
      LakeFormats.scanDelta(spark, "/tmp/none"))
    assert(de.getMessage.contains("delta-spark") &&
      de.getMessage.contains("DeltaSparkSessionExtension"))
    val ie = intercept[IllegalStateException](
      LakeFormats.scanIceberg(spark, "/tmp/none"))
    assert(ie.getMessage.contains("iceberg-spark-runtime"))
  }
}
