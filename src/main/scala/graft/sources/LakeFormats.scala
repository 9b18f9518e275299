package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Delta Lake / Apache Iceberg scans (reference
  * `py-polars/src/polars/io/delta/functions.py:162` `scan_delta`,
  * `py-polars/src/polars/io/iceberg/functions.py:27` `scan_iceberg`) —
  * the two most common lakehouse sources after raw parquet.
  *
  * Spark reads both natively THROUGH THEIR CONNECTOR JARS (`delta-spark`,
  * `iceberg-spark-runtime`), which are not in this offline container — so
  * the library ships the complete config-level wiring, spec-checked
  * offline, and a scan that activates the moment the jars are present:
  *
  *   - [[deltaWiring]] / [[icebergWiring]] — the exact session confs and
  *     reader options a cluster deploy needs, including the time-travel
  *     options polars exposes (`version`/`timestamp` on scan_delta,
  *     `snapshot_id`/`as_of_timestamp` on scan_iceberg).
  *   - [[deltaAvailable]] / [[icebergAvailable]] — classpath probes.
  *   - [[scanDelta]] / [[scanIceberg]] — the actual reads; on a container
  *     without the jars they raise with the artifact list instead of a
  *     ClassNotFoundException from deep inside the reader.
  */
object LakeFormats {

  /** Session confs + reader format/options for one lakehouse scan. */
  final case class Wiring(sessionConfs: Map[String, String],
                          readerFormat: String,
                          readerOptions: Map[String, String])

  /** Delta Lake wiring. `version`/`timestamp` are polars scan_delta's
    * time-travel arguments → Spark's versionAsOf/timestampAsOf. */
  def deltaWiring(version: Option[Long] = None,
                  timestamp: Option[String] = None): Wiring = Wiring(
    sessionConfs = Map(
      "spark.sql.extensions" -> "io.delta.sql.DeltaSparkSessionExtension",
      "spark.sql.catalog.spark_catalog" ->
        "org.apache.spark.sql.delta.catalog.DeltaCatalog"),
    readerFormat = "delta",
    readerOptions =
      version.map(v => "versionAsOf" -> v.toString).toMap ++
        timestamp.map(t => "timestampAsOf" -> t).toMap)

  /** Iceberg wiring for a path-based (hadoop) catalog. `snapshotId`/
    * `asOfTimestamp` are polars scan_iceberg's pins → Spark's
    * snapshot-id/as-of-timestamp reader options. */
  def icebergWiring(catalogName: String = "graft_iceberg",
                    warehouse: Option[String] = None,
                    snapshotId: Option[Long] = None,
                    asOfTimestamp: Option[Long] = None): Wiring = Wiring(
    sessionConfs = Map(
      "spark.sql.extensions" ->
        "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
      s"spark.sql.catalog.$catalogName" -> "org.apache.iceberg.spark.SparkCatalog",
      s"spark.sql.catalog.$catalogName.type" -> "hadoop") ++
      warehouse.map(w => s"spark.sql.catalog.$catalogName.warehouse" -> w).toMap,
    readerFormat = "iceberg",
    readerOptions =
      snapshotId.map(s => "snapshot-id" -> s.toString).toMap ++
        asOfTimestamp.map(t => "as-of-timestamp" -> t.toString).toMap)

  private def onClasspath(className: String): Boolean =
    try { Class.forName(className); true }
    catch { case _: ClassNotFoundException => false }

  def deltaAvailable: Boolean = onClasspath("io.delta.sql.DeltaSparkSessionExtension")
  def icebergAvailable: Boolean =
    onClasspath("org.apache.iceberg.spark.SparkCatalog")

  /** polars scan_delta. Raises with the artifact coordinates when the
    * connector is absent (offline container) — the wiring itself is what
    * the spec pins. */
  def scanDelta(spark: SparkSession, path: String,
                version: Option[Long] = None,
                timestamp: Option[String] = None): DataFrame = {
    if (!deltaAvailable) throw new IllegalStateException(
      "Delta connector not on the classpath — add io.delta:delta-spark_2.13 " +
        "(plus delta-storage) and set " +
        deltaWiring().sessionConfs.map { case (k, v) => s"$k=$v" }.mkString(", "))
    val w = deltaWiring(version, timestamp)
    w.readerOptions.foldLeft(spark.read.format(w.readerFormat)) {
      case (r, (k, v)) => r.option(k, v)
    }.load(path)
  }

  /** polars scan_iceberg (path-based table). */
  def scanIceberg(spark: SparkSession, path: String,
                  snapshotId: Option[Long] = None,
                  asOfTimestamp: Option[Long] = None): DataFrame = {
    if (!icebergAvailable) throw new IllegalStateException(
      "Iceberg connector not on the classpath — add " +
        "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13 and set " +
        icebergWiring().sessionConfs.map { case (k, v) => s"$k=$v" }.mkString(", "))
    val w = icebergWiring(snapshotId = snapshotId, asOfTimestamp = asOfTimestamp)
    w.readerOptions.foldLeft(spark.read.format(w.readerFormat)) {
      case (r, (k, v)) => r.option(k, v)
    }.load(path)
  }
}
