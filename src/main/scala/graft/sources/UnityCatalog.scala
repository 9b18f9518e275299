package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Unity-catalog client (reference
  * `crates/polars-io/src/catalog/unity/client.rs:14` `CatalogClient` —
  * `list_catalogs` / `list_namespaces` / `list_tables` / `get_table_info`,
  * workspace URL + bearer token auth; `catalog/unity/schema.rs` for the
  * info structs).
  *
  * Spark's analogue is a catalog PLUGIN, not an HTTP client: the
  * `unitycatalog-spark` connector registers a `spark.sql.catalog.<name>`
  * implementation and the whole surface becomes three-part identifiers +
  * the standard catalog API — listing is `SHOW NAMESPACES/TABLES IN`,
  * scanning is `spark.table("cat.schema.tbl")`, and credential vending
  * (the reference's `get_table_credentials`) happens inside the connector.
  * The connector jar is absent in this offline container, so — like
  * [[LakeFormats]] and [[Spreadsheet]] — the module ships the complete
  * wiring spec-checked offline, probes the classpath, and raises with the
  * artifact coordinates when absent; listings run against ANY registered
  * Spark catalog (spec-driven through the built-in session catalog).
  */
object UnityCatalog {

  /** Session confs registering a Unity workspace as Spark catalog
    * `name` — the polars CatalogClientBuilder arguments map onto the
    * connector's uri/token confs. */
  def wiring(name: String, workspaceUrl: String,
             bearerToken: Option[String] = None): Map[String, String] =
    Map(
      s"spark.sql.catalog.$name" -> "io.unitycatalog.spark.UCSingleCatalog",
      s"spark.sql.catalog.$name.uri" -> workspaceUrl) ++
      bearerToken.map(t => s"spark.sql.catalog.$name.token" -> t).toMap

  def connectorAvailable: Boolean =
    try { Class.forName("io.unitycatalog.spark.UCSingleCatalog"); true }
    catch { case _: ClassNotFoundException => false }

  private def requireConnector(): Unit =
    if (!connectorAvailable) throw new IllegalStateException(
      "Unity-catalog connector not on the classpath — add " +
        "io.unitycatalog:unitycatalog-spark_2.13 and register the catalog " +
        "with UnityCatalog.wiring(name, workspaceUrl, token)")

  /** polars `Catalog.list_catalogs`: every catalog registered in this
    * session (works against any plugin, including the session catalog). */
  def listCatalogs(spark: SparkSession): Seq[String] =
    spark.sql("SHOW CATALOGS").collect().map(_.getString(0)).toSeq

  /** polars `Catalog.list_namespaces(catalog)`. */
  def listNamespaces(spark: SparkSession, catalog: String): Seq[String] =
    spark.sql(s"SHOW NAMESPACES IN `$catalog`")
      .collect().map(_.getString(0)).toSeq

  /** polars `Catalog.list_tables(catalog, namespace)`: (namespace, name)
    * pairs, metadata-only (no scan). */
  def listTables(spark: SparkSession, catalog: String,
                 namespace: String): Seq[(String, String)] =
    spark.sql(s"SHOW TABLES IN `$catalog`.`$namespace`").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq

  /** polars `Catalog.get_table_info`: column name/type/nullable rows from
    * the catalog's own metadata (DESCRIBE stops at the partition-info
    * separator line, matching the reference's column list). */
  def tableInfo(spark: SparkSession, qualified: String): Seq[Row] =
    // stop at the first blank/`#` row: DESCRIBE emits a blank separator row
    // BEFORE "# Partition Information" on partitioned tables, so gating only
    // on '#' would append a spurious empty row to the column list
    spark.sql(s"DESCRIBE TABLE $qualified").collect()
      .takeWhile { r =>
        val c = r.getString(0); c != null && c.trim.nonEmpty && !c.startsWith("#")
      }.toSeq

  /** polars `Catalog.scan_table`: a plain three-part-identifier read —
    * filters and projections push into the connector's DSv2 scan. Any
    * REGISTERED catalog (session catalog, Iceberg/Delta/JDBC plugins, a
    * wired Unity catalog) scans directly; only an UNREGISTERED name with
    * the Unity connector absent raises with the artifact coordinates —
    * the one situation where "add the connector and wire it" is the fix. */
  def scanTable(spark: SparkSession, catalog: String, namespace: String,
                table: String): DataFrame = {
    val registered = catalog == spark.catalog.currentCatalog() ||
      catalog == "spark_catalog" ||
      spark.conf.getOption(s"spark.sql.catalog.$catalog").isDefined
    if (!registered) requireConnector()
    spark.table(s"`$catalog`.`$namespace`.`$table`")
  }
}
