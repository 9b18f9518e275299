package graft

import graft.sources.UnityCatalog

/** Unity-catalog surface: the wiring contract pinned offline (connector
  * jar absent by design), and the listing/info/scan paths driven live
  * against the built-in session catalog — the same code paths a Unity
  * plugin serves once registered. */
class UnityCatalogSpec extends SparkSpec {

  test("wiring: catalog plugin confs from workspace url + token") {
    assert(UnityCatalog.wiring("uc", "https://ws.example:8080/api/2.1/unity-catalog",
      Some("tok")) == Map(
      "spark.sql.catalog.uc" -> "io.unitycatalog.spark.UCSingleCatalog",
      "spark.sql.catalog.uc.uri" -> "https://ws.example:8080/api/2.1/unity-catalog",
      "spark.sql.catalog.uc.token" -> "tok"))
    assert(!UnityCatalog.wiring("uc", "u").contains("spark.sql.catalog.uc.token"))
  }

  test("offline container: probe reports absent, foreign-catalog scan raises") {
    assert(!UnityCatalog.connectorAvailable)
    val e = intercept[IllegalStateException](
      UnityCatalog.scanTable(spark, "some_uc", "s", "t"))
    assert(e.getMessage.contains("io.unitycatalog:unitycatalog-spark"))
  }

  test("listing + info + scan run against any registered catalog") {
    import spark.implicits._
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_uc_ns")
    spark.sql("DROP TABLE IF EXISTS graft_uc_ns.uc_t")
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .write.mode("overwrite").saveAsTable("graft_uc_ns.uc_t")
    val cat = spark.catalog.currentCatalog()
    assert(UnityCatalog.listCatalogs(spark).contains(cat))
    assert(UnityCatalog.listNamespaces(spark, cat).contains("graft_uc_ns"))
    assert(UnityCatalog.listTables(spark, cat, "graft_uc_ns")
      .exists(_._2 == "uc_t"))
    val info = UnityCatalog.tableInfo(spark, s"$cat.graft_uc_ns.uc_t")
    assert(info.map(_.getString(0)).toSet == Set("id", "s"))
    assert(UnityCatalog.scanTable(spark, cat, "graft_uc_ns", "uc_t").count() == 2)
    spark.sql("DROP TABLE graft_uc_ns.uc_t")
    spark.sql("DROP DATABASE graft_uc_ns")
  }
}
