package graft

import graft.sources.Spreadsheet

/** Config-level Excel contract, same shape as LakeFormatsSpec: the
  * spark-excel option mapping is pinned offline (the connector jar is
  * absent in this container by design — the probe and raise paths are
  * part of the contract). */
class SpreadsheetSpec extends SparkSpec {

  test("read wiring: sheet/table address, header, infer-schema mapping") {
    assert(Spreadsheet.readWiring(sheetName = Some("Sales Q1")) == Map(
      "header" -> "true", "dataAddress" -> "'Sales Q1'!A1",
      "inferSchema" -> "true", "excerptSize" -> "100"))
    assert(Spreadsheet.readWiring(tableName = Some("t_orders"),
      hasHeader = false, inferSchemaLength = None) == Map(
      "header" -> "false", "dataAddress" -> "t_orders[#All]",
      "inferSchema" -> "false"))
    assert(Spreadsheet.readWiring() ==
      Map("header" -> "true", "inferSchema" -> "true", "excerptSize" -> "100"))
    intercept[IllegalArgumentException](
      Spreadsheet.readWiring(sheetName = Some("a"), tableName = Some("b")))
  }

  test("write wiring: sheet positioning + header toggle") {
    assert(Spreadsheet.writeWiring(sheetName = Some("out")) ==
      Map("header" -> "true", "dataAddress" -> "'out'!A1"))
    assert(Spreadsheet.writeWiring(includeHeader = false) ==
      Map("header" -> "false"))
  }

  test("offline container: probe reports absent, read/write raise with coordinates") {
    assert(!Spreadsheet.excelAvailable,
      "this container ships no spark-excel jar; if one appears, wire a live round-trip spec")
    val re = intercept[IllegalStateException](
      Spreadsheet.readExcel(spark, "/tmp/none.xlsx"))
    assert(re.getMessage.contains("com.crealytics:spark-excel"))
    val we = intercept[IllegalStateException](
      Spreadsheet.writeExcel(spark.range(1).toDF(), "/tmp/none.xlsx"))
    assert(we.getMessage.contains("com.crealytics:spark-excel"))
  }
}
