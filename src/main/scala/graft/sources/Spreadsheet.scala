package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Excel read/write (reference
  * `py-polars/src/polars/io/spreadsheet/functions.py:118` `read_excel`,
  * `py-polars/src/polars/dataframe/frame.py` `write_excel`) — the
  * spreadsheet surface real users hit weekly.
  *
  * Spark reads xlsx THROUGH the spark-excel connector
  * (`com.crealytics:spark-excel`), which is not in this offline
  * container — same situation as [[LakeFormats]], handled the same way:
  * the complete option-mapping ships and is spec-checked offline, the
  * classpath probe activates the real read/write the moment the jar is
  * present, and a missing connector raises with the artifact coordinates
  * instead of a ClassNotFoundException from inside the DataSource
  * resolver.
  *
  * Argument mapping (polars → spark-excel reader/writer options):
  *   - `sheet_name`    → `dataAddress` `'<name>'!A1` (sheet_id has no
  *     direct analogue — resolve the name first; polars itself reads
  *     sheet ids by position through its engines)
  *   - `table_name`    → `dataAddress` `<name>[#All]` (named table)
  *   - `has_header`    → `header`
  *   - `infer_schema_length` → `inferSchema` + `excerptSize`
  *   - `drop_empty_rows` has no connector toggle → post-filter
  *     (`na.drop("all")` is the exact semantic)
  *   - `columns` subset → plain `.select` after the scan (pruned before
  *     any shuffle; the connector reads cell ranges, not columns)
  *   - `raise_if_empty` → checked after the read
  */
object Spreadsheet {

  /** Reader options for one polars-style read_excel call. */
  def readWiring(sheetName: Option[String] = None,
                 tableName: Option[String] = None,
                 hasHeader: Boolean = true,
                 inferSchemaLength: Option[Int] = Some(100)): Map[String, String] = {
    require(sheetName.isEmpty || tableName.isEmpty,
      "sheet_name and table_name are mutually exclusive (as in polars)")
    val address = tableName.map(t => s"$t[#All]")
      .orElse(sheetName.map(n => s"'$n'!A1"))
    Map("header" -> hasHeader.toString) ++
      address.map("dataAddress" -> _).toMap ++
      (inferSchemaLength match {
        case Some(n) => Map("inferSchema" -> "true", "excerptSize" -> n.toString)
        case None    => Map("inferSchema" -> "false")
      })
  }

  /** Writer options for one polars-style write_excel call (worksheet
    * positioning; polars' formatting arguments are xlsxwriter-specific
    * and have no Spark analogue). */
  def writeWiring(sheetName: Option[String] = None,
                  includeHeader: Boolean = true): Map[String, String] =
    Map("header" -> includeHeader.toString) ++
      sheetName.map(n => "dataAddress" -> s"'$n'!A1").toMap

  private val readerClass = "com.crealytics.spark.excel.v2.ExcelDataSource"

  def excelAvailable: Boolean =
    try { Class.forName(readerClass); true }
    catch { case _: ClassNotFoundException => false }

  private def raiseAbsent(): Nothing = throw new IllegalStateException(
    "spark-excel connector not on the classpath — add " +
      "com.crealytics:spark-excel_2.13 (matching the Spark minor version); " +
      "reads/writes then use format(\"excel\") with the wiring from " +
      "Spreadsheet.readWiring/writeWiring")

  /** polars read_excel. `columns`/`raiseIfEmpty`/`dropEmptyRows` are
    * applied Spark-side after the connector scan, matching polars'
    * post-read semantics. */
  def readExcel(spark: SparkSession, path: String,
                sheetName: Option[String] = None,
                tableName: Option[String] = None,
                hasHeader: Boolean = true,
                inferSchemaLength: Option[Int] = Some(100),
                columns: Seq[String] = Nil,
                dropEmptyRows: Boolean = true,
                raiseIfEmpty: Boolean = true): DataFrame = {
    if (!excelAvailable) raiseAbsent()
    val base = readWiring(sheetName, tableName, hasHeader, inferSchemaLength)
      .foldLeft(spark.read.format("excel")) { case (r, (k, v)) => r.option(k, v) }
      .load(path)
    val selected = if (columns.nonEmpty) base.select(columns.head, columns.tail: _*) else base
    val cleaned = if (dropEmptyRows) selected.na.drop("all") else selected
    if (raiseIfEmpty && cleaned.isEmpty)
      throw new IllegalArgumentException(s"empty Excel source: $path (raise_if_empty)")
    cleaned
  }

  /** polars DataFrame.write_excel. */
  def writeExcel(df: DataFrame, path: String,
                 sheetName: Option[String] = None,
                 includeHeader: Boolean = true): Unit = {
    if (!excelAvailable) raiseAbsent()
    writeWiring(sheetName, includeHeader)
      .foldLeft(df.write.format("excel").mode("overwrite")) {
        case (w, (k, v)) => w.option(k, v)
      }.save(path)
  }
}
