package graft

/** The polars-SQL dialect shims ([[graft.functions.PolarsSqlShims]], reference
  * crates/polars-sql/src/functions.rs): verbatim statements from the shapes
  * polars' own SQL tests exercise (py-polars/tests/unit/sql/) must parse,
  * resolve, and return the values polars documents. Session functions come in
  * via GraftExtensions (TestSpark sets spark.sql.extensions), same as a
  * production cluster-wide deployment.
  */
class PolarsSqlDialectSpec extends SparkSpec {

  private def one(sql: String): org.apache.spark.sql.Row = spark.sql(sql).collect()(0)

  test("10 verbatim polars-SQL statements run unmodified") {
    import spark.implicits._
    Seq((1, "hello world", 2.5), (2, "spark and polars", -3.7), (3, "x", 0.0))
      .toDF("id", "s", "v").createOrReplaceTempView("tbl")

    // 1. degree trig
    assert(math.abs(one("SELECT cosd(60) AS x").getDouble(0) - 0.5) < 1e-12)
    // 2. inverse degree trig + atan2d
    assert(math.abs(one("SELECT atan2d(1.0, 1.0) AS x").getDouble(0) - 45.0) < 1e-12)
    // 3. bitwise function names
    assert(one("SELECT bitand(12, 10) AS a, bitor(12, 10) AS o, bitcount(255) AS c")
      .toSeq == Seq(8, 14, 8))
    // 4. array namespace over string_to_array (1-indexed get, null on miss)
    val r4 = one("SELECT array_get(string_to_array('a,b,c', ','), 1) AS hd, " +
      "array_get(string_to_array('a,b,c', ','), 9) AS miss, " +
      "array_length(string_to_array('a,b,c', ',')) AS n")
    assert(r4.getString(0) == "a" && r4.isNullAt(1) && r4.getInt(2) == 3)
    // 5. array_mean / array_sum skip nulls like polars list.mean
    val r5 = one("SELECT array_mean(array(1, 2, NULL, 3)) AS m, array_sum(array(1, NULL)) AS s")
    assert(r5.getDouble(0) == 2.0 && r5.getDouble(1) == 1.0)
    // 6. strpos/starts_with/ends_with string namespace
    val r6 = one("SELECT strpos(s, 'world') AS p, starts_with(s, 'hello') AS st, " +
      "ends_with(s, 'world') AS en FROM tbl WHERE id = 1")
    assert(r6.getInt(0) == 7 && r6.getBoolean(1) && r6.getBoolean(2))
    // 7. total (null-safe sum: empty relation → 0, not null)
    assert(one("SELECT total(v) AS t FROM tbl WHERE id > 99").getDouble(0) == 0.0)
    // 8. truncate toward zero, group_concat with separator
    val r8 = one("SELECT truncate(-3.7) AS t0, truncate(2.59, 1) AS t1, " +
      "group_concat(s, '|') AS g FROM tbl WHERE id <= 2")
    assert(r8.getDouble(0) == -3.0 && r8.getDouble(1) == 2.5 &&
      r8.getString(2) == "hello world|spark and polars")
    // 9. strftime / strptime with chrono %-codes
    val r9 = one("SELECT strftime(TIMESTAMP '2024-03-05 07:08:09', '%d.%m.%Y') AS f, " +
      "strptime('2024-03-05 07:08', '%Y-%m-%d %H:%M') AS p")
    assert(r9.getString(0) == "05.03.2024" &&
      r9.getTimestamp(1).toString.startsWith("2024-03-05 07:08"))
    // 10. quantile_cont/quantile_disc + covar aggregates
    val r10 = one("SELECT quantile_cont(v, 0.5) AS qc, quantile_disc(v, 0.5) AS qd, " +
      "covar(v, v) AS cv FROM tbl")
    assert(r10.getDouble(0) == 0.0 && r10.getDouble(1) == 0.0 && r10.getDouble(2) > 0)
    // 11. datetime conversion + unnest generator
    val r11 = one("SELECT datetime('2024-03-05 07:08:09') AS dt")
    assert(r11.getTimestamp(0).toString.startsWith("2024-03-05 07:08:09"))
    assert(spark.sql("SELECT unnest(array(1, 2, 3)) AS u").collect().map(_.getInt(0)).toSeq
      == Seq(1, 2, 3))
  }

  test("shims reject non-literal format/separator args with a clear error") {
    import spark.implicits._
    Seq(("a", "%Y")).toDF("s", "f").createOrReplaceTempView("fmt_in")
    val e = intercept[Exception](
      spark.sql("SELECT strftime(current_timestamp(), f) FROM fmt_in").collect())
    assert(e.getMessage.contains("must be a string literal"))
  }

  test("chronoToJava translates and quotes correctly") {
    import graft.functions.PolarsSqlShims.chronoToJava
    assert(chronoToJava("%Y-%m-%d") == "yyyy-MM-dd")
    assert(chronoToJava("%H:%M:%S") == "HH:mm:ss")
    assert(chronoToJava("at %I %p") == "'a''t' hh a")
    assert(chronoToJava("100%%") == "100%")
    intercept[IllegalArgumentException](chronoToJava("%Q"))
  }

  test("no Spark builtin is overridden by a shim") {
    val builtin = org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin
    val clash = graft.functions.PolarsSqlShims.all.map(_._1.funcName)
      .filter(n => builtin.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(n)))
    assert(clash.isEmpty, s"shims shadowing Spark builtins: $clash")
  }
}
