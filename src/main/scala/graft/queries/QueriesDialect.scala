package graft.queries

import org.apache.spark.sql.functions._
import graft.queries.util._

/** Round-5 batch: polars-SQL dialect coverage ([[graft.functions.PolarsSqlShims]],
  * reference crates/polars-sql/src/functions.rs) and dtype-fidelity contracts.
  * The dialect query runs VERBATIM polars-SQL function names through
  * spark.sql after shim registration; the oracle re-expresses the same
  * semantics in DuckDB's own dialect.
  */
object QueriesDialect {

  private val dialectSql =
    """WITH w AS (
      |  SELECT p_brand,
      |    bitand(p_partkey, 255) AS ba,
      |    bitcount(p_partkey) AS bc,
      |    array_get(string_to_array(p_name, ' '), 1) AS first_word,
      |    array_length(string_to_array(p_name, ' ')) AS n_words,
      |    strpos(p_name, 'al') AS pos_al,
      |    CAST(ends_with(p_name, 'le') AS INT) AS ew,
      |    truncate(p_retailprice, 1) AS tr1
      |  FROM part)
      |SELECT p_brand,
      |  CAST(total(ba) AS BIGINT) AS total_ba,
      |  SUM(bc) AS sum_bc,
      |  MIN(first_word) AS min_word,
      |  SUM(n_words) AS sum_words,
      |  SUM(pos_al) AS sum_pos,
      |  SUM(ew) AS n_le,
      |  ROUND(quantile_cont(tr1, 0.5) * 100) / 100 AS med_tr,
      |  ROUND(cosd(60) * 10000) / 10000 AS c60,
      |  ROUND(atan2d(1.0, 1.0) * 10000) / 10000 AS a45,
      |  strftime(TIMESTAMP '2024-03-05 07:08:09', '%Y-%m-%d %H:%M') AS fmt
      |FROM w GROUP BY p_brand ORDER BY p_brand""".stripMargin

  val queries: Map[String, Q] = Map(
    // polars-SQL dialect: shimmed names (bitand/bitcount/array_get/
    // string_to_array/array_length/strpos/ends_with/truncate/total/
    // quantile_cont/cosd/atan2d/strftime) running verbatim through spark.sql
    "sql_polars_dialect" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      t(s, d, "part").createOrReplaceTempView("part")
      s.sql(dialectSql)
    })
  )

  val oracle: Map[String, String] = Map(
    "sql_polars_dialect" ->
      """WITH w AS (
        |  SELECT p_brand,
        |    p_partkey & 255 AS ba,
        |    bit_count(p_partkey) AS bc,
        |    string_split(p_name, ' ')[1] AS first_word,
        |    len(string_split(p_name, ' ')) AS n_words,
        |    strpos(p_name, 'al') AS pos_al,
        |    CAST(ends_with(p_name, 'le') AS INT) AS ew,
        |    trunc(p_retailprice * 10) / 10 AS tr1
        |  FROM part)
        |SELECT p_brand,
        |  CAST(coalesce(SUM(ba), 0) AS BIGINT) AS total_ba,
        |  CAST(SUM(bc) AS BIGINT) AS sum_bc,
        |  MIN(first_word) AS min_word,
        |  CAST(SUM(n_words) AS BIGINT) AS sum_words,
        |  CAST(SUM(pos_al) AS BIGINT) AS sum_pos,
        |  CAST(SUM(ew) AS BIGINT) AS n_le,
        |  ROUND(quantile_cont(tr1, 0.5) * 100) / 100 AS med_tr,
        |  ROUND(cos(radians(60)) * 10000) / 10000 AS c60,
        |  ROUND(degrees(atan2(1.0, 1.0)) * 10000) / 10000 AS a45,
        |  strftime(TIMESTAMP '2024-03-05 07:08:09', '%Y-%m-%d %H:%M') AS fmt
        |FROM w GROUP BY p_brand ORDER BY p_brand""".stripMargin
  )
}
