package graft.queries

import org.apache.spark.sql.functions._
import graft.queries.util._
import graft.ops.Categorical

/** Round-5 batch: the Categorical dtype surface (polars
  * crates/polars-core/src/datatypes/dtype.rs:136-139, cat namespace
  * crates/polars-plan/src/dsl/function_expr/cat.rs) — dictionary build,
  * to_physical, round-trip decode, get_categories + cat.len_bytes/len_chars.
  * Oracle: the same deterministic lexical dictionary rebuilt in DuckDB with
  * a row_number over the distinct categories.
  */
object QueriesCat {

  val queries: Map[String, Q] = Map(

    // .cast(pl.Categorical).to_physical(): every row tagged with its
    // 0-based lexical dictionary code
    "cat_cast_physical" -> ((s, d) =>
      Categorical.toPhysical(
        t(s, d, "documents").select(col("doc_id"), col("lang")), "lang", "phys")
        .orderBy(col("doc_id"))),

    // encode → decode round-trip: fromPhysical(toPhysical(x)) == x
    "cat_roundtrip" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("lang"))
      val dict = Categorical.dictionary(docs, "lang")
      val enc = Categorical.toPhysical(docs, "lang", "phys").drop("lang")
      Categorical.fromPhysical(enc, "phys", dict, "lang_rt")
        .select(col("doc_id"), col("phys"), col("lang_rt"))
        .orderBy(col("doc_id"))
    }),

    // cat.get_categories() + cat.len_bytes()/len_chars() over the dictionary
    "cat_categories" -> ((s, d) =>
      Categorical.getCategories(
        t(s, d, "documents").select(col("lang")), "lang")
        .select(col("physical"), col("category"),
          Categorical.lenBytes(col("category")).as("len_bytes"),
          Categorical.lenChars(col("category")).as("len_chars"))
        .orderBy(col("physical")))
  )

  private val dictSql =
    """SELECT lang AS category,
      | CAST(row_number() OVER (ORDER BY lang) - 1 AS INTEGER) AS physical
      |FROM (SELECT DISTINCT lang FROM documents WHERE lang IS NOT NULL)""".stripMargin

  val oracle: Map[String, String] = Map(

    "cat_cast_physical" ->
      s"""WITH dict AS ($dictSql)
         |SELECT d.doc_id, d.lang, dict.physical AS phys
         |FROM documents d LEFT JOIN dict ON d.lang = dict.category
         |ORDER BY d.doc_id""".stripMargin,

    "cat_roundtrip" ->
      s"""WITH dict AS ($dictSql)
         |SELECT d.doc_id, dict.physical AS phys, d.lang AS lang_rt
         |FROM documents d LEFT JOIN dict ON d.lang = dict.category
         |ORDER BY d.doc_id""".stripMargin,

    "cat_categories" ->
      s"""SELECT physical, category,
         | CAST(strlen(category) AS INTEGER) AS len_bytes,
         | CAST(length(category) AS INTEGER) AS len_chars
         |FROM ($dictSql)
         |ORDER BY physical""".stripMargin
  )
}
