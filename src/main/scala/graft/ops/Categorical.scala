package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Categorical dtype surface (polars Categorical/Enum,
  * crates/polars-core/src/datatypes/dtype.rs:136-139, and the cat expression
  * namespace, crates/polars-plan/src/dsl/function_expr/cat.rs).
  *
  * polars dictionary-encodes categorical columns against a revmap. Spark has
  * no user-level dictionary dtype (parquet + Tungsten dictionary-encode
  * storage transparently), so the surface is explicit and distributed:
  *
  *  - [[dictionary]] — a deterministic dictionary FRAME (category ↔ physical
  *    code), numbered in lexical order. Order-of-appearance numbering
  *    (polars' single-threaded default) is not reproducible across a
  *    cluster, so the contract here is lexical — the same choice polars
  *    exposes as `Categorical(ordering="lexical")` and what Enum fixes by
  *    construction. The code assignment itself is distributed
  *    ([[Distributed.withRowNumber]] over the distinct frame — no
  *    single-task window even for a high-cardinality dictionary).
  *  - [[toPhysical]] / [[fromPhysical]] — encode/decode by dictionary join.
  *    The dictionary side is broadcast: a dictionary that is small enough to
  *    be useful as a dictionary is small enough to broadcast. For a
  *    pathological high-cardinality column, drop the hint and let AQE pick.
  *  - [[lenBytes]] / [[lenChars]] — the cat.len_bytes / cat.len_chars
  *    namespace (operate on the category string value).
  *
  * Nulls stay null through encode and decode (polars: null is not a
  * category); they never enter the dictionary.
  */
object Categorical {

  /** Deterministic dictionary frame for `c`: (category, physical) with
    * physical = 0-based dense code in lexical category order. */
  def dictionary(df: DataFrame, c: String): DataFrame = {
    val d = df.select(col(c).as("category")).filter(col("category").isNotNull).distinct()
    Distributed.withRowNumber(d, "physical", Seq(col("category")))
      .select((col("physical") - 1).cast("int").as("physical"), col("category"))
  }

  /** polars `.cast(pl.Categorical).to_physical()`: appends `as` = the
    * dictionary code of column `c` (null where `c` is null). */
  def toPhysical(df: DataFrame, c: String, as: String = "physical"): DataFrame = {
    val dict = dictionary(df, c).select(col("category").as(c), col("physical").as(as))
    df.join(broadcast(dict), Seq(c), "left")
      .select(df.columns.map(col) :+ col(as): _*)
  }

  /** Decode physical codes back to category strings using `dict`
    * (a [[dictionary]] frame): appends `as` = the category for `codeCol`. */
  def fromPhysical(df: DataFrame, codeCol: String, dict: DataFrame,
                   as: String): DataFrame = {
    val d = dict.select(col("physical").as(codeCol), col("category").as(as))
    df.join(broadcast(d), Seq(codeCol), "left")
      .select(df.columns.map(col) :+ col(as): _*)
  }

  /** polars cat.get_categories(): the category list in physical order. */
  def getCategories(df: DataFrame, c: String): DataFrame =
    dictionary(df, c).orderBy(col("physical"))

  /** polars cat.len_bytes(): UTF-8 byte length of the category value. */
  def lenBytes(c: Column): Column = octet_length(c)

  /** polars cat.len_chars(): character length of the category value. */
  def lenChars(c: Column): Column = char_length(c)

  /** polars Enum (dtype.rs:139): the FROZEN-dictionary categorical. Codes
    * are fixed by position in `categories` at declaration time — no data
    * scan, no dictionary build, reproducible on any cluster by
    * construction. The strict encode RAISES on an out-of-set value (the
    * Enum cast contract — polars throws InvalidOperationError); pass
    * `strict = false` for polars' `cast(..., strict=False)`, which maps
    * out-of-set values to null. Nulls stay null either way (null is not a
    * category). The category array is a literal — the membership probe and
    * code assignment run inside codegen, no join, no shuffle. */
  def enumEncode(c: Column, categories: Seq[String],
                 strict: Boolean = true): Column = {
    require(categories.nonEmpty && categories.distinct.size == categories.size,
      "Enum categories must be non-empty and distinct")
    val cats = array(categories.map(lit): _*)
    val pos = array_position(cats, c) // 1-based; 0 when out-of-set; null on null
    val code = (pos - 1).cast("int")
    if (strict)
      when(c.isNull, lit(null).cast("int"))
        .when(pos > 0, code)
        .otherwise(raise_error(concat(
          lit("Enum strict cast failed: value '"), c,
          lit(s"' is not in the frozen categories [${categories.mkString(", ")}]")))
          .cast("int"))
    else when(pos > 0, code)
  }

  /** Enum decode: physical code → category string, by position in the
    * frozen list. Out-of-range codes decode to null (guarded explicitly —
    * under ANSI a bare element_at would raise on the bad index). */
  def enumDecode(code: Column, categories: Seq[String]): Column = {
    val i = code.cast("int")
    when(i.between(0, categories.size - 1),
      element_at(array(categories.map(lit): _*), i + 1))
  }
}
