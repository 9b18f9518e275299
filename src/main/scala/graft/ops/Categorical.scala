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

  /** polars global-string-cache analogue (StringCache,
    * crates/polars-core/src/chunked_array/logical/categorical.rs): ONE
    * dictionary over the union of both frames' category values, so frames
    * encoded against it carry directly comparable codes. Build it once,
    * pass it to [[toPhysicalWith]] for each frame. */
  def sharedDictionary(a: DataFrame, ca: String,
                       b: DataFrame, cb: String): DataFrame =
    dictionary(
      a.select(col(ca).as("category"))
        .unionAll(b.select(col(cb).as("category"))), "category")

  /** Encode `c` against an EXISTING dictionary frame (shared or frozen)
    * instead of building one from the data — unseen values code to null
    * (the non-strict cast contract). */
  def toPhysicalWith(df: DataFrame, c: String, dict: DataFrame,
                     as: String = "physical"): DataFrame = {
    val d = dict.select(col("category").as(c), col("physical").as(as))
    df.join(broadcast(d), Seq(c), "left")
      .select(df.columns.map(col) :+ col(as): _*)
  }

  /** Join two categorically-ENCODED frames on their code columns WITHOUT
    * re-encoding either side — the cross-frame join polars' global string
    * cache enables. The two dictionaries (small by the categorical
    * contract) join on the category STRING to form a code-remap table
    * (rightPhysical → leftPhysical); the right frame's codes translate
    * through that broadcast table, and the data join itself runs on int
    * codes only. Category strings never touch a data-frame row: at 100 TB
    * the only string comparison is dictionary × dictionary.
    *
    * Result: left columns + right's non-code columns, joined where the
    * two sides' CATEGORIES (not raw codes — each side numbers its own
    * dictionary) match. Left-preserving joins only: the translate step is
    * an inner join on the remap table, so right rows with right-only
    * categories are dropped before a right/full outer could preserve
    * them — use [[sharedDictionary]] + [[toPhysicalWith]] for those. */
  def joinOnCodes(left: DataFrame, leftCode: String, leftDict: DataFrame,
                  right: DataFrame, rightCode: String, rightDict: DataFrame,
                  how: String = "inner"): DataFrame = {
    val normalized = how.toLowerCase.replace("_", "").replace("-", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "semi",
      "leftanti", "anti")(normalized),
      s"joinOnCodes supports left-preserving joins only, got '$how'")
    // The translate step appends a column named `leftCode` to the right
    // frame; a pre-existing right column of that name (other than the
    // rightCode being dropped) would duplicate and make the final join key
    // ambiguous (r12 ADVICE). Raise with a contract message instead.
    require(!right.columns.filterNot(_ == rightCode).contains(leftCode),
      s"joinOnCodes: right frame already has a column '$leftCode' " +
        "(the left code name) — rename it before joining on codes")
    val remap = leftDict.select(col("category").as("__cat"),
        col("physical").as(leftCode))
      .join(rightDict.select(col("category").as("__cat"),
        col("physical").as(rightCode)), Seq("__cat"))
      .select(col(rightCode), col(leftCode))
    val translated = right.join(broadcast(remap), Seq(rightCode), "inner")
      .drop(rightCode)
    left.join(translated, Seq(leftCode), how)
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
