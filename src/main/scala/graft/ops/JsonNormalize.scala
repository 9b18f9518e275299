package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** polars `json_normalize` (py-polars/src/polars/convert/normalize.py):
  * flatten nested JSON objects into columns, nested keys joined with a
  * separator ("foo.bar"), recursion stopped at `maxLevel` — anything
  * deeper is re-encoded as a JSON string (polars runs the remainder
  * through its JSON encoder).
  *
  * Spark shape: parse once with `from_json` against a schema, then a
  * pure-projection recursive struct star-expansion — flattening is
  * column metadata surgery, zero shuffles, fully codegen. The schema
  * can be given (the 100 TB path: one scan total) or inferred with
  * Spark's distributed JSON schema inference (one extra scan, same
  * machinery as `spark.read.json`).
  */
object JsonNormalize {

  /** Flatten `jsonCol` (a JSON-object string column) of `df`. Keeps every
    * other column; the JSON's keys become new columns after it. */
  def normalize(df: DataFrame, jsonCol: String, schema: Option[StructType],
                separator: String = ".", maxLevel: Int = Int.MaxValue): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val st = schema.getOrElse {
      // distributed inference: exactly spark.read.json's code path.
      // Null payloads must not reach the parser (it NPEs on null
      // elements, where from_json(null) below is just a null struct),
      // and an unparseable row would otherwise leak a _corrupt_record
      // column into the flattened output — surface that loudly instead.
      val inferred = spark.read
        .json(df.select(col(jsonCol)).filter(col(jsonCol).isNotNull).as[String])
        .schema
      require(!inferred.fieldNames.contains("_corrupt_record"),
        s"json_normalize: column $jsonCol contains unparseable JSON")
      inferred
    }
    val parsed = from_json(col(jsonCol), st)
    val flat = flatten(parsed, st, prefix = "", separator, maxLevel)
    val keep = df.columns.filterNot(_ == jsonCol).map(col).toSeq
    df.select(keep ++ flat: _*)
  }

  /** The projection list for one struct level: scalars (and post-maxLevel
    * structs, JSON-re-encoded) emit, structs recurse with the joined name. */
  private def flatten(c: Column, st: StructType, prefix: String,
                      separator: String, levelsLeft: Int): Seq[Column] =
    st.fields.toSeq.flatMap { f =>
      val name = if (prefix.isEmpty) f.name else s"$prefix$separator${f.name}"
      f.dataType match {
        case inner: StructType if levelsLeft > 1 =>
          flatten(c.getField(f.name), inner, name, separator, levelsLeft - 1)
        case _: StructType => // depth budget spent — polars JSON-encodes
          Seq(to_json(c.getField(f.name)).as(name))
        case _ => Seq(c.getField(f.name).as(name))
      }
    }
}
