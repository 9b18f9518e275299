package graft.testing

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Render dual of [[FromRepr]] — polars' UTF8 box-table repr (the
  * `DataFrame.__repr__` / `to_init_repr` family in
  * py-polars/src/polars/dataframe/frame.py): name row, `---` divider,
  * dtype row, `╞═╪═╡` rule, data rows. The law the pair guarantees (and
  * ToReprSpec pins parametrically): `FromRepr.parse(ToRepr.render(df))`
  * reproduces the frame value-exactly for every scalar dtype FromRepr
  * accepts — reprs become pasteable test fixtures in BOTH directions.
  * Driver-side by design, like FromRepr: a repr is human-scale output
  * (`maxRows` caps the collect; data-scale dumps go through the sinks). */
object ToRepr {

  private val dtypeNames: Map[DataType, String] = Map(
    ByteType -> "i8", ShortType -> "i16", IntegerType -> "i32",
    LongType -> "i64", FloatType -> "f32", DoubleType -> "f64",
    StringType -> "str", BooleanType -> "bool", DateType -> "date",
    TimestampNTZType -> "datetime[μs]")

  def render(df: DataFrame, maxRows: Int = 100): String = {
    val schema = df.schema
    schema.fields.foreach { f =>
      require(dtypeNames.contains(f.dataType),
        s"to_repr: unsupported dtype ${f.dataType} (scalar reprs only, " +
          "matching from_repr)")
    }
    val rows = df.limit(maxRows).collect()
    def cell(v: Any, dt: DataType): String = v match {
      case null => "null"
      case ts: java.time.LocalDateTime => ts.toString.replace("T", " ")
      case s: String =>
        // the box dialect cannot carry these losslessly (FromRepr splits
        // cells on │/┆/|, trims whitespace, maps bare `null` to SQL null,
        // and drops `…` truncation rows) — refuse rather than silently
        // break the round-trip law the pair advertises
        require(!s.exists(c => c == '│' || c == '┆' || c == '|' || c == '\n')
            && s != "null" && s != "…" && s == s.trim,
          s"to_repr: string value '${s.take(40)}' is not " +
            "representable in the box repr dialect (cell separators, " +
            "newlines, bare 'null'/'…', or untrimmed whitespace)")
        s
      case other => other.toString
    }
    val header = schema.fields.map(_.name)
    val dtypes = schema.fields.map(f => dtypeNames(f.dataType))
    val body = rows.map(r => schema.fields.zipWithIndex.map {
      case (f, i) => cell(r.get(i), f.dataType)
    })
    val widths = schema.fields.indices.map { i =>
      (Seq(header(i), "---", dtypes(i)) ++ body.map(_(i))).map(_.length).max
    }
    def pad(s: String, w: Int) = s + " " * (w - s.length)
    def row(cells: Seq[String], l: String, m: String, r: String) =
      cells.zip(widths).map { case (c, w) => s" ${pad(c, w)} " }
        .mkString(l, m, r)
    val top = widths.map(w => "─" * (w + 2)).mkString("┌", "┬", "┐")
    val rule = widths.map(w => "═" * (w + 2)).mkString("╞", "╪", "╡")
    val bot = widths.map(w => "─" * (w + 2)).mkString("└", "┴", "┘")
    (Seq(s"shape: (${rows.length}, ${schema.fields.length})", top,
      row(header.toSeq, "│", "┆", "│"),
      row(widths.map(_ => "---"), "│", "┆", "│"),
      row(dtypes.toSeq, "│", "┆", "│"), rule) ++
      body.map(r => row(r.toSeq, "│", "┆", "│")) :+ bot).mkString("\n")
  }
}
