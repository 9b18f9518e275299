package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.JsonNormalize
import graft.testing.Parametric

/** Parametric law for json_normalize: encode a seeded random frame as a
  * nested JSON string (two levels — half the columns move under a
  * `nested` object), run the full infer → parse → flatten path, and
  * demand value-exact recovery. The JSON-visible type surface: longs,
  * booleans, strings (unicode/control chars exercise the escape path) —
  * the types whose JSON round-trip is identity under Spark's inference
  * (doubles infer back as doubles but NaN/Inf encode as strings; dates/
  * timestamps encode as strings by design — polars' encoder does the
  * same, so those columns are out of scope for the identity law). */
class ParametricJsonSpec extends SparkSpec {

  private val jsonPool: Seq[DataType] =
    Seq(LongType, BooleanType, StringType)

  test("law: normalize(to_json(nested struct)) recovers every value (64 seeds)") {
    for (seed <- 1 to 64) {
      val df0 = Parametric.randomFrame(spark, seed, maxRows = 24,
        maxCols = 4, pool = jsonPool)
      if (df0.count() > 0) {
        import graft.ops.Distributed
        val df = Distributed.withRowNumber(df0, "__row",
          df0.columns.map(col).toSeq)
        val cols = df0.columns.toSeq
        val (top, deep) = cols.splitAt((cols.size + 1) / 2)
        val payload = to_json(struct(
          (top.map(c => col(c).as(c)) ++
            (if (deep.isEmpty) Nil
             else Seq(struct(deep.map(c => col(c).as(c)): _*).as("nested")))): _*))
        val framed = df.select(col("__row"), payload.as("payload"))
        val out = JsonNormalize.normalize(framed, "payload", schema = None)
        // to_json drops null fields; a column null in EVERY row vanishes
        // from the inferred schema — the law then demands the original
        // was all-null, otherwise values must match exactly
        val outCols = out.columns.toSet
        for (c <- cols) {
          val outName = if (top.contains(c)) c else s"nested.$c"
          val orig = df.select(col("__row"), col(c).as("v"))
          if (!outCols.contains(outName)) {
            assert(orig.filter(col("v").isNotNull).count() == 0,
              s"seed=$seed: column $c dropped but had non-null values")
          } else {
            val got = out.select(col("__row"), col(s"`$outName`").as("v"))
            assert(got.exceptAll(orig).count() == 0 &&
              orig.exceptAll(got).count() == 0,
              s"seed=$seed: column $c did not round-trip")
          }
        }
      }
    }
  }
}
