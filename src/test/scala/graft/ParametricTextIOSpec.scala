package graft

import org.apache.spark.sql.types._

import graft.dsl.LazyFrame
import graft.testing.Parametric

/** Parametric fuzz over the TEXT formats and the columnar built-ins —
  * the same seeded-frame harness ParametricIOSpec drives through the
  * hand-built DSv2 connectors, pointed at the format paths a reference
  * user hits daily: `write_csv`/`read_csv`, `write_ndjson`/`read_ndjson`
  * (reference `py-polars/tests/unit/io/test_csv.py` round-trip coverage,
  * generated there by the hypothesis layer), plus parquet and ORC as the
  * exact-by-construction baselines.
  *
  * Text formats are where round-trips actually lose data — null vs empty
  * string, NaN/±Infinity spellings, quotes/tabs/commas/newlines inside
  * cells, sub-millisecond timestamps — so each dialect below is the one
  * the library documents as lossless, and a seed failure reproduces
  * exactly. The generator draws all of those hostile values (this suite
  * caught Spark's CSV writer whitespace trim AND the default
  * timestampFormat's silent µs→ms truncation).
  */
class ParametricTextIOSpec extends SparkSpec {

  /** CSV carries atomic cells only (no nested, no binary — same surface
    * polars' CSV writer raises on). */
  private val csvPool: Seq[DataType] = Seq(
    LongType, IntegerType, ShortType, ByteType, DoubleType, FloatType,
    DecimalType(12, 2), BooleanType, StringType, DateType, TimestampType)

  /** NDJSON: everything but binary (JSON has no native bytes; Spark's
    * writer base64s them but the fidelity contract worth pinning is the
    * one the reference supports, and polars' ndjson writer rejects
    * binary too). */
  private val jsonPool: Seq[DataType] = Parametric.dtypePool

  test("parquet round-trips 100+ seeded random frames (full pool + binary)") {
    ParametricRoundTrip.run(spark, "parquet", 1 to 104,
      Parametric.dtypePool :+ BinaryType,
      (d, p) => LazyFrame(d).sinkParquet(p),
      (p, _) => spark.read.parquet(p))
  }

  test("ORC round-trips 100+ seeded random frames (full pool + binary)") {
    ParametricRoundTrip.run(spark, "orc", 1 to 104,
      Parametric.dtypePool :+ BinaryType,
      (d, p) => d.write.mode("overwrite").orc(p),
      (p, _) => spark.read.orc(p))
  }

  test("CSV exact dialect round-trips 100+ seeded random frames (atomic pool)") {
    ParametricRoundTrip.run(spark, "csv", 1 to 104, csvPool,
      (d, p) => LazyFrame(d).sinkCsvExact(p),
      (p, s) => LazyFrame.scanCsvExact(spark, p, s).df)
  }

  test("NDJSON round-trips 100+ seeded random frames (nested pool)") {
    ParametricRoundTrip.run(spark, "ndjson", 1 to 104, jsonPool,
      (d, p) => LazyFrame(d).sinkJson(p),
      (p, s) => LazyFrame.scanNdjsonSchema(spark, p, s).df)
  }
}
