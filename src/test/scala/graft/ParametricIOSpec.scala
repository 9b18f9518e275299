package graft

import org.apache.spark.sql.types._

import graft.sources.{ArrowIpc, Avro}
import graft.testing.Parametric

/** Parametric fuzz over the hand-built DSv2 connectors (reference
  * `py-polars/tests/unit/testing/parametric/` — the hypothesis layer is how
  * the reference catches writer edge cases its fixture tests miss): seeded
  * random frames with nested dtypes, NaN/±Inf, unicode/control-char
  * strings, and nulls, pushed through a write → read → multiset-equality
  * round trip. A failing seed reproduces exactly (the seed determines the
  * frame).
  */
class ParametricIOSpec extends SparkSpec {

  /** Avro's declared type surface: no decimal, and short/byte widen to INT
    * on write (a lossy schema round trip by design — see
    * [[graft.sources.Avro]] type mapping), so the generator never draws
    * them. Everything else in the default pool round-trips. */
  private val avroPool: Seq[DataType] = Seq(
    LongType, IntegerType, DoubleType, FloatType, BooleanType, StringType,
    BinaryType, DateType, TimestampType,
    ArrayType(LongType), ArrayType(StringType),
    StructType(Seq(StructField("a", LongType), StructField("b", StringType))))

  test("graft-ipc round-trips 100+ seeded random frames (full dtype pool + binary)") {
    ParametricRoundTrip.run(spark, "ipc", 1 to 104,
      Parametric.dtypePool :+ BinaryType,
      (d, p) => ArrowIpc.write(d, p),
      (p, _) => spark.read.format("graft-ipc").load(p))
  }

  test("graft-ipc-stream round-trips 100+ seeded random frames (same pool as ipc)") {
    ParametricRoundTrip.run(spark, "ipcs", 1 to 104,
      Parametric.dtypePool :+ BinaryType,
      (d, p) => graft.sources.ArrowIpcStream.writeStream(d, p),
      (p, _) => spark.read.format("graft-ipc-stream").load(p))
  }

  test("graft-avro round-trips 100+ seeded random frames (its type surface)") {
    ParametricRoundTrip.run(spark, "avro", 1 to 104, avroPool,
      (d, p) => Avro.write(d, p),
      (p, _) => spark.read.format("graft-avro").load(p))
  }
}
