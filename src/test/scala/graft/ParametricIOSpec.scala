package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.sources.{ArrowIpc, Avro}
import graft.testing.{Assertions, Parametric}

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

  private def roundTrip(name: String, seeds: Range, pool: Seq[DataType],
                        write: (DataFrame, String) => Unit): Unit = {
    var exercised = 0
    seeds.foreach { seed =>
      val df = Parametric.randomFrame(spark, seed, pool = pool)
      // a frame with zero rows writes zero part files (per-partition sinks
      // skip empty partitions) and leaves nothing to infer a schema from —
      // a valid draw, but not a round-trippable one
      if (!df.isEmpty) {
        val dir = s"/tmp/graft_test/pio_${name}_$seed"
        write(df.repartition(3), dir)
        val back = spark.read.format(s"graft-$name").load(dir)
        assert(back.schema == df.schema,
          s"seed=$seed schema drift: ${back.schema} vs ${df.schema}")
        Assertions.assertFrameEqual(back, df, checkRowOrder = false)
        exercised += 1
      }
    }
    assert(exercised >= 100, s"only $exercised non-empty frames exercised")
  }

  test("graft-ipc round-trips 100+ seeded random frames (full dtype pool + binary)") {
    roundTrip("ipc", 1 to 104, Parametric.dtypePool :+ BinaryType,
      (d, p) => ArrowIpc.write(d, p))
  }

  test("graft-avro round-trips 100+ seeded random frames (its type surface)") {
    roundTrip("avro", 1 to 104, avroPool, (d, p) => Avro.write(d, p))
  }
}
