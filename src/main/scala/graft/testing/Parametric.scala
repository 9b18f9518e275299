package graft.testing

import java.sql.{Date, Timestamp}

import scala.jdk.CollectionConverters._
import scala.util.Random

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Parametric frame generation (reference
  * `py-polars/src/polars/testing/parametric/strategies/` — `dataframes()` /
  * `series()` / dtype strategies, the hypothesis layer of polars.testing).
  *
  * Self-contained seeded generation instead of a property-testing
  * dependency: a seed fully determines the frame, so a failing law prints
  * its seed and reproduces exactly — the same contract hypothesis gives
  * polars users. Dtype pool mirrors the reference strategies' default
  * `allowed_dtypes`: integers, floats (NaN/±Inf included), decimal,
  * boolean, string (unicode + empties), date, timestamp, list and struct
  * nesting, plus nulls at a configurable rate in every column.
  */
object Parametric {

  /** The generator's dtype pool. Nested entries keep element types
    * orderable so generated frames stay sortable (a frame law needs a
    * total order over rows). */
  val dtypePool: Seq[DataType] = Seq(
    LongType, IntegerType, ShortType, ByteType,
    DoubleType, FloatType, DecimalType(12, 2),
    BooleanType, StringType, DateType, TimestampType,
    ArrayType(LongType), ArrayType(StringType),
    StructType(Seq(StructField("a", LongType), StructField("b", StringType))))

  /** Random schema: 1..maxCols columns named c0..cN drawn from `pool`
    * (callers fuzzing a sink with a narrower type surface — e.g. Avro has
    * no decimal and widens short/byte — pass the surface they support). */
  def randomSchema(rnd: Random, maxCols: Int = 6,
                   pool: Seq[DataType] = dtypePool): StructType = {
    val n = 1 + rnd.nextInt(maxCols)
    StructType((0 until n).map { i =>
      StructField(s"c$i", pool(rnd.nextInt(pool.length)))
    })
  }

  private def randomString(rnd: Random): String = {
    // unicode + csv-hostile chars, embedded newlines included (they force
    // the multiLine quoted-field path in any text writer)
    val alphabet = "ab α𝔘\"',;\t\n"
    (0 until rnd.nextInt(8)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
  }

  private def randomValue(rnd: Random, dt: DataType): Any = dt match {
    case LongType    => rnd.nextLong() % 100000L
    case IntegerType => rnd.nextInt(200000) - 100000
    case ShortType   => (rnd.nextInt(65536) - 32768).toShort
    case ByteType    => (rnd.nextInt(256) - 128).toByte
    case DoubleType => rnd.nextInt(20) match {
      case 0 => Double.NaN
      case 1 => Double.PositiveInfinity
      case 2 => Double.NegativeInfinity
      case _ => rnd.nextDouble() * 2e6 - 1e6
    }
    case FloatType => rnd.nextInt(20) match {
      case 0 => Float.NaN
      case 1 => Float.PositiveInfinity
      case 2 => Float.NegativeInfinity
      case _ => rnd.nextFloat() * 2e6f - 1e6f
    }
    case _: DecimalType =>
      new java.math.BigDecimal(rnd.nextInt(2000001) - 1000000).movePointLeft(2)
    case BooleanType => rnd.nextBoolean()
    case BinaryType  => Array.fill(rnd.nextInt(8))((rnd.nextInt(256) - 128).toByte)
    case StringType  => randomString(rnd)
    case DateType    => new Date(86400000L * (rnd.nextInt(40000) - 10000))
    case TimestampType =>
      // µs-granular (Spark TimestampType IS microseconds): ms-only
      // timestamps let a writer that truncates to millis fuzz green
      val ts = new Timestamp(rnd.nextLong() % 4102444800000L) // ±year 2100
      ts.setNanos(rnd.nextInt(1000000) * 1000)
      ts
    case ArrayType(et, _) =>
      (0 until rnd.nextInt(4)).map(_ => randomValue(rnd, et))
    case st: StructType =>
      Row(st.fields.map(f => randomValue(rnd, f.dataType)).toIndexedSeq: _*)
    case other => throw new IllegalArgumentException(s"no generator for $other")
  }

  /** Random frame: the seed fully determines schema AND data. `nullRatio`
    * applies per cell to every (nullable) column, mirroring the reference
    * strategies' `include_nulls`. */
  def randomFrame(spark: SparkSession, seed: Long, maxRows: Int = 48,
                  maxCols: Int = 6, nullRatio: Double = 0.15,
                  pool: Seq[DataType] = dtypePool): DataFrame = {
    val rnd = new Random(seed)
    val schema = randomSchema(rnd, maxCols, pool)
    val nRows = rnd.nextInt(maxRows + 1) // 0-row frames are valid draws
    val rows = (0 until nRows).map { _ =>
      Row(schema.fields.map { f =>
        if (rnd.nextDouble() < nullRatio) null else randomValue(rnd, f.dataType)
      }.toIndexedSeq: _*)
    }
    spark.createDataFrame(rows.asJava, schema)
  }
}
