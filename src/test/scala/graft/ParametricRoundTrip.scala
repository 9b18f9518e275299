package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

import graft.testing.{Assertions, Parametric}

/** Shared fuzz harness for IO round-trips: seeded random frames pushed
  * through write → read → schema + multiset-equality. One definition so the
  * DSv2-connector spec (ParametricIOSpec) and the text-format spec
  * (ParametricTextIOSpec) cannot drift. A failing seed reproduces exactly
  * (the seed determines the frame). */
object ParametricRoundTrip {

  def run(spark: SparkSession, name: String, seeds: Range, pool: Seq[DataType],
          write: (DataFrame, String) => Unit,
          read: (String, StructType) => DataFrame): Unit = {
    var exercised = 0
    seeds.foreach { seed =>
      val df = Parametric.randomFrame(spark, seed, pool = pool)
      // a frame with zero rows writes zero part files (per-partition sinks
      // skip empty partitions) and leaves nothing to read back — a valid
      // draw, but not a round-trippable one
      if (!df.isEmpty) {
        val dir = s"/tmp/graft_test/prt_${name}_$seed"
        write(df.repartition(3), dir)
        val back = read(dir, df.schema)
        assert(back.schema == df.schema,
          s"seed=$seed schema drift: ${back.schema} vs ${df.schema}")
        Assertions.assertFrameEqual(back, df, checkRowOrder = false)
        exercised += 1
      }
    }
    assert(exercised >= 100, s"only $exercised non-empty frames exercised")
  }
}
