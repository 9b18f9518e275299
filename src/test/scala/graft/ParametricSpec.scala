package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.testing.{Assertions, Parametric}

/** Round-trip and algebraic laws over randomly generated frames
  * (reference `py-polars/src/polars/testing/parametric/` — the hypothesis
  * layer: random frames × invariants instead of fixtures). Each law runs
  * over a seed range; a failure names its seed, which reproduces the frame
  * exactly. Laws compare through `Assertions.assertFrameEqual`, so this
  * suite also exercises the shipped testing surface on adversarial data
  * (NaN/±Inf, unicode, nulls, empty frames, nested types). */
class ParametricSpec extends SparkSpec {

  private val seeds = 0L until 24L

  private def sortAll(df: DataFrame): DataFrame =
    df.sort(df.columns.map(col).toIndexedSeq: _*)

  test("law: parquet round-trip is the identity") {
    for (seed <- seeds) {
      val df = Parametric.randomFrame(spark, seed)
      val path = s"/tmp/graft_parametric_pq_$seed"
      df.write.mode("overwrite").parquet(path)
      val back = spark.read.parquet(path)
      Assertions.assertFrameEqual(
        sortAll(df).select(df.columns.map(col).toIndexedSeq: _*),
        sortAll(back).select(df.columns.map(col).toIndexedSeq: _*),
        checkRowOrder = true)
    }
  }

  test("law: sort by all columns is idempotent") {
    for (seed <- seeds) {
      val df = Parametric.randomFrame(spark, seed + 1000)
      Assertions.assertFrameEqual(sortAll(df), sortAll(sortAll(df)),
        checkRowOrder = true)
    }
  }

  test("law: distinct is idempotent and never grows") {
    for (seed <- seeds) {
      val df = Parametric.randomFrame(spark, seed + 2000)
      val d1 = df.distinct()
      Assertions.assertFrameEqual(sortAll(d1), sortAll(d1.distinct()),
        checkRowOrder = true)
      assert(d1.count() <= df.count(), s"seed=$seed distinct grew")
    }
  }

  test("law: self-join on a unique row id is the identity") {
    for (seed <- seeds) {
      val df = Parametric.randomFrame(spark, seed + 3000)
        .withColumn("__id", monotonically_increasing_id())
        .localCheckpoint() // pin the non-deterministic id before branching
      val joined = df.select(col("__id"))
        .join(df, Seq("__id")).drop("__id")
      Assertions.assertFrameEqual(sortAll(df.drop("__id")), sortAll(joined),
        checkRowOrder = true)
    }
  }

  test("law: filter three-way partition preserves the row count") {
    for (seed <- seeds) {
      val df = Parametric.randomFrame(spark, seed + 4000)
      val c = col(df.columns.head)
      val p = c.isNotNull && hash(c) % 2 === 0
      val n = df.filter(p).count() + df.filter(!p).count() +
        df.filter(p.isNull).count()
      assert(n == df.count(), s"seed=$seed partition lost rows")
    }
  }

  test("law: union with self doubles every row's multiplicity") {
    for (seed <- seeds) {
      val df = Parametric.randomFrame(spark, seed + 5000)
      val doubled = df.unionAll(df)
      assert(doubled.count() == 2 * df.count(), s"seed=$seed count")
      Assertions.assertFrameEqual(sortAll(df), sortAll(doubled.exceptAll(df)),
        checkRowOrder = true)
    }
  }
}
