package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Distributed

/** Randomized cross-check of the range-partitioned scan helpers against
  * the naive single-task global window they replace: same numbers, any
  * partition count, including negative values (prefix sums that go down),
  * nulls in the summed column, skewed key distributions, and frames
  * smaller than the partition count (empty range partitions). */
class DistributedPropertySpec extends SparkSpec {

  private val seeds = 0 until 8

  test("withRowNumber equals the single-task global row_number") {
    for (seed <- seeds) {
      val rnd = new scala.util.Random(seed)
      val n = 1 + rnd.nextInt(500)
      val parts = 1 + rnd.nextInt(7)
      // unique order keys (shuffled ints) — row numbers are then unique
      val data = rnd.shuffle((0 until n).toList).map(k => (k.toLong, rnd.nextInt(100)))
      val df = spark.createDataFrame(data).toDF("k", "v").repartition(parts)

      val got = Distributed.withRowNumber(df, "rn", Seq(col("k")))
        .select(col("k"), col("rn")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val want = df.withColumn("rn", row_number().over(Window.orderBy(col("k"))).cast("long"))
        .select(col("k"), col("rn")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == want, s"seed=$seed n=$n parts=$parts")
    }
  }

  test("withPrefixSum equals the single-task global running sum (nulls, negatives)") {
    for (seed <- seeds) {
      val rnd = new scala.util.Random(seed ^ 0x5eed)
      val n = 1 + rnd.nextInt(500)
      val parts = 1 + rnd.nextInt(7)
      val data = rnd.shuffle((0 until n).toList).map { k =>
        val v: java.lang.Long =
          if (rnd.nextInt(10) == 0) null
          else java.lang.Long.valueOf(rnd.nextInt(201) - 100L)
        (k.toLong, v)
      }
      import scala.jdk.CollectionConverters._
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType)))
      val df = spark.createDataFrame(
        data.map(t => org.apache.spark.sql.Row(t._1, t._2)).asJava, schema)
        .repartition(parts)

      val got = Distributed.withPrefixSum(df, col("v"), Seq(col("k")), "ps")
        .select(col("k"), col("ps")).collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1))).toMap
      val w = Window.orderBy(col("k"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val want = df.withColumn("ps", sum(col("v")).over(w))
        .select(col("k"), col("ps")).collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1))).toMap
      assert(got == want, s"seed=$seed n=$n parts=$parts")
    }
  }
}
