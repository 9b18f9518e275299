package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.IEJoin

/** Inequality-join probe (not part of the library): grid-partitioned
  * IEJoin vs the BroadcastNestedLoopJoin form on synthetic n×n inputs —
  * evidence for the SCALE.md inequality-join note. The grid prunes ~half
  * the candidate space and bounds per-task memory (no broadcast of a full
  * side); locally both shapes share the same cores, so the local delta
  * understates the cluster-scale gap where the BNLJ broadcast is the wall.
  * Usage: runMain graft.IEJoinProbe [n...] */
object IEJoinProbe {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq else Seq(10000L, 30000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def mk(n: Long, seed: Int) = spark.range(n).select(
      col("id"),
      (rand(seed) * 1000.0).as("x"),
      (rand(seed + 1) * 1000.0).as("y"))

    sizes.foreach { n =>
      val a = mk(n, 1).select(col("id").as("a_id"), col("x").as("ax"), col("y").as("ay"))
      val b = mk(n, 7).select(col("id").as("b_id"), col("x").as("bx"), col("y").as("by"))
      // two inequalities, ~4% joint selectivity: output stays county-able
      val resid = col("ay") > col("by") + lit(800.0)
      def time(label: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val c = f
        println(f"[iejoin] n=$n%d $label%-6s rows=$c%d time=${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      time("grid") {
        IEJoin.join(a, b, col("ax"), "<", col("bx") - lit(900.0), resid).count()
      }
      time("bnlj") {
        a.join(b, col("ax") < col("bx") - lit(900.0) && resid).count()
      }
    }
    spark.stop()
  }
}
