package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.AsOf

/** Evidence probe (not CI): the by-keyed as-of window path puts each
  * by-group on ONE task, so a dominant group serializes at exactly the
  * point a cluster has cores to spare; rangedBy spreads it across range
  * partitions for the price of one checkpoint materialization + carry
  * join. Run: sbt "Test/runMain graft.AsOfSkewProbe" — 8M-row left frame,
  * hot by-group holding 95% of rows, local[16].
  *
  * Expectation (and the honest trade): BELOW the skew threshold (few
  * cores, small groups) the window path wins — rangedBy pays
  * materialization for parallelism it can't use; as cores × group size
  * grow, the single hot-group task becomes the wall-clock floor of the
  * window path while rangedBy keeps scaling. That's why rangedBy is
  * opt-in rather than the default. */
object AsOfSkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = 8000000L
    val l = spark.range(n).select(
      when(col("id") % 20 =!= 0, lit(0L)).otherwise(col("id") % 7 + 1).as("g"),
      col("id").as("k"), (col("id") % 97).as("lv"))
    val r = spark.range(n / 4).select(
      when(col("id") % 20 =!= 0, lit(0L)).otherwise(col("id") % 7 + 1).as("g"),
      (col("id") * 4 + 1).as("rk"), (col("id") % 89).as("rv"))
    def time(tag: String, ranged: Boolean): Double = {
      val t0 = System.nanoTime()
      AsOf.join(l, r, "k", "rk", Seq("g"), "backward", None, rangedBy = ranged)
        .write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$tag%-10s $s%.2f s")
      s
    }
    time("warmup", ranged = false)
    val w = Seq.fill(2)(time("window", ranged = false)).min
    val rg = Seq.fill(2)(time("rangedBy", ranged = true)).min
    println(f"SPEEDUP=${w / rg}%.2fx (window $w%.2f s -> rangedBy $rg%.2f s)")
    spark.stop()
  }
}
