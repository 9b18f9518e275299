package graft.testing

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r21 evidence probe: A/B the two join_left_agg formulations above the
  * broadcast cap (opt guide §2.3 "aggregate before you shuffle").
  *
  *  A (pre-r21): customer LEFT JOIN orders, then groupBy(c_custkey) —
  *    every order ROW crosses the join and a customer-cardinality hash
  *    aggregate runs on the joined output.
  *  B (r21):     orders pre-aggregated per o_custkey, customer LEFT JOINs
  *    ONE row per customer; the agg exchange doubles as the join exchange.
  *
  * Usage: runMain graft.testing.PreAggProbe [sfDir] [passes]
  * Broadcast is capped at Spark's 10 MB default so the join strategy is
  * whatever the planner picks for the data size (at sf10 both sides exceed
  * it → shuffle join, the 100 TB shape). Prints one JSON line with
  * min/median seconds per shape.
  */
object PreAggProbe {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = if (args.length > 0) args(0) else "/tmp/graft_sf10"
    val passes = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def customer = spark.read.parquet(s"$sfDir/customer.parquet")
    def orders = spark.read.parquet(s"$sfDir/orders.parquet")

    def shapeA: DataFrame =
      customer.join(orders, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2).as("revenue"))
        .sort(col("c_custkey"))

    def shapeB: DataFrame = {
      val perCust = orders.groupBy(col("o_custkey"))
        .agg(count(col("o_orderkey")).as("__n"),
          sum(col("o_totalprice")).as("__rev"))
      customer.join(perCust, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"),
          coalesce(col("__n"), lit(0L)).as("n_orders"),
          round(coalesce(col("__rev"), lit(0.0)), 2).as("revenue"))
        .sort(col("c_custkey"))
    }

    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both paths once (JIT, page cache), then interleave timed passes
    spark.sparkContext.setJobDescription("preagg-probe warmup")
    time(shapeA); time(shapeB)
    val (as, bs) = (1 to passes).map { i =>
      spark.sparkContext.setJobDescription(s"preagg-probe A pass $i")
      val a = time(shapeA)
      spark.sparkContext.setJobDescription(s"preagg-probe B pass $i")
      val b = time(shapeB)
      (a, b)
    }.unzip
    def mm(v: Seq[Double]) = { val s = v.sorted; (s.head, s(s.size / 2)) }
    val ((aMin, aMed), (bMin, bMed)) = (mm(as), mm(bs))
    println(f"""{"metric":"preagg_probe","sf":"$sfDir","passes":$passes,"joined_then_agg":{"min":$aMin%.3f,"median":$aMed%.3f},"preagg_then_join":{"min":$bMin%.3f,"median":$bMed%.3f},"speedup_min":${aMin / bMin}%.2f}""")
    spark.stop()
  }
}
