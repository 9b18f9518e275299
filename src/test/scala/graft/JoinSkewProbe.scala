package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dsl.LazyFrame

/** Evidence probe (not CI) for the r12 verdict's skew task: a planted
  * 90%-one-key equi-join at sf10 scale, comparing
  *   (a) the naive shuffled join with AQE off — the hot reducer serializes,
  *   (b) AQE's runtime skew-join split (the default safety net),
  *   (c) `LazyFrame.joinSalted` — the explicit pre-shuffle valve.
  * Right side is orders-sized (15M rows at sf10) so neither side
  * broadcasts and the join genuinely shuffles (a broadcastable right side
  * has no skew problem to solve). Results land in SCALE.md.
  *
  * Run: SPARK_GRAFT_SF_DIR=/tmp/graft_sf10 sbt "Test/runMain graft.JoinSkewProbe"
  */
object JoinSkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf10")
    def session(aqe: Boolean, force: Boolean = false): SparkSession = {
      // fresh session per variant: AQE flags are read at planning time
      org.apache.spark.sql.SparkSession.getActiveSession
        .foreach(_.stop())
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", aqe.toString)
        .config("spark.sql.adaptive.skewJoin.enabled", aqe.toString)
        // the probe aggregates AFTER the join, so splitting the skewed
        // partition breaks the hash-partitioning the agg wants and AQE
        // declines the skew rewrite by default — force opts in to the
        // extra shuffle (measured: the r14 run without it showed AQE ≈
        // naive because the rewrite never fired)
        .config("spark.sql.adaptive.forceOptimizeSkewedJoin", force.toString)
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    }

    def run(tag: String, aqe: Boolean, salt: Int, passes: Int,
            force: Boolean = false): Double = {
      val spark = session(aqe, force)
      spark.sparkContext.setLogLevel("ERROR")
      // 90% of lineitem rows collapse onto orderkey 1; the rest keep their
      // own key — a single hot reducer holds ~54M rows at sf10
      val left = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(
          when(col("l_orderkey") % 10 < 9, lit(1L)).otherwise(col("l_orderkey"))
            .as("k"),
          col("l_extendedprice"), col("l_quantity"))
      val right = spark.read.parquet(s"$sfDir/orders.parquet")
        .select(col("o_orderkey").as("k"), col("o_custkey"), col("o_totalprice"))
      val ts = (1 to passes).map { p =>
        val t0 = System.nanoTime()
        val j =
          if (salt > 1) LazyFrame(left).joinSalted(LazyFrame(right), Seq("k"), salt).df
          else left.join(right, Seq("k"))
        j.select(count(lit(1)).as("rows"),
            sum(col("l_quantity") * col("o_totalprice")).as("chk"))
          .write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[joinskew] pass=$p $tag%-16s $s%.2f s")
        s
      }
      println(f"[joinskew] MIN $tag%-16s ${ts.min}%.2f s")
      ts.min
    }

    val passes = if (args.nonEmpty) args(0).toInt else 2
    val naive  = run("plain_noAQE", aqe = false, salt = 0, passes)
    val aqe    = run("plain_AQEskew", aqe = true, salt = 0, passes)
    val forced = run("AQEskew_forced", aqe = true, salt = 0, passes, force = true)
    val salted = run("salted16_AQE", aqe = true, salt = 16, passes)
    println(f"[joinskew] SUMMARY naive=$naive%.2f aqe=$aqe%.2f forced=$forced%.2f " +
      f"salted=$salted%.2f (aqe ${naive / aqe}%.2fx, forced ${naive / forced}%.2fx, " +
      f"salted ${naive / salted}%.2fx vs naive)")
  }
}
