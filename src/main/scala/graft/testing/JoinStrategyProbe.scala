package graft.testing

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r21 evidence probe: sort-merge vs shuffled-hash join above the broadcast
  * cap (opt guide §3.1 — "often faster when one side is moderately small
  * per partition"; Spark prefers SMJ unless
  * `spark.sql.join.preferSortMergeJoin=false`).
  *
  * Times the join_inner headline shape (orders ⋈ customer on custkey →
  * narrow select → total-order sort) with the planner's default (SMJ above
  * broadcast) vs preferSortMergeJoin=false (+ a
  * maxShuffledHashJoinLocalMapThreshold so AQE may also convert), both
  * runtime-settable SQL confs toggled inside one session, interleaved
  * passes, min/median via the noop sink. autoBroadcastJoinThreshold is
  * forced to -1 so the probe measures the two SHUFFLE strategies, not a
  * broadcast fallback.
  *
  * Usage: runMain graft.testing.JoinStrategyProbe [sfDir] [passes]
  */
object JoinStrategyProbe {
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
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def q: DataFrame =
      spark.read.parquet(s"$sfDir/orders.parquet")
        .join(spark.read.parquet(s"$sfDir/customer.parquet"),
          col("o_custkey") === col("c_custkey"), "inner")
        .select(col("o_orderkey"), col("c_custkey"), col("c_name"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .sort(col("o_orderkey"))

    def setSmj(prefer: Boolean): Unit = {
      spark.conf.set("spark.sql.join.preferSortMergeJoin", prefer.toString)
      spark.conf.set(
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        if (prefer) "0" else "256m")
    }
    def time(): Double = {
      val t0 = System.nanoTime()
      q.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    setSmj(true); time(); setSmj(false); time() // warm both
    val (smj, shj) = (1 to passes).map { i =>
      setSmj(true)
      spark.sparkContext.setJobDescription(s"join-strategy SMJ pass $i")
      val a = time()
      setSmj(false)
      spark.sparkContext.setJobDescription(s"join-strategy SHJ pass $i")
      val b = time()
      (a, b)
    }.unzip
    setSmj(false)
    val shjPlan = q.queryExecution.executedPlan.toString
    val gotShj = shjPlan.contains("ShuffledHashJoin")
    def mm(v: Seq[Double]) = { val s = v.sorted; (s.head, s(s.size / 2)) }
    val ((aMin, aMed), (bMin, bMed)) = (mm(smj), mm(shj))
    println(f"""{"metric":"join_strategy_probe","sf":"$sfDir","passes":$passes,"smj":{"min":$aMin%.3f,"median":$aMed%.3f},"shj":{"min":$bMin%.3f,"median":$bMed%.3f},"shj_planned":$gotShj,"speedup_min":${aMin / bMin}%.2f}""")
    spark.stop()
  }
}
