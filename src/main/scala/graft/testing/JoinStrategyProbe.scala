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

    // r22: the SHJ arm forces the strategy with the SHUFFLE_HASH hint
    // (build side = customer, the smaller input). The r21 arm only
    // flipped preferSortMergeJoin + the AQE local-map threshold — and the
    // final-plan check this probe now does (ADVICE r21) revealed neither
    // ever produced a ShuffledHashJoin here (with broadcast disabled the
    // static planner's canBuildLocalHashMap test uses the negative
    // threshold, and AQE declined the runtime conversion), so the r21
    // "A/B" timed SMJ against itself — the flip-flop WAS host noise.
    def q(shjHint: Boolean): DataFrame = {
      val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      spark.read.parquet(s"$sfDir/orders.parquet")
        .join(if (shjHint) cust.hint("shuffle_hash") else cust,
          col("o_custkey") === col("c_custkey"), "inner")
        .select(col("o_orderkey"), col("c_custkey"), col("c_name"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .sort(col("o_orderkey"))
    }

    def setSmj(prefer: Boolean): Unit = {
      spark.conf.set("spark.sql.join.preferSortMergeJoin", prefer.toString)
      spark.conf.set(
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        if (prefer) "0" else "256m")
    }
    // spill instrumentation (r21 verdict item 8): sum task-level memory /
    // disk spill bytes between marks, so each strategy's runs carry their
    // own spill evidence — the r21 A/B flip-flop could not distinguish
    // host noise from memory pressure.
    val spillMem = new java.util.concurrent.atomic.AtomicLong
    val spillDisk = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) {
            spillMem.addAndGet(m.memoryBytesSpilled)
            spillDisk.addAndGet(m.diskBytesSpilled)
          }
        }
      })
    def time(shjHint: Boolean): Double = {
      val t0 = System.nanoTime()
      q(shjHint).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def timedWithSpill(label: String, i: Int,
                       shjHint: Boolean): (Double, Long, Long) = {
      spark.sparkContext.setJobDescription(s"join-strategy $label pass $i")
      val (m0, d0) = (spillMem.get, spillDisk.get)
      val dt = time(shjHint)
      // listener events drain asynchronously (the bus-drain API is
      // private[spark]); poll until the counters settle
      var last = (spillMem.get, spillDisk.get)
      var settled = false
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      while (!settled && System.nanoTime() < deadline) {
        Thread.sleep(100)
        val now = (spillMem.get, spillDisk.get)
        settled = now == last
        last = now
      }
      (dt, spillMem.get - m0, spillDisk.get - d0)
    }
    // ADVICE r21: the planned-strategy flag must come from an EXECUTED
    // query's final adaptive plan — the un-executed AdaptiveSparkPlan
    // (isFinalPlan=false) shows the static SMJ shape, and with broadcast
    // disabled the static planner can never pick SHJ, so the old flag
    // could read false even when AQE converted the timed runs.
    def finalPlanOf(shjHint: Boolean): String = {
      val probe = q(shjHint)
      probe.write.format("noop").mode("overwrite").save()
      probe.queryExecution.executedPlan.toString
    }
    setSmj(true); time(false); setSmj(false); time(true) // warm both
    val runs = (1 to passes).map { i =>
      setSmj(true)
      val a = timedWithSpill("SMJ", i, shjHint = false)
      setSmj(false)
      val b = timedWithSpill("SHJ", i, shjHint = true)
      (a, b)
    }
    val (smjR, shjR) = runs.unzip
    setSmj(false)
    val gotShj = finalPlanOf(shjHint = true).contains("ShuffledHashJoin")
    setSmj(true)
    val smjInSmjMode = finalPlanOf(shjHint = false).contains("SortMergeJoin")
    def mm(v: Seq[Double]) = { val s = v.sorted; (s.head, s(s.size / 2)) }
    val ((aMin, aMed), (bMin, bMed)) = (mm(smjR.map(_._1)), mm(shjR.map(_._1)))
    def spillStr(r: Seq[(Double, Long, Long)]) =
      s"""{"mem_mb":${r.map(_._2).sum / (1 << 20)},"disk_mb":${r.map(_._3).sum / (1 << 20)}}"""
    println(f"""{"metric":"join_strategy_probe","sf":"$sfDir","passes":$passes,"smj":{"min":$aMin%.3f,"median":$aMed%.3f,"spill":${spillStr(smjR)},"planned_smj":$smjInSmjMode},"shj":{"min":$bMin%.3f,"median":$bMed%.3f,"spill":${spillStr(shjR)},"planned_shj":$gotShj},"speedup_min":${aMin / bMin}%.2f}""")
    spark.stop()
  }
}
