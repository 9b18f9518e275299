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
    def time(): Double = {
      val t0 = System.nanoTime()
      q.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def timedWithSpill(label: String, i: Int): (Double, Long, Long) = {
      spark.sparkContext.setJobDescription(s"join-strategy $label pass $i")
      val (m0, d0) = (spillMem.get, spillDisk.get)
      val dt = time()
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
    def finalPlanOf(): String = {
      val probe = q
      probe.write.format("noop").mode("overwrite").save()
      probe.queryExecution.executedPlan.toString
    }
    setSmj(true); time(); setSmj(false); time() // warm both
    val runs = (1 to passes).map { i =>
      setSmj(true)
      val a = timedWithSpill("SMJ", i)
      setSmj(false)
      val b = timedWithSpill("SHJ", i)
      (a, b)
    }
    val (smjR, shjR) = runs.unzip
    setSmj(false)
    val gotShj = finalPlanOf().contains("ShuffledHashJoin")
    setSmj(true)
    val smjInSmjMode = finalPlanOf().contains("SortMergeJoin")
    def mm(v: Seq[Double]) = { val s = v.sorted; (s.head, s(s.size / 2)) }
    val ((aMin, aMed), (bMin, bMed)) = (mm(smjR.map(_._1)), mm(shjR.map(_._1)))
    def spillStr(r: Seq[(Double, Long, Long)]) =
      s"""{"mem_mb":${r.map(_._2).sum / (1 << 20)},"disk_mb":${r.map(_._3).sum / (1 << 20)}}"""
    println(f"""{"metric":"join_strategy_probe","sf":"$sfDir","passes":$passes,"smj":{"min":$aMin%.3f,"median":$aMed%.3f,"spill":${spillStr(smjR)},"planned_smj":$smjInSmjMode},"shj":{"min":$bMin%.3f,"median":$bMed%.3f,"spill":${spillStr(shjR)},"planned_shj":$gotShj},"speedup_min":${aMin / bMin}%.2f}""")
    spark.stop()
  }
}
