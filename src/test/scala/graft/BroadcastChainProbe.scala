package graft

import org.apache.spark.sql.functions._
import graft.dsl.LazyFrame

/** r17 (VERDICT r16 task 5): `LazyFrame.autoBroadcast` reads Catalyst size
  * estimates per join call. Reading them from the OPTIMIZED plan runs the
  * full optimizer each time — O(N²) on an iteratively built join chain,
  * measured at ~70 ms/join by depth 50 (2.6 s for the 50-chain) vs ~7 ms
  * flat with the hint disabled. `estimatedBytes` therefore falls back to
  * the already-analyzed plan's stats past a 64-node budget, which brought
  * depth-50 cost to ~20 ms/join (1.4 s total) while shallow dims keep the
  * precise optimized estimate. Numbers recorded in SCALE.md.
  *
  * This probe pins both halves: construction cost at depth stays bounded,
  * and the hint still fires on small dims from inside a deep chain (the
  * fallback's coarse product-stats only ever make the deep side look
  * bigger — conservative in every direction that matters).
  */
class BroadcastChainProbe extends SparkSpec {

  private var lastChain: LazyFrame = _

  test("50-join iterative chain: bounded per-join cost, dims still broadcast-hinted") {
    val dims = (0 until 50).map { i =>
      spark.range(100).select(col("id").as("k"), (col("id") * i).as(s"v$i"))
    }
    // warm the join/analysis path so JIT doesn't bill the timed chain
    var w = LazyFrame(spark.range(100).select(col("id").as("k")))
    for (i <- 0 until 5) w = w.join(LazyFrame(dims(i)), Seq("k"))

    def chainDeepMean(): (Double, Seq[Double]) = {
      var lf = LazyFrame(spark.range(10000).select(col("id").as("k")))
      val times = (0 until 50).map { i =>
        val t0 = System.nanoTime()
        lf = lf.join(LazyFrame(dims(i)), Seq("k"))
        (System.nanoTime() - t0) / 1e6
      }
      val deep = times.takeRight(10)
      // the deep-suffix pin below reads the final lf's executed plan —
      // return it through a field to keep the timing helper reusable
      lastChain = lf
      (deep.sum / deep.size, times)
    }
    // same-run baseline: the identical chain with the hint disabled
    // (cap=0 short-circuits before any stats read) — host stalls inflate
    // baseline and candidate together, so the RELATIVE bound is immune to
    // the multi-minute interference windows this VM documents; the
    // absolute bound alone (10× the measured ~20 ms) would not be.
    val (baseMean, _) = withSQLConf("spark.graft.broadcastThreshold" -> "0") {
      chainDeepMean()
    }
    val (deepMean, times) = chainDeepMean()
    // measured: ~20 ms/join at depth with the node-budget guard, ~7 ms
    // with the hint disabled, ~70-80 ms on the regressed per-join
    // optimizer path (whose RATIO vs disabled also grows with depth).
    val bound = math.max(250.0, 12.0 * baseMean)
    assert(deepMean < bound,
      f"per-join plan construction at depth 40-50 averaged $deepMean%.1f ms " +
        f"vs hint-disabled baseline $baseMean%.1f ms (bound $bound%.0f; " +
        f"all: ${times.map(t => f"$t%.0f").mkString(",")}) — the " +
        "estimatedBytes node-budget guard has regressed")

    // the hint must still fire from inside the deep chain: every one of
    // the 50 tiny dims broadcasts, none degrades to a shuffle join
    val plan = lastChain.df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"deep-chain dims no longer broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"a dim in the deep chain degraded to a shuffle join:\n$plan")
  }
}
