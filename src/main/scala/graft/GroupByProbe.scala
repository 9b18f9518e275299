package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Plan-shape probe for the H2O group-by suite's high-cardinality keys
  * (q3/q5/q7: ~N/K distinct groups — 1e7 at N=1e9). The default
  * HashAggregate(partial) builds a per-task map of up to ALL group keys
  * (1e7 entries, hundreds of MB, DRAM-latency-bound probing and little
  * combine reduction at this cardinality); the alternative shuffles the
  * RAW rows on the group key first, after which both aggregate passes see
  * only groups/parts keys per task (~1e7/32 — cache-resident maps) and the
  * partial pass is a no-op-cheap pre-combiner. The trade is raw-row
  * shuffle bytes vs map locality; this probe measures both sides at any N
  * so SCALE.md can record where the crossover sits (measured at N=1e9:
  * near-neutral — q5 repart 87 s vs 110 s default, q3 86 vs 81 — so the
  * engine keeps Spark's default combine-then-shuffle plan).
  *
  * Second family: TypedImperativeAggregate queries (q6 Spark median, q8
  * graft topKAgg) run through ObjectHashAggregateExec, which falls back to
  * SORT-based aggregation once a task's hash map passes
  * spark.sql.objectHashAggregate.sortBased.fallbackThreshold — default 128
  * keys, i.e. ~always at H2O cardinalities, turning the partial pass into
  * a full sort of the task's rows. The *_hash variants raise the threshold
  * so the map stays hash-mode (the memory trade: every group's aggregation
  * buffer lives in the map simultaneously). Measured at N=1e9: q8_hash is
  * a DNF — 1e7 simultaneous TopK object buffers GC-thrashed a 96 GiB heap
  * (executor evicted on heartbeat timeout; q8_default finished in 110.6 s
  * in the same JVM). The sort-based fallback is the right plan at high
  * NDV; results recorded in BASELINE.md's N=1e9 section.
  *
  * Usage: SPARK_GRAFT_SHUFFLE_CODEC=zstd
  *   runMain graft.GroupByProbe [N] [K] [passes] [family]
  * where family selects the variant table: sum (default, q3/q5
  * default-vs-repart), typed (q6/q8 fallback-threshold), q10
  * (default-vs-repart at NDV≈rows), or all.
  */
object GroupByProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toDouble.toLong else 100000000L
    val k = if (args.length > 1) args(1).toInt else 100
    val passes = if (args.length > 2) args(2).toInt else 1
    val spark = BenchSession.build()
    import BenchSession.reclaim

    val df = GroupByBench.gen(spark, n, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    df.count()

    val family = if (args.length > 3) args(3) else "sum"
    val fallbackKey = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    def thresh(v: String): Unit = spark.conf.set(fallbackKey, v)

    val sumFamily: Seq[(String, () => DataFrame)] = Seq(
      "q5_default" -> (() => df.groupBy("id6")
        .agg(sum("v1").as("v1"), sum("v2").as("v2"), sum("v3").as("v3"))),
      // project-then-shuffle-raw: the aggregate's requirement is satisfied
      // by the explicit hash exchange, so no wide pre-shuffle map exists
      "q5_repart" -> (() => df.select("id6", "v1", "v2", "v3")
        .repartition(col("id6")).groupBy("id6")
        .agg(sum("v1").as("v1"), sum("v2").as("v2"), sum("v3").as("v3"))),
      "q3_default" -> (() => df.groupBy("id3")
        .agg(sum("v1").as("v1"), avg("v3").as("v3"))),
      "q3_repart" -> (() => df.select("id3", "v1", "v3")
        .repartition(col("id3")).groupBy("id3")
        .agg(sum("v1").as("v1"), avg("v3").as("v3")))
    )
    // q10's six-key groups are ~unique at any N (id3 alone carries N/K
    // distinct values), so the partial pass gets ZERO combine reduction yet
    // still pays to build + spill a row-count-sized hash map per task
    // before the shuffle writes the same bytes again — the repart variant
    // shuffles the raw rows once and aggregates once. Measured at N=1e9:
    // q10_default 533.1 s; q10_repart DISK-DNF — the explicit exchange's
    // ~36 GB raw shuffle stays pinned for the whole downstream stage while
    // the aggregate's sort-spill grows beside it, filling a 61 GB scratch
    // disk. The default's partial spill is per-task-temporary (released as
    // tasks finish), so its peak disk is strictly lower: keep the default.
    val q10Family: Seq[(String, () => DataFrame)] = Seq(
      "q10_default" -> (() => df.groupBy("id1", "id2", "id3", "id4", "id5", "id6")
        .agg(sum("v3").as("v3"), count(lit(1)).as("count"))),
      "q10_repart" -> (() => df
        .select("id1", "id2", "id3", "id4", "id5", "id6", "v3")
        .repartition(col("id1"), col("id2"), col("id3"), col("id4"),
          col("id5"), col("id6"))
        .groupBy("id1", "id2", "id3", "id4", "id5", "id6")
        .agg(sum("v3").as("v3"), count(lit(1)).as("count")))
    )
    val typedFamily: Seq[(String, () => DataFrame)] = Seq(
      "q8_default" -> (() => { thresh("128")
        df.groupBy("id6")
          .agg(graft.functions.topKAgg(col("v3"), 2).as("largest2_v3")) }),
      "q8_hash" -> (() => { thresh("25000000")
        df.groupBy("id6")
          .agg(graft.functions.topKAgg(col("v3"), 2).as("largest2_v3")) }),
      "q6_default" -> (() => { thresh("128")
        df.groupBy("id4", "id5")
          .agg(median(col("v3")).as("median_v3"), stddev("v3").as("sd_v3")) }),
      "q6_hash" -> (() => { thresh("25000000")
        df.groupBy("id4", "id5")
          .agg(median(col("v3")).as("median_v3"), stddev("v3").as("sd_v3")) })
    )
    val variants = family match {
      case "sum"   => sumFamily
      case "typed" => typedFamily
      case "q10"   => q10Family
      case "all"   => sumFamily ++ typedFamily ++ q10Family
      // fail loudly: a typo'd family would otherwise silently run the sum
      // variants for many minutes and record them under the wrong label
      case other => sys.error(s"unknown family '$other' — one of: sum, typed, q10, all")
    }
    // one cheap warm pass (JIT + cache touch); per-variant warm-ups would
    // double multi-minute runs for no extra signal at this data size
    df.groupBy("id4").agg(sum("v1")).write.format("noop")
      .mode("overwrite").save()
    reclaim()
    variants.foreach { case (name, q) =>
      val ts = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        q().write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        reclaim(); s
      }
      println(f"[gbprobe] MIN $name%-12s ${ts.min}%.3f s  (n=$n k=$k)")
    }
    spark.stop()
  }
}
