package graft.testing

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** r22 evidence probe (r21 verdict item 6): can win_rank's 25-key window —
  * whose parallelism is bounded by the 25 nation groups however many cores
  * the cluster has (10.6 s at sf100) — be beaten by a two-pass
  * decomposition that range-partitions WITHIN groups?
  *
  * The decomposition leans on a declared-query property: the window order
  * (c_acctbal DESC, c_custkey ASC) carries a UNIQUE tie-break, so rows have
  * no peers and rank() = dense_rank() = row_number(); percent_rank,
  * cume_dist and ntile are then closed forms of (row_number, group size N):
  *   percent_rank = (rn-1)/(N-1)  (0 when N=1, Spark's convention)
  *   cume_dist    = rn/N
  *   ntile(4)     = first N%4 buckets hold ceil(N/4) rows, the rest floor
  *
  * Two-pass shape: range-repartition on (nation, acctbal DESC, custkey) —
  * a hot group spreads over MANY partitions — pin partition ids
  * (localCheckpoint, same reasoning as AsOf.rangedByMatched: two branches
  * must see the SAME sampled range bounds), run the row_number window per
  * (pid, nation), and add per-(pid, nation) count offsets computed on a
  * metadata-scale aggregate that broadcasts back. The checkpoint
  * materialization is charged to the decomposed variant — the comparison
  * is end-to-end honest.
  *
  * Prints min/median for both variants plus a full-result equality check
  * (exceptAll both ways) per pass batch.
  *
  * Usage: runMain graft.testing.WinRankProbe [sfDir] [passes]
  */
object WinRankProbe {
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

    // ---- baseline: the declared win_rank shape -----------------------------
    def baseline: DataFrame = {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      customer.select(
        col("c_custkey"), col("c_nationkey"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        row_number().over(w).as("rn"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w) * 10000) / 10000 as "prnk",
        round(cume_dist().over(w) * 10000) / 10000 as "cdist")
    }

    // ---- decomposed: ranged repartition + offset merge ---------------------
    def decomposed: DataFrame = {
      val ranged = customer
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
        .repartitionByRange(col("c_nationkey"), col("c_acctbal").desc,
          col("c_custkey").asc)
        .withColumn("__pid", spark_partition_id())
        .localCheckpoint(eager = false)
      val wLocal = Window.partitionBy(col("__pid"), col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      val local = ranged.withColumn("__lrn", row_number().over(wLocal))
      // per-(pid, nation) counts: metadata-scale (#partitions × 25 rows)
      val counts = ranged.groupBy(col("__pid"), col("c_nationkey"))
        .agg(count(lit(1)).as("__c"))
      val wOff = Window.partitionBy(col("c_nationkey")).orderBy(col("__pid"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wTot = Window.partitionBy(col("c_nationkey"))
      val offsets = counts
        .withColumn("__off", coalesce(sum(col("__c")).over(wOff), lit(0L)))
        .withColumn("__n", sum(col("__c")).over(wTot))
        .select(col("__pid"), col("c_nationkey"), col("__off"), col("__n"))
      val rn = (col("__lrn") + col("__off")).cast("int")
      val n = col("__n").cast("double")
      // Spark NTile(4): the first N%4 buckets hold N/4+1 rows
      val bSz = floor(col("__n") / 4).cast("long")
      val rem = (col("__n") % 4).cast("long")
      val thr = rem * (bSz + 1)
      val quartile = when(rn <= thr, (rn - 1).cast("long") / (bSz + 1))
        .otherwise(rem + (rn.cast("long") - thr - 1) / bSz) + 1
      local.join(broadcast(offsets), Seq("__pid", "c_nationkey"))
        .select(
          col("c_custkey"), col("c_nationkey"),
          rn.as("rnk"), rn.as("drnk"), rn.as("rn"),
          quartile.cast("int").as("quartile"),
          round(when(col("__n") > 1, (rn - 1) / (n - 1)).otherwise(0.0)
            * 10000) / 10000 as "prnk",
          round(rn / n * 10000) / 10000 as "cdist")
    }

    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // result identity, both directions, before any timing claims
    val d0 = decomposed
    val same = baseline.exceptAll(d0).isEmpty && d0.exceptAll(baseline).isEmpty
    time(baseline); time(decomposed) // warm
    val pairs = (1 to passes).map { i =>
      spark.sparkContext.setJobDescription(s"win-rank window pass $i")
      val a = time(baseline)
      spark.sparkContext.setJobDescription(s"win-rank decomposed pass $i")
      val b = time(decomposed)
      (a, b)
    }
    def mm(v: Seq[Double]) = { val s = v.sorted; (s.head, s(s.size / 2)) }
    val ((aMin, aMed), (bMin, bMed)) = (mm(pairs.map(_._1)), mm(pairs.map(_._2)))
    println(f"""{"metric":"win_rank_probe","sf":"$sfDir","passes":$passes,"results_identical":$same,"window":{"min":$aMin%.3f,"median":$aMed%.3f},"decomposed":{"min":$bMin%.3f,"median":$bMed%.3f},"speedup_min":${aMin / bMin}%.2f}""")
    spark.stop()
  }
}
