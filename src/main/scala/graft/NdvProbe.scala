package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Plan-shape probe (not part of the library) for the r12 verdict's
  * `agg_count_distinct` task: times competing physical shapes for "two
  * exact NDVs per group" and the two `agg_tpch_q1` accumulator designs on
  * the SAME host in the SAME JVM, so the comparison is free of the
  * cross-round host-noise that makes BENCH minima ambiguous.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/graft_sf100 runMain graft.NdvProbe [passes]
  */
object NdvProbe {
  def main(args: Array[String]): Unit = {
    val passes = if (args.nonEmpty) args(0).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf100")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")

    // -- NDV shapes ---------------------------------------------------------
    // expand: the single groupBy with two countDistinct (Catalyst Expand,
    //         input triples before the first shuffle)
    def vExpand() = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("ndv_part"),
        countDistinct(col("l_suppkey")).as("ndv_supp"),
        count(lit(1)).as("n"))

    // split3: Expand-free — each NDV its own partial-distinct aggregate,
    //         three column-pruned scans, 3-row broadcast joins
    def vSplit3() = {
      def ndv(c: String, as: String) =
        li.select(col("l_returnflag"), col(c)).distinct()
          .groupBy(col("l_returnflag")).agg(count(lit(1)).as(as))
      ndv("l_partkey", "ndv_part")
        .join(ndv("l_suppkey", "ndv_supp"), Seq("l_returnflag"))
        .join(li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n")),
          Seq("l_returnflag"))
    }

    // -- q1 accumulator shapes ---------------------------------------------
    def q1Common(sumCharge: (org.apache.spark.sql.Column,
                             org.apache.spark.sql.Column) =>
                             org.apache.spark.sql.Column) = {
      val base = li
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .withColumn("__c", round(col("l_extendedprice") * 100).cast("long"))
        .withColumn("__df", round((lit(1) - col("l_discount")) * 100).cast("long"))
        .withColumn("__tf", round((lit(1) + col("l_tax")) * 100).cast("long"))
        .withColumn("__dp", col("__c") * col("__df"))
        .withColumn("__ch", col("__dp") * col("__tf"))
      base.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
          (sum(col("__c")).cast("double") / 100).as("sum_base_price"),
          sumCharge(col("__dp"), col("__ch")).as("sum_charge"),
          count(lit(1)).as("count_order"))
    }
    // decimal(38,0) accumulator (the r12 shape)
    def vQ1Decimal() = q1Common((_, ch) =>
      sum(ch.cast("decimal(38,0)")).cast("double") / 1e6)
    // hi/lo long split at bit 25 (the r13 shape)
    def vQ1HiLo() = q1Common((_, ch) =>
      (sum(shiftright(ch, 25)).cast("double") * (1L << 25).toDouble
        + sum(ch.bitwiseAND(lit((1L << 25) - 1))).cast("double")) / 1e6)

    // one-pass TypedImperativeAggregate (functions/NdvAgg.scala)
    def vNdvAgg() = li.groupBy(col("l_returnflag"))
      .agg(graft.functions.ndvAgg(col("l_partkey")).as("ndv_part"),
        graft.functions.ndvAgg(col("l_suppkey")).as("ndv_supp"),
        count(lit(1)).as("n"))

    // the HLL sketch path (graft_approx_ndv) — the 100 TB recipe when a
    // few-percent error is acceptable; rides codegen HashAggregate
    def vHll() = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.01).as("ndv_part"),
        approx_count_distinct(col("l_suppkey"), 0.01).as("ndv_supp"),
        count(lit(1)).as("n"))

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "ndv_expand" -> (() => vExpand()),
      "ndv_split3" -> (() => vSplit3()),
      "ndv_agg1pass" -> (() => vNdvAgg()),
      "ndv_hll" -> (() => vHll()),
      "q1_decimal" -> (() => vQ1Decimal()),
      "q1_hilo"    -> (() => vQ1HiLo()))

    // warm
    variants.foreach { case (_, f) =>
      f().limit(1).write.format("noop").mode("overwrite").save() }

    val results = (1 to passes).map { p =>
      variants.map { case (name, f) =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[ndvprobe] pass=$p $name%-12s $s%.3f s")
        name -> s
      }
    }
    variants.foreach { case (name, _) =>
      val ts = results.map(_.toMap.apply(name))
      println(f"[ndvprobe] MIN $name%-12s ${ts.min}%.3f s  (median ${ts.sorted.apply(ts.size / 2)}%.3f)")
    }
    spark.stop()
  }
}
