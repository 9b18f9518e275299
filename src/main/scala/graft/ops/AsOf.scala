package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join (polars join_asof, reference
  * crates/polars-ops/src/frame/join/asof/mod.rs:262-270 — strategies
  * Backward/Forward/Nearest, optional `by` grouping and tolerance).
  *
  * Spark has no native as-of join. Implementation: the union + running-window
  * trick — tag both sides, union on (by, key), and carry the most recent
  * right-side row forward with `last(_, ignoreNulls)` over an ordered window.
  *
  * Scale properties: ONE shuffle on the `by` keys (or a single range
  * repartition when `by` is empty), no O(n·m) probing, no broadcast
  * requirement — both sides can be 100 TB. Skewed `by` keys hit the same
  * window-skew limits as any Spark window (mitigate upstream with salting if
  * one group dominates).
  */
object AsOf {

  def join(left: DataFrame, right: DataFrame, leftOn: String, rightOn: String,
           by: Seq[String], strategy: String, tolerance: Option[Column]): DataFrame =
    strategy match {
      case "backward" => directional(left, right, leftOn, rightOn, by, tolerance, forward = false)
      case "forward"  => directional(left, right, leftOn, rightOn, by, tolerance, forward = true)
      case "nearest"  => nearest(left, right, leftOn, rightOn, by, tolerance)
      case other      => throw new IllegalArgumentException(s"unknown asof strategy: $other")
    }

  private def directional(left: DataFrame, right: DataFrame, leftOn: String,
                          rightOn: String, by: Seq[String], tolerance: Option[Column],
                          forward: Boolean): DataFrame = {
    val rightCols = right.columns.filterNot(c => c == rightOn || by.contains(c)).toSeq
    val keyT = left.schema(leftOn).dataType

    // common shape: (by..., __k, __tag, leftCols..., __r_<rightCols>...)
    val l = left
      .withColumn("__k", col(leftOn).cast(keyT))
      .withColumn("__tag", lit(1))
      .withColumns(rightCols.map(c => s"__r_$c" -> lit(null).cast(right.schema(c).dataType)).toMap)
      .withColumn("__rk", lit(null).cast(keyT))
    val leftCols = left.columns.filterNot(by.contains).toSeq
    val r = right
      .withColumn("__k", col(rightOn).cast(keyT))
      .withColumn("__tag", lit(0))
      .withColumns(rightCols.map(c => s"__r_$c" -> col(c)).toMap)
      .withColumn("__rk", col(rightOn))
      .drop(rightCols: _*)
      .withColumns(leftCols.map(c => c -> lit(null).cast(left.schema(c).dataType)).toMap)

    val cols = (by ++ leftCols ++ Seq("__k", "__tag", "__rk") ++ rightCols.map(c => s"__r_$c")).map(col)
    // drop right rows with a null join key up front: an as-of match on a null
    // key is meaningless, and keeping them would make the keyed window carry
    // their values while the keyless boundary-carry (min_by/max_by on __k)
    // skips them — the two paths must agree
    val unioned = l.select(cols: _*).unionByName(r.select(cols: _*))
      .filter(col("__tag") === 1 || col("__k").isNotNull)

    // backward: right rows at the same key match (right sorts before left via
    // tag); forward: mirror by negating the sort.
    val ord =
      if (forward) Seq(col("__k").desc, col("__tag").asc)
      else Seq(col("__k").asc, col("__tag").asc)

    val matched =
      if (by.nonEmpty) {
        val w = Window.partitionBy(by.map(col): _*)
          .orderBy(ord: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        rightCols.foldLeft(
          unioned.withColumn("__mk", last(col("__rk"), ignoreNulls = true).over(w))
        ) { (d, c) => d.withColumn(s"__m_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w)) }
      } else keylessMatched(unioned, rightCols, ord, forward)

    val withinTol = tolerance match {
      case None => lit(true)
      case Some(tol) =>
        val dist = if (forward) col("__mk").cast("double") - col("__k").cast("double")
                   else col("__k").cast("double") - col("__mk").cast("double")
        dist <= tol.cast("double")
    }

    val out = matched.filter(col("__tag") === 1)
    // surface the matched right key under its original name (when distinct
    // from the left key) — callers and oracles need it for tolerance checks
    val keyOut =
      if (rightOn != leftOn && !by.contains(rightOn) && !leftCols.contains(rightOn))
        Seq(when(col("__mk").isNotNull && withinTol, col("__mk")).as(rightOn))
      else Nil
    val proj =
      (by ++ leftCols).map(col) ++ keyOut ++
      rightCols.map(c => when(col("__mk").isNotNull && withinTol, col(s"__m_$c")).as(c))
    out.select(proj: _*)
  }

  /** Keyless as-of matching that scales: a bare `Window.partitionBy()` would
    * move BOTH frames to one task. Instead:
    *   1. range-repartition the union on the key — contiguous key ranges,
    *      one per partition, all tasks busy;
    *   2. run the carry-forward window per range partition (partition id is
    *      stable under AQE coalescing — adjacent ranges merge, order holds);
    *   3. fix up boundaries: per partition, aggregate the last non-null
    *      right value per column (same column-independent semantics as
    *      `last(_, ignoreNulls)`), running-carry those across partitions —
    *      an N-row frame (N = shuffle partitions, metadata-scale, so its
    *      global window is fine) — and broadcast-join the carry-in back.
    */
  private def keylessMatched(unioned: DataFrame, rightCols: Seq[String],
                             ord: Seq[Column], forward: Boolean): DataFrame = {
    val rangeOrd =
      if (forward) Seq(col("__k").desc, col("__tag").asc)
      else Seq(col("__k").asc, col("__tag").asc)
    val ranged = unioned.repartitionByRange(rangeOrd: _*)
      .withColumn("__pid", spark_partition_id())

    val w = Window.partitionBy(col("__pid")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = rightCols.foldLeft(
      ranged.withColumn("__mk", last(col("__rk"), ignoreNulls = true).over(w))
    ) { (d, c) => d.withColumn(s"__m_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w)) }

    // Last non-null right value per column per partition ("last" in scan
    // order = max key backward / min key forward; the ordering argument is
    // null unless this row is a right row with a non-null value, which
    // min_by/max_by skip).
    def lastIn(value: Column, isRight: Column): Column = {
      val o = when(isRight && value.isNotNull, col("__k"))
      if (forward) min_by(value, o) else max_by(value, o)
    }
    val isR = col("__tag") === 0
    // "__key__" can't collide: right columns named __k/__rk were renamed away
    val carryCols = "__key__" +: rightCols
    val perPid = ranged.groupBy(col("__pid")).agg(
      lastIn(col("__rk"), isR).as("__c___key__"),
      rightCols.map(c => lastIn(col(s"__r_$c"), isR).as(s"__c_$c")): _*)

    // Running carry-in over the N-row per-partition frame (strictly earlier
    // partitions), then broadcast back.
    val wc = Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)
    val carry = perPid.select(
      (col("__pid") +:
        carryCols.map(c =>
          last(col(s"__c_$c"), ignoreNulls = true).over(wc).as(s"__in_$c"))): _*)

    val joined = local.join(broadcast(carry), Seq("__pid"), "left")
    rightCols.foldLeft(
      joined.withColumn("__mk", coalesce(col("__mk"), col("__in___key__")))
    ) { (d, c) => d.withColumn(s"__m_$c", coalesce(col(s"__m_$c"), col(s"__in_$c"))) }
  }

  private def nearest(left: DataFrame, right: DataFrame, leftOn: String,
                      rightOn: String, by: Seq[String], tolerance: Option[Column]): DataFrame = {
    // Run backward and forward passes, then keep whichever matched key is
    // closer (tie → backward, matching polars' preference for the earlier row).
    val rightCols = right.columns.filterNot(c => c == rightOn || by.contains(c)).toSeq
    val lid = left.withColumn("__lid", monotonically_increasing_id())

    def pass(suffix: String, forward: Boolean): DataFrame = {
      val renamed = rightCols.foldLeft(right.withColumn(s"__key$suffix", col(rightOn))) {
        (d, c) => d.withColumnRenamed(c, s"$c$suffix")
      }
      directional(lid, renamed, leftOn, rightOn, by, tolerance, forward)
    }

    val bwd = pass("__b", forward = false)
    val fwdCols = (Seq("__lid", s"__key__f") ++ rightCols.map(c => s"${c}__f")).map(col)
    val fwd = pass("__f", forward = true).select(fwdCols: _*)

    val joined = bwd.join(fwd, Seq("__lid"), "left")
    val lk = col(leftOn).cast("double")
    val db = abs(lk - col("__key__b").cast("double"))
    val df_ = abs(col("__key__f").cast("double") - lk)
    val useB = col("__key__b").isNotNull && (col("__key__f").isNull || db <= df_)
    val keyOut =
      if (rightOn != leftOn && !by.contains(rightOn) && !left.columns.contains(rightOn))
        Seq(when(useB, col("__key__b")).otherwise(col("__key__f")).as(rightOn))
      else Nil
    val proj =
      (by ++ left.columns.filterNot(by.contains)).map(col) ++ keyOut ++
      rightCols.map(c => when(useB, col(s"${c}__b")).otherwise(col(s"${c}__f")).as(c))
    joined.select(proj: _*)
  }
}
