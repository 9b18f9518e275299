package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DataType, DateType, TimestampNTZType, TimestampType}

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
  * requirement — both sides can be 100 TB. Skewed `by` keys: the default
  * keyed window puts each by-group on one task; pass `rangedBy = true` for
  * the range-partitioned boundary-carry variant (r7), which spreads a
  * dominant group over many partitions at the cost of one extra carry join.
  */
object AsOf {

  /** `rangedBy = true` replaces the per-`by`-group window with a range
    * partitioning on (by, key) plus a per-group boundary carry — the skew
    * answer when ONE by-group dominates (a single instrument with half the
    * ticks would otherwise pin its whole group on one task). Costs one
    * extra metadata-side shuffle for the carry join; identical results
    * (property-spec'd), so keep the default for well-distributed keys. */
  def join(left: DataFrame, right: DataFrame, leftOn: String, rightOn: String,
           by: Seq[String], strategy: String, tolerance: Option[Column],
           rangedBy: Boolean = false): DataFrame =
    dispatch(prepUnion(left, right, leftOn, rightOn, by),
      leftOn, rightOn, by, strategy, tolerance, rangedBy)

  /** As-of join where BOTH sides are row-slices of ONE frame, discriminated
    * by two disjoint predicates — the "events split into streams" pattern
    * (left = src where leftWhen, right = src where rightWhen). `join` on
    * two filtered reads of the same table plans two full scans of it (the
    * union's branches cannot be fused by Catalyst); this builds the tagged
    * union in a single conditional projection over ONE scan, so the input
    * is read once (opt guide §6 — at scale the as-of's dominant I/O).
    *
    * `leftCols` / `rightCols` define each side's frame as (name, expr over
    * `src`) pairs, exactly the `.select` the caller would have passed to
    * `join`; `leftWhen` / `rightWhen` MUST be disjoint (a row satisfying
    * both would need to appear on both sides — use `join` for that) and
    * rows satisfying neither are dropped. Row-for-row equal to
    * {{{
    *   join(src.filter(leftWhen).select(leftCols...),
    *        src.filter(rightWhen).select(rightCols...), ...)
    * }}}
    * — the union rows are the same multiset with the same types, and every
    * downstream step is the shared matcher code. (Equality of the declared
    * as-of query results under this rewrite is additionally pinned by the
    * DuckDB oracle at three SFs.) */
  def joinSliced(src: DataFrame,
                 leftWhen: Column, leftCols: Seq[(String, Column)],
                 rightWhen: Column, rightCols: Seq[(String, Column)],
                 leftOn: String, rightOn: String, by: Seq[String],
                 strategy: String, tolerance: Option[Column],
                 rangedBy: Boolean = false): DataFrame =
    dispatch(prepUnionSliced(src, leftWhen, leftCols, rightWhen, rightCols,
      leftOn, rightOn, by), leftOn, rightOn, by, strategy, tolerance, rangedBy)

  private def dispatch(prepared: (DataFrame, Seq[String], Seq[String]),
                       leftOn: String, rightOn: String, by: Seq[String],
                       strategy: String, tolerance: Option[Column],
                       rangedBy: Boolean): DataFrame =
    strategy match {
      case "backward" => directional(prepared, leftOn, rightOn, by, tolerance, forward = false, rangedBy)
      case "forward"  => directional(prepared, leftOn, rightOn, by, tolerance, forward = true, rangedBy)
      case "nearest"  => nearest(prepared, leftOn, rightOn, by, tolerance, rangedBy)
      case other      => throw new IllegalArgumentException(s"unknown asof strategy: $other")
    }

  /** Shared union prep: (by..., leftCols..., __k, __tag, __rk, __r_<c>...).
    * Returns (unioned, leftCols, rightCols). */
  private def prepUnion(left: DataFrame, right: DataFrame, leftOn: String,
                        rightOn: String, by: Seq[String])
      : (DataFrame, Seq[String], Seq[String]) = {
    val rightCols = right.columns.filterNot(c => c == rightOn || by.contains(c)).toSeq
    val keyT = left.schema(leftOn).dataType

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
    (unioned, leftCols, rightCols)
  }

  /** [[prepUnion]] for [[joinSliced]]: the same tagged-union columns, built
    * as ONE conditional projection over a single pass of `src` instead of a
    * union of two filtered branches. Column-for-column mirror of
    * [[prepUnion]]'s output — same names, same order, same types (left
    * payload nulls typed by the left side's schema, `__r_*` nulls by the
    * right side's), same trailing null-right-key filter — so the matchers
    * downstream see an identical frame. */
  private def prepUnionSliced(src: DataFrame,
                              leftWhen: Column, leftSel: Seq[(String, Column)],
                              rightWhen: Column, rightSel: Seq[(String, Column)],
                              leftOn: String, rightOn: String, by: Seq[String])
      : (DataFrame, Seq[String], Seq[String]) = {
    val lMap = leftSel.toMap
    val rMap = rightSel.toMap
    require(by.forall(b => lMap.contains(b) && rMap.contains(b)),
      s"joinSliced: by columns $by must appear in both sides' projections")
    // each side's schema, derived from exactly the projection `join` would
    // have been handed
    val lSchema = src.select(leftSel.map { case (n, c) => c.as(n) }: _*).schema
    val rSchema = src.select(rightSel.map { case (n, c) => c.as(n) }: _*).schema
    val keyT = lSchema(leftOn).dataType
    require(rSchema(rightOn).dataType == keyT,
      s"joinSliced requires equal key types, got $keyT vs " +
        s"${rSchema(rightOn).dataType} — cast in the side projections")
    val leftCols = leftSel.map(_._1).filterNot(by.contains)
    val rightCols = rightSel.map(_._1)
      .filterNot(c => c == rightOn || by.contains(c))
    val isL = leftWhen
    val cols: Seq[Column] =
      by.map(b => when(isL, lMap(b)).otherwise(rMap(b)).as(b)) ++
      leftCols.map(c => when(isL, lMap(c))
        .otherwise(lit(null).cast(lSchema(c).dataType)).as(c)) ++
      Seq(
        when(isL, lMap(leftOn)).otherwise(rMap(rightOn)).cast(keyT).as("__k"),
        when(isL, lit(1)).otherwise(lit(0)).as("__tag"),
        when(isL, lit(null).cast(keyT)).otherwise(rMap(rightOn)).as("__rk")) ++
      rightCols.map(c => when(isL, lit(null).cast(rSchema(c).dataType))
        .otherwise(rMap(c)).as(s"__r_$c"))
    // rows on neither side drop here (a null predicate is false on both
    // paths, same as the two filters it replaces); the __k null gate is
    // prepUnion's verbatim
    val unioned = src.filter(leftWhen || rightWhen).select(cols: _*)
      .filter(col("__tag") === 1 || col("__k").isNotNull)
    (unioned, leftCols, rightCols)
  }

  /** One directional match over a prepared union: appends `__mk<suffix>`
    * and `__m_<c><suffix>`, preserving the input's columns (internals of
    * whichever matcher ran are projected away — callers can chain passes).
    *
    * DETERMINISM CONTRACT for duplicate right keys (r13 verdict item 2):
    * polars breaks ties by frame order (asof/mod.rs:262-270 keeps the
    * scan-last row) — a distributed engine has no global frame order, so
    * the contract here is a total VALUE order instead: among right rows
    * sharing (by, key), the carried row is the one greatest (backward) /
    * least (forward) by its payload columns, compared left-to-right in
    * right-frame column order (orderable types only; nulls smallest).
    * Without the tie-break, `last(_, ignoreNulls)` over a (__k, __tag)-only
    * ordering picked whichever tied row a partition delivered last — two
    * runs of the same plan could carry different values (the r13
    * PlanSerdeSpec flake). The tie direction FOLLOWS the key direction so
    * the window's pick and the boundary-carry paths' min_by/max_by-over-
    * struct pick are the same row.
    *
    * Caveat (documented limit, not a defect): the tie-break spans only
    * ORDERABLE payload columns (RowOrdering.isOrderable). Tied right rows
    * distinguishable solely by a non-orderable column (e.g. MapType) have
    * no total value order to pin them, and the carried value for that
    * column is unspecified among the tied rows — the same contract as any
    * ordering over an unordered type. Orderable payloads (all driver
    * fixtures, and anything polars itself can sort) are fully
    * deterministic. */
  private def matchOnce(unioned: DataFrame, by: Seq[String], rightCols: Seq[String],
                        forward: Boolean, rangedBy: Boolean,
                        suffix: String = ""): DataFrame = {
    // backward: right rows at the same key match (right sorts before left via
    // tag); forward: mirror by negating the sort.
    val tieCols = rightCols.filter { c =>
      org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(unioned.schema(s"__r_$c").dataType)
    }
    val ord =
      (if (forward) Seq(col("__k").desc, col("__tag").asc)
       else Seq(col("__k").asc, col("__tag").asc)) ++
      tieCols.map(c => if (forward) col(s"__r_$c").desc else col(s"__r_$c").asc)
    val m =
      if (by.nonEmpty && rangedBy) rangedByMatched(unioned, by, rightCols, tieCols, ord, forward)
      else if (by.nonEmpty) {
        val w = Window.partitionBy(by.map(col): _*)
          .orderBy(ord: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        rightCols.foldLeft(
          unioned.withColumn("__mk", last(col("__rk"), ignoreNulls = true).over(w))
        ) { (d, c) => d.withColumn(s"__m_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w)) }
      } else keylessMatched(unioned, rightCols, tieCols, ord, forward)
    m.select((unioned.columns.map(col) :+ col("__mk").as(s"__mk$suffix")) ++
      rightCols.map(c => col(s"__m_$c").as(s"__m_$c$suffix")): _*)
  }

  /** Signed key distance for nearest/tolerance math. Datetime keys subtract
    * natively (timestamp/ntz/date differences are exact intervals — a
    * TIMESTAMP_NTZ key cannot cast to double at all, which redded the r18
    * nearest fuzz shape on o_orderdate); numeric keys go through double. */
  private def keyDelta(a: Column, b: Column, dt: DataType): Column = dt match {
    case TimestampType | TimestampNTZType | DateType => a - b
    case _ => a.cast("double") - b.cast("double")
  }

  /** Key as an epoch-seconds double for the NUMERIC-tolerance contract
    * (tolerance is given in the key's comparison units — seconds for
    * datetime keys, as join_asof_tolerance documents). NTZ/date go through
    * TimestampType first (double-cast is defined only there); the session
    * runs UTC in every graft main, so the wall-clock mapping is exact. */
  private def numKey(c: Column, dt: DataType): Column = dt match {
    case TimestampNTZType | DateType => c.cast(TimestampType).cast("double")
    case _ => c.cast("double")
  }

  private def directional(prepared: (DataFrame, Seq[String], Seq[String]),
                          leftOn: String, rightOn: String, by: Seq[String],
                          tolerance: Option[Column],
                          forward: Boolean, rangedBy: Boolean): DataFrame = {
    val (unioned, leftCols, rightCols) = prepared
    val matched = matchOnce(unioned, by, rightCols, forward, rangedBy)

    val withinTol = tolerance match {
      case None => lit(true)
      case Some(tol) =>
        val kDt = matched.schema("__k").dataType
        val dist = if (forward) numKey(col("__mk"), kDt) - numKey(col("__k"), kDt)
                   else numKey(col("__k"), kDt) - numKey(col("__mk"), kDt)
        dist <= tol.cast("double")
    }

    val out = matched.filter(col("__tag") === 1)
    // polars join_asof never matches a null left key (asof/mod.rs skips
    // missing keys); the forward sort is desc_nulls_last, so without this
    // gate a null-key left row would sort after every right row and the
    // carry window would hand it the minimum right key.
    val matchOk = col("__k").isNotNull && col("__mk").isNotNull && withinTol
    // surface the matched right key under its original name (when distinct
    // from the left key) — callers and oracles need it for tolerance checks
    val keyOut =
      if (rightOn != leftOn && !by.contains(rightOn) && !leftCols.contains(rightOn))
        Seq(when(matchOk, col("__mk")).as(rightOn))
      else Nil
    val proj =
      (by ++ leftCols).map(col) ++ keyOut ++
      rightCols.map(c => when(matchOk, col(s"__m_$c")).as(c))
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
                             tieCols: Seq[String],
                             ord: Seq[Column], forward: Boolean): DataFrame = {
    // Range-partition on the FULL window order (key, tag, ties): tied right
    // rows then split only at a tie-order boundary, so every partition's
    // local window sees a contiguous SUFFIX of any tied run — its local pick
    // (or the carry-in when the suffix is empty) equals the global tie-break
    // winner regardless of where the sampled boundaries landed.
    //
    // localCheckpoint PINS the partition ids (same reasoning as
    // rangedByMatched below): this plan reads `ranged` from two branches
    // (the per-pid carry aggregate and the local window, joined back on
    // __pid), and RangePartitioner samples its bounds with an
    // rdd.id-derived seed — two independent evaluations of the range
    // exchange can draw DIFFERENT boundaries, giving the branches
    // inconsistent pids and wrong boundary carry-ins. Exchange reuse
    // dedupes them only when AQE feels like it; materializing once makes
    // the shared pids unconditional. LAZY so plan construction runs no job.
    //
    // Durability tradeoff (ADVICE r16 note): localCheckpoint stores blocks
    // on executor local storage, NOT the reliable checkpoint dir — losing
    // an executor mid-job loses its blocks, and because the lineage is cut
    // Spark cannot recompute them: the job fails and the caller re-runs
    // the query (correctness is never at risk; the rerun re-samples
    // consistent pids from scratch). On preemptible/spot fleets, either
    // accept the rerun-on-loss or swap in a reliable `checkpoint()` via
    // `spark.sparkContext.setCheckpointDir` upstream — we keep the local
    // variant because an extra HDFS round-trip per as-of join is a real
    // cost while executor loss inside this one job's window is rare.
    val ranged = unioned.repartitionByRange(ord: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(eager = false)

    val w = Window.partitionBy(col("__pid")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = rightCols.foldLeft(
      ranged.withColumn("__mk", last(col("__rk"), ignoreNulls = true).over(w))
    ) { (d, c) => d.withColumn(s"__m_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w)) }

    // Last non-null right value per column per partition ("last" in scan
    // order = max (key, ties) backward / min (key, ties) forward; the
    // ordering argument is null unless this row is a right row with a
    // non-null value, which min_by/max_by skip). The struct ordering —
    // lexicographic, nulls smallest — matches the window sort exactly, so
    // the carry-in picks the same tied row the window would.
    val tieStruct = struct((col("__k") +: tieCols.map(c => col(s"__r_$c"))): _*)
    def lastIn(value: Column, isRight: Column): Column = {
      val o = when(isRight && value.isNotNull, tieStruct)
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

  /** Skew-proof BY-KEYED matching: the keyless boundary-carry machinery
    * generalized to by-groups. Range-repartition on (by…, key) — contiguous
    * (by, key) spans, so a dominant by-group spreads over MANY partitions
    * instead of pinning one window task — run the carry window per
    * (partition, by-group), then fix up group segments that cross partition
    * boundaries: per-(partition, by) last values (an aggregate, data-scale ÷
    * group sizes), a per-by running carry over partition ids (each by-group's
    * carry window is its partition-span — bounded by #partitions), and a
    * null-safe join back on (partition, by…). AQE broadcasts the carry frame
    * when small; with millions of by-groups it shuffles — still skew-free. */
  private def rangedByMatched(unioned: DataFrame, by: Seq[String],
                              rightCols: Seq[String], tieCols: Seq[String],
                              ord: Seq[Column], forward: Boolean): DataFrame = {
    // by-prefix + the FULL window order (key, tag, ties) — see
    // keylessMatched: tied runs split only at tie boundaries, so the local
    // pick / carry-in composition is boundary-placement-independent
    val rangeOrd = by.map(col) ++ ord
    // localCheckpoint PINS the partition ids: RangePartitioner samples its
    // bounds with an rdd.id-derived seed, so two independent evaluations of
    // the same range exchange can draw DIFFERENT boundaries — and this plan
    // reads `ranged` from two branches (carry window + local window) joined
    // back together. Exchange reuse would dedupe them when AQE feels like
    // it; materializing once makes the shared pids unconditional. The cost
    // (one materialization of the union) is the price of the skew-proof
    // path — it's opt-in via rangedBy for exactly that reason. LAZY so
    // building the plan runs no job; the pin engages on the first action.
    val ranged = unioned.repartitionByRange(rangeOrd: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(eager = false)

    val w = Window.partitionBy((col("__pid") +: by.map(col)): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = rightCols.foldLeft(
      ranged.withColumn("__mk", last(col("__rk"), ignoreNulls = true).over(w))
    ) { (d, c) => d.withColumn(s"__m_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w)) }

    val tieStruct = struct((col("__k") +: tieCols.map(c => col(s"__r_$c"))): _*)
    def lastIn(value: Column, isRight: Column): Column = {
      val o = when(isRight && value.isNotNull, tieStruct)
      if (forward) min_by(value, o) else max_by(value, o)
    }
    val isR = col("__tag") === 0
    val carryCols = "__key__" +: rightCols
    val perSeg = ranged.groupBy((col("__pid") +: by.map(col)): _*).agg(
      lastIn(col("__rk"), isR).as("__c___key__"),
      rightCols.map(c => lastIn(col(s"__r_$c"), isR).as(s"__c_$c")): _*)
    // strictly-earlier partitions of the SAME by-group carry in
    val wc = Window.partitionBy(by.map(col): _*).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = perSeg.select(
      (col("__pid").as("__cpid") +: by.map(b => col(b).as(s"__cby_$b"))) ++
        carryCols.map(c =>
          last(col(s"__c_$c"), ignoreNulls = true).over(wc).as(s"__in_$c")): _*)

    // null-safe on the by columns: a null by-group spanning partitions
    // needs its carry too
    val cond = (local("__pid") === carry("__cpid")) &&
      by.map(b => local(b) <=> carry(s"__cby_$b")).reduce(_ && _)
    val joined = local.join(carry, cond, "left")
      .drop(("__cpid" +: by.map(b => s"__cby_$b")): _*)
    rightCols.foldLeft(
      joined.withColumn("__mk", coalesce(col("__mk"), col("__in___key__")))
    ) { (d, c) => d.withColumn(s"__m_$c", coalesce(col(s"__m_$c"), col(s"__in_$c"))) }
  }

  private def nearest(prepared: (DataFrame, Seq[String], Seq[String]),
                      leftOn: String, rightOn: String, by: Seq[String],
                      tolerance: Option[Column],
                      rangedBy: Boolean): DataFrame = {
    // Both directions over ONE union, as two chained match passes — never a
    // self-join on a synthetic row id. (The previous formulation ran two
    // directional joins and aligned them on monotonically_increasing_id;
    // that id is re-evaluated per join branch and is only stable when the
    // upstream partitioning is reproducible, so e.g. a round-robin
    // repartition upstream could silently misalign the two passes — caught
    // by the rangedBy equivalence spec. Tie → backward, matching polars'
    // preference for the earlier row.)
    val (unioned, leftCols, rightCols) = prepared
    val both = matchOnce(
      matchOnce(unioned, by, rightCols, forward = false, rangedBy, "__b"),
      by, rightCols, forward = true, rangedBy, "__f")
    val out = both.filter(col("__tag") === 1)

    val kDt = out.schema("__k").dataType
    // null left keys never match (same gate as directional — the forward
    // pass's desc_nulls_last sort would otherwise hand them the minimum
    // right key)
    def ok(mk: Column, fwd: Boolean): Column = tolerance match {
      case None => col("__k").isNotNull && mk.isNotNull
      case Some(tol) =>
        val dist = if (fwd) numKey(mk, kDt) - numKey(col("__k"), kDt)
                   else numKey(col("__k"), kDt) - numKey(mk, kDt)
        col("__k").isNotNull && mk.isNotNull && dist <= tol.cast("double")
    }
    val okB = ok(col("__mk__b"), fwd = false)
    val okF = ok(col("__mk__f"), fwd = true)
    // both distances are non-negative by construction (the backward match
    // key is ≤ the left key, the forward match key ≥), so signed deltas
    // suffice — which lets datetime keys subtract natively via keyDelta
    // (interval results compare exactly; no double cast, no NTZ failure)
    val db = keyDelta(col("__k"), col("__mk__b"), kDt)
    val df_ = keyDelta(col("__mk__f"), col("__k"), kDt)
    val useB = okB && (!okF || db <= df_)
    val useF = okF && !useB
    val keyOut =
      if (rightOn != leftOn && !by.contains(rightOn) && !leftCols.contains(rightOn))
        Seq(when(useB, col("__mk__b")).when(useF, col("__mk__f")).as(rightOn))
      else Nil
    val proj = (by ++ leftCols).map(col) ++ keyOut ++
      rightCols.map(c =>
        when(useB, col(s"__m_${c}__b")).when(useF, col(s"__m_${c}__f")).as(c))
    out.select(proj: _*)
  }
}
