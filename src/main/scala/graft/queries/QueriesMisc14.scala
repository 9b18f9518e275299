package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import util._

/** Round-11 batch 8: the last uncovered dt-namespace methods —
  * `dt.base_utc_offset` / `dt.dst_offset` (py-polars
  * `expr/datetime.py`), as a native tzdb-rules codegen expression. */
object QueriesMisc14 {

  val queries: Map[String, Q] = Map(

    // polars dt.base_utc_offset + dt.dst_offset over three regimes:
    // America/New_York (northern DST), Australia/Sydney (southern DST —
    // base is the JULY offset, the classic sign trap), Asia/Kolkata
    // (no DST, half-hour base). Order dates 1995-2001 cross many
    // transitions (incl. Sydney's early Olympic start, Aug 2000), so the
    // key pins the actual tzdb transition table, not one fixed regime.
    // Seconds-as-long is the honest Duration mapping (no Spark duration
    // dtype — the dt.total_* discipline).
    "dt_tz_offsets" -> ((s, d) => {
      val ts = col("o_orderdate").cast(TimestampType)
      t(s, d, "orders").filter(col("o_orderkey") <= 2000)
        .select(col("o_orderkey"),
          graft.functions.baseUtcOffset(ts, "America/New_York").as("ny_base"),
          graft.functions.dstOffset(ts, "America/New_York").as("ny_dst"),
          graft.functions.baseUtcOffset(ts, "Australia/Sydney").as("syd_base"),
          graft.functions.dstOffset(ts, "Australia/Sydney").as("syd_dst"),
          graft.functions.baseUtcOffset(ts, "Asia/Kolkata").as("kol_base"),
          graft.functions.dstOffset(ts, "Asia/Kolkata").as("kol_dst"))
        .orderBy(col("o_orderkey"))
    }),

    // A fastText-style quality classifier TRAINED on the cluster
    // (text/QualityClassifier): logistic regression over 8 md5-hashed
    // unigram-frequency buckets + bias, 3 full-batch GD steps at η=1,
    // labels = "looks English". Each step is ONE scan of the persisted
    // sparse features reduced to ≤9 bucket-partial rows (documents never
    // shuffle; r12 made featurize one-pass sparse RLE); weights
    // live on the driver and snap to the 1e-6 grid per step so the
    // DuckDB oracle replays training EXACTLY (3 unrolled gradient CTEs).
    // Emitted margins pin w·x per doc; pred pins the decision boundary.
    "text_quality_classifier" -> ((s, d) => {
      val (_, scored) = graft.text.QualityClassifier.train(
        t(s, d, "documents"), "text",
        label = col("lang") === "en", buckets = 8, iters = 3, lr = 1.0)
      scored.filter(col("doc_id") <= 300)
        .select(col("doc_id"), col("lang"), col("n_tok"),
          (round(col("margin") * 1e6) / 1e6).as("margin"),
          (round(col("score") * 1e6) / 1e6).as("score"),
          (round(col("margin") * 1e6) > 0).as("pred"))
        .orderBy(col("doc_id"))
    }),

    // Product quantization (ml/Quantize.productQuantize — Jégou et al.
    // 2011, the PQ half of FAISS IVF-PQ): 64-dim vectors → 4 subspaces ×
    // 4-centroid codebooks (one Lloyd round each, seeded from the first
    // four vectors' subvectors), every vector encoded as 4 small codes in
    // ONE projection against broadcast codebook literals. The key pins
    // codebooks AND codes: per-subspace code + squared reconstruction
    // error, replayed end to end by the oracle's per-subspace KMeans CTEs
    // under the shared snap discipline.
    "sim_pq_codes" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("e"))
      val (_, enc) = graft.ml.Quantize.productQuantize(emb, "vec_id", "e",
        m = 4, k = 4, iters = 1,
        seed = sub => QueriesMisc12.seedCentroids(sub, 4))
      enc.select(col("vec_id") +: (0 until 4).flatMap(j => Seq(
          col(s"code_$j"),
          (round(col(s"err_$j") * 1e4) / 1e4).as(s"errv_$j"))): _*)
        .orderBy(col("vec_id"))
    }),

    // polars quantile interpolation strategies (Expr.quantile's five
    // modes: linear/lower/higher/midpoint/nearest — the reference's
    // QuantileMethod enum). All five derive from the shared
    // pos = q·(n−1) index arithmetic over the group's sorted multiset:
    // rank every row once (one window), pick v[floor]/v[ceil] as
    // conditional aggregates, and combine — no per-group array is ever
    // materialized (collect_list of a 2M-row group is the anti-pattern;
    // this shape is one window + one agg at any scale). Ties in the sort
    // are broken by keys so both engines rank the same multiset.
    "agg_quantile_strategies" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
      val q = 0.37
      val base = t(s, d, "lineitem").filter(col("l_orderkey") <= 5000)
        .select(col("l_returnflag"), col("l_quantity"),
          (row_number().over(w) - 1).cast("double").as("i"),
          count(lit(1)).over(Window.partitionBy(col("l_returnflag")))
            .cast("double").as("n"))
        .withColumn("pos", lit(q) * (col("n") - 1))
      val vf = max(when(col("i") === floor(col("pos")), col("l_quantity")))
      val vc = max(when(col("i") === ceil(col("pos")), col("l_quantity")))
      val vn = max(when(col("i") === round(col("pos")), col("l_quantity")))
      base.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          (round((vf + (max(col("pos")) - floor(max(col("pos")))) * (vc - vf))
            * 1e4) / 1e4).as("q_linear"),
          vf.as("q_lower"), vc.as("q_higher"),
          ((vf + vc) / 2).as("q_midpoint"), vn.as("q_nearest"))
        .orderBy(col("l_returnflag"))
    }),

    // CUBE grouping sets (beyond-reference alongside the agg_rollup row:
    // polars users emulate multi-level totals with concat of group-bys;
    // Spark plans one Expand + one aggregate). NULL group markers are
    // disambiguated with grouping() — a real 'N/A' value and the
    // all-group total would otherwise collide.
    "agg_cube" -> ((s, d) =>
      t(s, d, "orders").filter(col("o_orderkey") <= 5000)
        .cube(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("cents"),
          grouping(col("o_orderpriority")).as("g_pri"),
          grouping(col("o_orderstatus")).as("g_st"))
        .orderBy(col("g_pri"), col("g_st"),
          col("o_orderpriority"), col("o_orderstatus"))),

    // polars group_by().map_groups / apply — the fully-general typed
    // per-group escape hatch (GroupBy.flatMapGroups on Spark's
    // KeyValueGroupedDataset), previously spec-only. The group fn here
    // streams each group once, computing count / exact cent-sum / min
    // imperatively, and ALSO emits a per-group 'spread' row — a 1-in-
    // 2-out shape no agg() can express — so the oracle pins the typed
    // path itself, not an aggregate rewrite of it. Groups stream through
    // the fn (Spark never materializes them), so memory is bounded by
    // what the fn retains — here O(1).
    "agg_map_groups" -> ((s, d) => {
      import s.implicits._
      val rows = graft.dsl.LazyFrame(
        t(s, d, "orders").filter(col("o_orderkey") <= 5000)
          .select(col("o_orderpriority"), col("o_totalprice")))
        .groupBy(col("o_orderpriority"))
        .flatMapGroups(r => r.getString(0)) { (k, it) =>
          var n = 0L; var cents = 0L
          var mn = Double.MaxValue; var mx = Double.MinValue
          it.foreach { r =>
            val p = r.getDouble(1)
            n += 1; cents += math.round(p * 100)
            if (p < mn) mn = p; if (p > mx) mx = p
          }
          Seq((k, "stats", n, cents), (k, "spread", n, math.round(mx * 100) - math.round(mn * 100)))
        }
      rows.toDF("o_orderpriority", "kind", "n", "cents")
        .orderBy(col("o_orderpriority"), col("kind"))
    }),

    // Approximate quantiles (Spark's Greenwald-Khanna percentile_approx
    // — the sketch polars users reach for via describe on big frames).
    // Sketch values are engine-specific, so the key follows the
    // agg_approx_ndv invariant discipline: emit the exact median (DuckDB
    // computes the same number) plus a boolean pinning the sketch inside
    // the exact [p45, p55] band — accuracy 1000 bounds rank error to
    // 0.1%, so the 5%-rank band is a wide margin and a drifting sketch
    // hashes red.
    "agg_approx_quantile" -> ((s, d) => {
      val ap = expr("percentile_approx(l_extendedprice, 0.5, 1000)")
      t(s, d, "lineitem").groupBy(col("l_returnflag"))
        .agg(
          (round(expr("percentile(l_extendedprice, 0.5)") * 1e4) / 1e4)
            .as("exact_med"),
          (ap >= expr("percentile(l_extendedprice, 0.45)") &&
            ap <= expr("percentile(l_extendedprice, 0.55)")).as("in_band"))
        .orderBy(col("l_returnflag"))
    }),

    // polars frame-level aggregation shortcuts (LazyFrame.max/min/mean/
    // median/std/var/null_count): one row per stat over the numeric
    // columns, all partial-aggregated. Sum is spec-covered but excluded
    // here: a raw float sum's cross-engine order jitter at 1e8 magnitude
    // can flip a rounded digit (the q5 lesson); the other stats are
    // magnitude-stable at 1e-4 (the agg_stats discipline).
    "misc_frame_aggs" -> ((s, d) => {
      val lf = graft.dsl.LazyFrame(
        t(s, d, "lineitem").filter(col("l_orderkey") <= 2000)
          .select(col("l_quantity"), col("l_extendedprice"),
            col("l_discount")))
      val r4 = (c: String) => (round(col(c) * 1e4) / 1e4).as(c)
      def tag(stat: String, df0: org.apache.spark.sql.DataFrame) =
        df0.select(lit(stat).as("stat") +:
          Seq("l_quantity", "l_extendedprice", "l_discount")
            .map(c => r4(c.toString)): _*)
      Seq(
        tag("max", lf.maxAll()), tag("mean", lf.meanAll()),
        tag("median", lf.medianAll()), tag("min", lf.minAll()),
        tag("nullcnt", lf.nullCount()
          .select(Seq("l_quantity", "l_extendedprice", "l_discount")
            .map(c => col(c).cast("double").as(c)): _*)),
        tag("std", lf.stdAll()), tag("var", lf.varAll()))
        .reduce(_.unionAll(_)).orderBy(col("stat"))
    }),

    // polars frame-level order ops composed: gather_every(3, offset 1)
    // then shift(1) of EVERY column along the key order (the LazyFrame
    // .shift semantics — vacated row nulls). Emitted values encode the
    // order, so the hash compare pins it.
    "misc_frame_order_ops" -> ((s, d) => {
      val base = graft.dsl.LazyFrame(
        t(s, d, "orders").filter(col("o_orderkey") <= 100)
          .select(col("o_orderkey"), col("o_totalprice")))
      base.gatherEvery(3, 1, Seq(col("o_orderkey")))
        .shiftAll(1, col("o_orderkey"))
        .df.select(col("o_orderkey").as("prev_key"),
          col("o_totalprice").as("prev_price"))
        // the first shifted row is NULL: pin nulls-last explicitly (and
        // NULLS LAST in the oracle) — Spark defaults nulls first, DuckDB
        // nulls last, and the key must not lean on the gate's row sort
        .orderBy(col("prev_key").asc_nulls_last)
    }),

    // The full FAISS IndexIVFPQ composition (ml/Quantize.ivfPqTopK):
    // trained coarse cells (the sim_kmeans_train KMeans, replayed by the
    // shared CTEs) → residual PQ codebooks (4×4, one Lloyd round) →
    // queries probe their 2 nearest cells with per-(query, cell) ADC
    // tables over the query's residual. Storage per vector is cell id +
    // 4 codes; search touches only probed cells' codes. Build AND search
    // replay end to end in the oracle under the shared snap discipline.
    "sim_ivfpq_adc" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("e"))
      val (coarse, _) = graft.ml.KMeans.train(emb, "vec_id", "e",
        QueriesMisc12.seedCentroids(emb, 4), iters = 1)
      val qs = emb.filter(col("vec_id") <= 1).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
        .sortBy(_._1).toSeq
      val (_, _, results) = graft.ml.Quantize.ivfPqTopK(emb, "vec_id", "e",
        coarse, m = 4, k = 4, queries = qs, topK = 10, nprobe = 2,
        seed = sub => QueriesMisc12.seedCentroids(sub, 4))
      results.orderBy(col("query_id"), col("rank"))
    }),

    // Static mixture sampling (ops/Mixing — the Pile/DoReMi "domain
    // weights" application step): per-language character budgets, docs
    // kept in md5-rank order until each group's running total hits its
    // budget; zh has no budget and drops entirely (the whole-group-cut
    // path). Running totals via the grouped RANGE-partitioned prefix sum
    // (Distributed.withPrefixSumBy) — no group-keyed window, so a
    // 70%-English corpus cannot hang its biggest group on one core.
    "text_mixture_sample" -> ((s, d) =>
      graft.ops.Mixing.sampleToBudgets(
          t(s, d, "documents"), "doc_id", "lang", "n_chars",
          Map("en" -> 30000L, "de" -> 8000L, "es" -> 8000L, "fr" -> 8000L))
        .select(col("doc_id"), col("lang"), col("n_chars"), col("cum_tok"))
        .orderBy(col("doc_id"))),

    // The search half of PQ (ml/Quantize.adcTopK — asymmetric distance
    // computation): queries 0-1 build m×k distance lookup tables on the
    // driver, every ENCODED vector is scored with 4 array lookups + adds
    // (raw vectors never read at query time), top-10 per query ranked on
    // the snapped grid. Same codebooks as sim_pq_codes — the oracle
    // reuses the shared PQ replay CTEs.
    "sim_pq_adc" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("e"))
      val (books, enc) = graft.ml.Quantize.productQuantize(emb, "vec_id", "e",
        m = 4, k = 4, iters = 1,
        seed = sub => QueriesMisc12.seedCentroids(sub, 4))
      val qs = emb.filter(col("vec_id") <= 1).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
        .sortBy(_._1).toSeq
      graft.ml.Quantize.adcTopK(enc, "vec_id", books, qs, k = 10)
        .orderBy(col("query_id"), col("rank"))
    })
  )

  val oracle: Map[String, String] = Map(

    // ICU replay without java.time: total offset at instant t is
    // epoch(wall-clock-in-zone) − epoch(t); the STANDARD offset is the
    // lesser of the Jan-15 / Jul-15 offsets of the same year (valid for
    // zones with non-negative DST — all three here); dst = total − base.
    // to_timestamp(epoch(ts)) pins the instant independent of DuckDB's
    // session timezone.
    "dt_tz_offsets" ->
      """WITH t AS (
        | SELECT o_orderkey, o_orderdate AS ts,
        |   make_timestamp(year(o_orderdate)::BIGINT, 1, 15, 0, 0, 0) AS jan,
        |   make_timestamp(year(o_orderdate)::BIGINT, 7, 15, 0, 0, 0) AS jul
        | FROM orders WHERE o_orderkey <= 2000),
        |o AS (
        | SELECT o_orderkey,
        |  (epoch(timezone('America/New_York', to_timestamp(epoch(ts)))) - epoch(ts))::BIGINT AS ny,
        |  (epoch(timezone('America/New_York', to_timestamp(epoch(jan)))) - epoch(jan))::BIGINT AS ny_jan,
        |  (epoch(timezone('America/New_York', to_timestamp(epoch(jul)))) - epoch(jul))::BIGINT AS ny_jul,
        |  (epoch(timezone('Australia/Sydney', to_timestamp(epoch(ts)))) - epoch(ts))::BIGINT AS syd,
        |  (epoch(timezone('Australia/Sydney', to_timestamp(epoch(jan)))) - epoch(jan))::BIGINT AS syd_jan,
        |  (epoch(timezone('Australia/Sydney', to_timestamp(epoch(jul)))) - epoch(jul))::BIGINT AS syd_jul,
        |  (epoch(timezone('Asia/Kolkata', to_timestamp(epoch(ts)))) - epoch(ts))::BIGINT AS kol,
        |  (epoch(timezone('Asia/Kolkata', to_timestamp(epoch(jan)))) - epoch(jan))::BIGINT AS kol_jan,
        |  (epoch(timezone('Asia/Kolkata', to_timestamp(epoch(jul)))) - epoch(jul))::BIGINT AS kol_jul
        | FROM t)
        |SELECT o_orderkey,
        | least(ny_jan, ny_jul) AS ny_base, ny - least(ny_jan, ny_jul) AS ny_dst,
        | least(syd_jan, syd_jul) AS syd_base, syd - least(syd_jan, syd_jul) AS syd_dst,
        | least(kol_jan, kol_jul) AS kol_base, kol - least(kol_jan, kol_jul) AS kol_dst
        |FROM o ORDER BY o_orderkey""".stripMargin,

    // Training replayed: f = hashed-bucket frequency features + bias,
    // w0 = 0, three (gradient → snapped update) CTE pairs, then the final
    // scoring pass. avg/exp/list_dot_product mirror the Spark plan; the
    // per-step round((w - g)*1e6)/1e6 is the snap that keeps both engines
    // on the same trajectory.
    "text_quality_classifier" -> {
      val tokensSql = QueriesText.tokensSql
      def gw(i: Int) =
        s"""g$i AS (
          |  SELECT s.i,
          |    avg((1 / (1 + exp(-list_dot_product(f.x, w.w))) - f.y) * f.x[s.i]) AS g
          |  FROM f CROSS JOIN w${i - 1} w CROSS JOIN generate_series(1, 9) AS s(i)
          |  GROUP BY s.i),
          |w$i AS (
          |  SELECT list(round((w.w[g.i] - 1.0 * g.g) * 1e6) / 1e6 ORDER BY g.i) AS w
          |  FROM g$i g CROSS JOIN w${i - 1} w)""".stripMargin
      s"""WITH tok AS (
        |  SELECT doc_id, lang, $tokensSql AS tk FROM documents),
        |f AS (
        |  SELECT doc_id, lang, len(tk)::INT AS n_tok,
        |    (lang = 'en')::INT::DOUBLE AS y,
        |    [ (len(list_filter(tk,
        |          t -> ('0x' || substr(md5(t), 1, 8))::BIGINT % 8 = b)))::DOUBLE
        |        / len(tk) FOR b IN generate_series(0, 7) ]
        |      || [1.0::DOUBLE] AS x
        |  FROM tok WHERE len(tk) > 0),
        |w0 AS (SELECT [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0] AS w),
        |${gw(1)},
        |${gw(2)},
        |${gw(3)}
        |SELECT f.doc_id, f.lang, f.n_tok,
        | round(list_dot_product(f.x, w.w) * 1e6) / 1e6 + 0.0 AS margin,
        | round(1 / (1 + exp(-list_dot_product(f.x, w.w))) * 1e6) / 1e6 AS score,
        | round(list_dot_product(f.x, w.w) * 1e6) > 0 AS pred
        |FROM f CROSS JOIN w3 w WHERE f.doc_id <= 300
        |ORDER BY f.doc_id""".stripMargin
    },

    // PQ replayed: per subspace j — slice, seed codebook from vec_id<4,
    // one Lloyd round (assign on round(d²·1e6) ties-to-cid, member means
    // snapped to 1e-6, empty cells keep the seed), final encode under the
    // trained codebook. The same CTE shape as kmeansReplayCtes, ×4.
    "sim_pq_codes" ->
      s"""WITH $pqReplayCtes
        |SELECT f0.vec_id,
        | f0.code_0, f0.errv_0, f1.code_1, f1.errv_1,
        | f2.code_2, f2.errv_2, f3.code_3, f3.errv_3
        |FROM f0 JOIN f1 USING (vec_id) JOIN f2 USING (vec_id)
        |  JOIN f3 USING (vec_id)
        |ORDER BY f0.vec_id""".stripMargin,

    "agg_quantile_strategies" ->
      """WITH r AS (
        |  SELECT l_returnflag, l_quantity,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_quantity, l_orderkey, l_linenumber) - 1 AS i,
        |    count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem WHERE l_orderkey <= 5000),
        |p AS (SELECT *, 0.37 * (n - 1)::DOUBLE AS pos FROM r)
        |SELECT l_returnflag, count(*) AS n,
        | round((max(CASE WHEN i = floor(pos) THEN l_quantity END)
        |   + (max(pos) - floor(max(pos)))
        |     * (max(CASE WHEN i = ceil(pos) THEN l_quantity END)
        |        - max(CASE WHEN i = floor(pos) THEN l_quantity END)))
        |   * 1e4) / 1e4 AS q_linear,
        | max(CASE WHEN i = floor(pos) THEN l_quantity END) AS q_lower,
        | max(CASE WHEN i = ceil(pos) THEN l_quantity END) AS q_higher,
        | (max(CASE WHEN i = floor(pos) THEN l_quantity END)
        |  + max(CASE WHEN i = ceil(pos) THEN l_quantity END)) / 2
        |   AS q_midpoint,
        | max(CASE WHEN i = round(pos) THEN l_quantity END) AS q_nearest
        |FROM p GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_cube" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
        | sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS cents,
        | CAST(grouping(o_orderpriority) AS TINYINT) AS g_pri,
        | CAST(grouping(o_orderstatus) AS TINYINT) AS g_st
        |FROM orders WHERE o_orderkey <= 5000
        |GROUP BY CUBE (o_orderpriority, o_orderstatus)
        |ORDER BY g_pri, g_st, o_orderpriority, o_orderstatus""".stripMargin,

    "agg_map_groups" ->
      """WITH g AS (
        |  SELECT o_orderpriority, count(*) AS n,
        |    sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS sum_c,
        |    CAST(round(max(o_totalprice) * 100) AS BIGINT)
        |      - CAST(round(min(o_totalprice) * 100) AS BIGINT) AS spread_c
        |  FROM orders WHERE o_orderkey <= 5000 GROUP BY 1)
        |SELECT o_orderpriority, 'spread' AS kind, n, spread_c AS cents FROM g
        |UNION ALL
        |SELECT o_orderpriority, 'stats', n, sum_c FROM g
        |ORDER BY o_orderpriority, kind""".stripMargin,

    "agg_approx_quantile" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_extendedprice, 0.5) * 1e4) / 1e4 AS exact_med,
        | TRUE AS in_band
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "misc_frame_aggs" ->
      """WITH t AS (
        |  SELECT l_quantity AS q, l_extendedprice AS e, l_discount AS d
        |  FROM lineitem WHERE l_orderkey <= 2000)
        |SELECT 'max' AS stat, round(max(q)*1e4)/1e4 AS l_quantity,
        |  round(max(e)*1e4)/1e4 AS l_extendedprice,
        |  round(max(d)*1e4)/1e4 AS l_discount FROM t
        |UNION ALL SELECT 'mean', round(avg(q)*1e4)/1e4,
        |  round(avg(e)*1e4)/1e4, round(avg(d)*1e4)/1e4 FROM t
        |UNION ALL SELECT 'median', round(median(q)*1e4)/1e4,
        |  round(median(e)*1e4)/1e4, round(median(d)*1e4)/1e4 FROM t
        |UNION ALL SELECT 'min', round(min(q)*1e4)/1e4,
        |  round(min(e)*1e4)/1e4, round(min(d)*1e4)/1e4 FROM t
        |UNION ALL SELECT 'nullcnt',
        |  sum((q IS NULL)::INT)::DOUBLE, sum((e IS NULL)::INT)::DOUBLE,
        |  sum((d IS NULL)::INT)::DOUBLE FROM t
        |UNION ALL SELECT 'std', round(stddev_samp(q)*1e4)/1e4,
        |  round(stddev_samp(e)*1e4)/1e4, round(stddev_samp(d)*1e4)/1e4 FROM t
        |UNION ALL SELECT 'var', round(var_samp(q)*1e4)/1e4,
        |  round(var_samp(e)*1e4)/1e4, round(var_samp(d)*1e4)/1e4 FROM t
        |ORDER BY stat""".stripMargin,

    "misc_frame_order_ops" ->
      """WITH g AS (
        |  SELECT o_orderkey, o_totalprice,
        |    row_number() OVER (ORDER BY o_orderkey) - 1 AS idx
        |  FROM orders WHERE o_orderkey <= 100),
        |s AS (
        |  SELECT o_orderkey, o_totalprice FROM g
        |  WHERE idx >= 1 AND (idx - 1) % 3 = 0)
        |SELECT lag(o_orderkey) OVER (ORDER BY o_orderkey) AS prev_key,
        |  lag(o_totalprice) OVER (ORDER BY o_orderkey) AS prev_price
        |FROM s ORDER BY prev_key NULLS LAST""".stripMargin,

    "text_mixture_sample" ->
      """WITH c AS (
        |  SELECT doc_id, lang, n_chars, md5(doc_id::VARCHAR) AS rk
        |  FROM documents),
        |cum AS (
        |  SELECT doc_id, lang, n_chars,
        |    sum(n_chars) OVER (PARTITION BY lang ORDER BY rk, doc_id
        |      ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_tok
        |  FROM c)
        |SELECT doc_id, lang, n_chars, cum_tok FROM cum
        |WHERE lang IN ('en', 'de', 'es', 'fr')
        |  AND cum_tok <= CASE lang
        |  WHEN 'en' THEN 30000 WHEN 'de' THEN 8000
        |  WHEN 'es' THEN 8000 WHEN 'fr' THEN 8000 END
        |ORDER BY doc_id""".stripMargin,

    // IVF-PQ replayed: the shared kmeans CTEs give the trained coarse
    // cells (c1); asg/res re-derive assignments + residuals; the
    // residual-PQ blocks (rs/rc0/ra1/rm1/rc1/rf per subspace) mirror
    // pqReplayCtes on residuals; probes rank cells per query on the
    // snapped grid; ADC joins probed-cell codes to codebook entries
    // against the query's per-cell residual.
    "sim_ivfpq_adc" -> {
      def rsub(j: Int): String = {
        val lo = j * 16 + 1; val hi = (j + 1) * 16
        s"""rs$j AS MATERIALIZED (SELECT vec_id, r[$lo:$hi] AS sv FROM res),
          |rc0$j AS (SELECT vec_id::INT AS cid, sv AS cvec FROM rs$j WHERE vec_id < 4),
          |ra1$j AS (
          |  SELECT vec_id, sv, cid FROM (
          |    SELECT s.vec_id, s.sv, c.cid,
          |      row_number() OVER (PARTITION BY s.vec_id ORDER BY
          |        round((list_dot_product(s.sv, s.sv)
          |               - 2 * list_dot_product(s.sv, c.cvec)
          |               + list_dot_product(c.cvec, c.cvec)) * 1e6) ASC,
          |        c.cid ASC) AS rn
          |    FROM rs$j s CROSS JOIN rc0$j c) WHERE rn = 1),
          |rm1$j AS (
          |  SELECT cid, pos, round(avg(sv[pos]) * 1e6) / 1e6 AS m
          |  FROM ra1$j CROSS JOIN range(1, 17) AS r(pos)
          |  GROUP BY cid, pos),
          |rc1$j AS MATERIALIZED (
          |  SELECT c0.cid, coalesce(mm.mvec, c0.cvec) AS cvec
          |  FROM rc0$j c0 LEFT JOIN
          |    (SELECT cid, list(m ORDER BY pos) AS mvec FROM rm1$j GROUP BY cid) mm
          |    ON mm.cid = c0.cid),
          |rf$j AS MATERIALIZED (
          |  SELECT vec_id, cid AS code_$j FROM (
          |    SELECT s.vec_id, c.cid,
          |      row_number() OVER (PARTITION BY s.vec_id ORDER BY
          |        round((list_dot_product(s.sv, s.sv)
          |               - 2 * list_dot_product(s.sv, c.cvec)
          |               + list_dot_product(c.cvec, c.cvec)) * 1e6) ASC,
          |        c.cid ASC) AS rn
          |    FROM rs$j s CROSS JOIN rc1$j c) WHERE rn = 1)""".stripMargin
      }
      def qr(j: Int): String = {
        val lo = j * 16 + 1; val hi = (j + 1) * 16
        s"[q.e[i] - p.cvec[i] FOR i IN generate_series($lo, $hi)] AS qr$j"
      }
      def term(j: Int): String =
        s"""(list_dot_product(w.qr$j, w.qr$j)
          |   - 2 * list_dot_product(w.qr$j, b$j.cvec)
          |   + list_dot_product(b$j.cvec, b$j.cvec))""".stripMargin
      s"""WITH ${QueriesMisc12.kmeansReplayCtes},
        |asg AS MATERIALIZED (
        |  SELECT vec_id, e, cid FROM (
        |    SELECT v.vec_id, v.e, c.cid,
        |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
        |        round((list_dot_product(v.e, v.e)
        |               - 2 * list_dot_product(v.e, c.cvec)
        |               + list_dot_product(c.cvec, c.cvec)) * 1e6) ASC,
        |        c.cid ASC) AS rn
        |    FROM v CROSS JOIN c1 c) WHERE rn = 1),
        |res AS MATERIALIZED (
        |  SELECT a.vec_id, a.cid,
        |    [a.e[i] - c.cvec[i] FOR i IN generate_series(1, 64)] AS r
        |  FROM asg a JOIN c1 c ON c.cid = a.cid),
        |${rsub(0)},
        |${rsub(1)},
        |${rsub(2)},
        |${rsub(3)},
        |q AS (SELECT vec_id AS qid, e FROM v WHERE vec_id <= 1),
        |probe AS (
        |  SELECT qid, cid, cvec FROM (
        |    SELECT q.qid, c.cid, c.cvec,
        |      row_number() OVER (PARTITION BY q.qid ORDER BY
        |        round((list_dot_product(q.e, q.e)
        |               - 2 * list_dot_product(q.e, c.cvec)
        |               + list_dot_product(c.cvec, c.cvec)) * 1e6) ASC,
        |        c.cid ASC) AS rn
        |    FROM q CROSS JOIN c1 c) WHERE rn <= 2),
        |qrs AS (
        |  SELECT p.qid, p.cid AS cell,
        |    ${qr(0)}, ${qr(1)}, ${qr(2)}, ${qr(3)}
        |  FROM probe p JOIN q ON q.qid = p.qid),
        |scored AS (
        |  SELECT w.qid, r.vec_id,
        |    ${term(0)} + ${term(1)} + ${term(2)} + ${term(3)} AS adc
        |  FROM res r
        |  JOIN qrs w ON r.cid = w.cell
        |  JOIN rf0 f0 ON f0.vec_id = r.vec_id
        |  JOIN rf1 f1 ON f1.vec_id = r.vec_id
        |  JOIN rf2 f2 ON f2.vec_id = r.vec_id
        |  JOIN rf3 f3 ON f3.vec_id = r.vec_id
        |  JOIN rc10 b0 ON b0.cid = f0.code_0
        |  JOIN rc11 b1 ON b1.cid = f1.code_1
        |  JOIN rc12 b2 ON b2.cid = f2.code_2
        |  JOIN rc13 b3 ON b3.cid = f3.code_3)
        |SELECT qid AS query_id, vec_id, rank,
        | round(adc * 1e4) / 1e4 + 0.0 AS adc
        |FROM (
        |  SELECT qid, vec_id, adc,
        |    CAST(row_number() OVER (PARTITION BY qid
        |      ORDER BY round(adc * 1e6) ASC, vec_id ASC) AS INTEGER) AS rank
        |  FROM scored)
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
    },

    // ADC replayed on the shared PQ CTEs: distance = Σ_j (qq − 2qc + cc)
    // over the codebook entries selected by each vector's codes, ranked
    // on round(adc·1e6) with ties to vec_id.
    "sim_pq_adc" -> {
      def term(j: Int): String = {
        val lo = j * 16 + 1; val hi = (j + 1) * 16
        s"""(list_dot_product(q.e[$lo:$hi], q.e[$lo:$hi])
          |   - 2 * list_dot_product(q.e[$lo:$hi], b$j.cvec)
          |   + list_dot_product(b$j.cvec, b$j.cvec))""".stripMargin
      }
      s"""WITH $pqReplayCtes,
        |q AS (SELECT vec_id AS qid, e FROM v WHERE vec_id <= 1),
        |adc AS (
        |  SELECT q.qid, f0.vec_id,
        |    ${term(0)} + ${term(1)} + ${term(2)} + ${term(3)} AS adc
        |  FROM f0 JOIN f1 USING (vec_id) JOIN f2 USING (vec_id)
        |    JOIN f3 USING (vec_id)
        |    JOIN c10 b0 ON b0.cid = f0.code_0
        |    JOIN c11 b1 ON b1.cid = f1.code_1
        |    JOIN c12 b2 ON b2.cid = f2.code_2
        |    JOIN c13 b3 ON b3.cid = f3.code_3
        |    CROSS JOIN q),
        |r AS (
        |  SELECT qid AS query_id, vec_id, adc,
        |    CAST(row_number() OVER (PARTITION BY qid
        |      ORDER BY round(adc * 1e6) ASC, vec_id ASC) AS INTEGER) AS rank
        |  FROM adc)
        |SELECT query_id, vec_id, rank,
        | round(adc * 1e4) / 1e4 + 0.0 AS adc
        |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
    }
  )

  /** The PQ training/encode replay shared by sim_pq_codes and
    * sim_pq_adc (the kmeansReplayCtes discipline, one block per
    * subspace). */
  private[queries] lazy val pqReplayCtes: String = {
      def sub(j: Int): String = {
        val lo = j * 16 + 1; val hi = (j + 1) * 16
        s"""s$j AS (SELECT vec_id, e[$lo:$hi] AS sv FROM v),
          |c0$j AS (SELECT vec_id::INT AS cid, sv AS cvec FROM s$j WHERE vec_id < 4),
          |a1$j AS (
          |  SELECT vec_id, sv, cid FROM (
          |    SELECT s.vec_id, s.sv, c.cid,
          |      row_number() OVER (PARTITION BY s.vec_id ORDER BY
          |        round((list_dot_product(s.sv, s.sv)
          |               - 2 * list_dot_product(s.sv, c.cvec)
          |               + list_dot_product(c.cvec, c.cvec)) * 1e6) ASC,
          |        c.cid ASC) AS rn
          |    FROM s$j s CROSS JOIN c0$j c) WHERE rn = 1),
          |m1$j AS (
          |  SELECT cid, pos, round(avg(sv[pos]) * 1e6) / 1e6 AS m
          |  FROM a1$j CROSS JOIN range(1, 17) AS r(pos)
          |  GROUP BY cid, pos),
          |c1$j AS (
          |  SELECT c0.cid, coalesce(mm.mvec, c0.cvec) AS cvec
          |  FROM c0$j c0 LEFT JOIN
          |    (SELECT cid, list(m ORDER BY pos) AS mvec FROM m1$j GROUP BY cid) mm
          |    ON mm.cid = c0.cid),
          |f$j AS (
          |  SELECT vec_id, cid AS code_$j,
          |    round(d2 * 1e4) / 1e4 + 0.0 AS errv_$j
          |  FROM (
          |    SELECT s.vec_id, c.cid,
          |      list_dot_product(s.sv, s.sv) - 2 * list_dot_product(s.sv, c.cvec)
          |        + list_dot_product(c.cvec, c.cvec) AS d2,
          |      row_number() OVER (PARTITION BY s.vec_id ORDER BY
          |        round((list_dot_product(s.sv, s.sv)
          |               - 2 * list_dot_product(s.sv, c.cvec)
          |               + list_dot_product(c.cvec, c.cvec)) * 1e6) ASC,
          |        c.cid ASC) AS rn
          |    FROM s$j s CROSS JOIN c1$j c) WHERE rn = 1)""".stripMargin
      }
      s"""v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |${sub(0)},
        |${sub(1)},
        |${sub(2)},
        |${sub(3)}""".stripMargin
  }
}
