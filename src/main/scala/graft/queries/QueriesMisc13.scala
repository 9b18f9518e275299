package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.ml.{KMeans, Similarity}
import util._

/** Round-11 batch 6: rolling covariance/correlation (pl.rolling_cov /
  * rolling_corr), the plural range builders (pl.int_ranges /
  * date_ranges), the trained-IVF composition (KMeans → ivfTopK), and a
  * Johnson–Lindenstrauss random projection for embedding compression. */
object QueriesMisc13 {

  /** md5-prefix parity, matching DuckDB's
    * `('0x' || substr(md5(s), 1, 8))::BIGINT % 2`. */
  private def md5Mod2(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16) % 2
  }

  /** Achlioptas ±1/√k sign matrix, k×dim, seeded by md5("i,j") parity —
    * reproducible in SQL, which is the point: the projection is a plan
    * artifact, not driver randomness. */
  private def signMatrix(k: Int, dim: Int): Seq[Array[Double]] = {
    val scale = 1.0 / math.sqrt(k)
    (0 until k).map(i => (1 to dim).map(j =>
      if (md5Mod2(s"$i,$j") == 0) scale else -scale).toArray)
  }

  val queries: Map[String, Q] = Map(

    // polars rolling_cov / rolling_corr (functions/lazy.py rolling_cov,
    // rolling_corr): 5-row windows per supplier over (extendedprice,
    // quantity). Composed from windowed sums — the online covariance
    // algorithms differ across engines in the last ulp, the
    // sum-of-products form is the same float path on both sides (the
    // win_rolling_stats discipline).
    "win_rolling_corr" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(-4, Window.currentRow)
      val x = col("l_extendedprice"); val y = col("l_quantity")
      val n = count(lit(1)).over(w).cast("double")
      val sx = sum(x).over(w); val sy = sum(y).over(w)
      val sxy = sum(x * y).over(w)
      val sxx = sum(x * x).over(w); val syy = sum(y * y).over(w)
      val cov = when(n > 1, (sxy - sx * sy / n) / (n - 1))
      val vx = (sxx - sx * sx / n) / (n - 1)
      val vy = (syy - sy * sy / n) / (n - 1)
      val corr = when(n > 1 && vx > lit(1e-12) && vy > lit(1e-12),
        (sxy - sx * sy / n) / (n - 1) / sqrt(vx * vy))
      t(s, d, "lineitem").filter(col("l_suppkey") <= 20).select(
          col("l_orderkey"), col("l_linenumber"),
          (round(cov * 1e4) / 1e4).as("roll_cov"),
          (round(corr * 1e6) / 1e6).as("roll_corr"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // polars int_ranges + date_ranges (functions/range/*.py — the plural,
    // per-row-list forms). Emitted as scalar projections (size / ends /
    // sum / joined string): raw list columns are a driver hash hazard
    // (arrow child-name skew). int_ranges is end-EXCLUSIVE and empty when
    // end ≤ start (pinned by the len=0 rows); date_ranges is closed-both.
    "range_int_lists" -> ((s, d) => {
      val start = col("o_custkey") % 5
      val len = col("o_orderkey") % 4
      val ints = when(len > 0, sequence(start, start + len - 1))
        .otherwise(array().cast("array<bigint>"))
      val nDays = (col("o_orderkey") % 3).cast("int")
      val dates = expr(
        "transform(sequence(o_orderdate, timestampadd(DAY, cast(o_orderkey % 3 as int), o_orderdate), interval 1 day), x -> date_format(x, 'yyyy-MM-dd'))")
      t(s, d, "orders").filter(col("o_orderkey") <= 2000).select(
          col("o_orderkey"),
          size(ints).as("n_int"),
          try_element_at(ints, lit(1)).as("int_first"),
          try_element_at(ints, lit(-1)).as("int_last"),
          aggregate(ints, lit(0L), (a, x) => a + x).as("int_sum"),
          array_join(transform(ints, _.cast("string")), ",").as("int_csv"),
          (nDays + 1).as("n_date"),
          element_at(dates, -1).as("date_last"),
          array_join(dates, ",").as("date_csv"))
        .orderBy(col("o_orderkey"))
    }),

    // The trained-IVF composition: KMeans.train (one Lloyd round, k=4,
    // L2) supplies ivfTopK's centroid set — the FAISS build-then-search
    // shape as two plan-native steps. nprobe=2 exercises the multi-probe
    // path against trained (not seed) cells; queries are corpus members,
    // so rank 1 is the self-hit at cosine 1 (a free sanity pin).
    "sim_ivf_trained" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("e"))
      val (cents, _) = KMeans.train(emb, "vec_id", "e",
        QueriesMisc12.seedCentroids(emb, 4), iters = 1)
      val qs = emb.filter(col("vec_id") <= 2)
        .select(col("vec_id").as("query_id"), col("e"))
      Similarity.ivfTopK(emb, qs, "vec_id", "e", "query_id",
          cents, k = 5, nprobe = 2)
        .orderBy(col("query_id"), col("rank"))
    }),

    // The DSIR paper's actual selection step, end to end: importance
    // weights → Efraimidis–Spirakis weighted sampling WITHOUT
    // replacement in the Gumbel-top-k log form (Dsir +
    // Sampling.sampleWeightedLog, composed unchanged) — ranks on
    // logw − ln(−ln u), which selects the same set as ES on
    // w = exp(logw) but never exponentiates, so corpus-scale log
    // weights can't overflow the key to rounded-0.0 ties or underflow
    // the weight to a silent row drop. Top-50 by the integer-scaled
    // es_key, ties by doc_id — fully deterministic and fully replayed
    // by the oracle (the shared dsirCtes feed the same ranking). The
    // plan stays the zero-doc-shuffle scoring shape plus one global
    // TakeOrderedAndProject for the top-k.
    "text_dsir_resample" -> ((s, d) => {
      val w = graft.text.Dsir.importanceWeights(
          t(s, d, "documents"), "doc_id", "text",
          isTarget = col("lang") === "en", buckets = 64)
      graft.ops.Sampling.sampleWeightedLog(w, "doc_id", "dsir_logw", k = 50)
        .select(col("doc_id"), col("lang"), col("es_key"))
        .orderBy(col("doc_id"))
    }),

    // polars cbrt (Expr.cbrt) + is_last_distinct (the mirror of the
    // green win_first_distinct key): cube root keeps negative-input
    // semantics (cbrt(-8) = -2, both engines), last-distinct flags the
    // final occurrence of each event_type along event time.
    "misc_cbrt_last_distinct" -> ((s, d) =>
      t(s, d, "events").filter(col("user_id") <= 10).select(
          col("event_id"),
          (round(cbrt(col("value")) * 1e6) / 1e6).as("cbrt_v"),
          graft.functions.isLastDistinct(col("event_type"),
            struct(col("ts"), col("event_id"))).as("is_last"))
        .orderBy(col("event_id"))),

    // polars arg_sort_by (functions/lazy.py): the permutation that would
    // sort the frame by (totalprice DESC, orderdate ASC, key ASC) — the
    // k-th output row carries the original index of the k-th row in that
    // order. A global permutation is inherently a total order, so the
    // key keeps the input small; at scale the same shape is sort +
    // row_index (zipWithIndex), which SURVEY's sort row already covers.
    "misc_arg_sort_by" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy(col("o_totalprice").desc, col("o_orderdate").asc,
        col("o_orderkey").asc)
      t(s, d, "orders").filter(col("o_orderkey") <= 200)
        .select(col("o_orderkey"), row_number().over(w).as("pos"))
        .select(col("pos"), col("o_orderkey").as("orig_idx"))
        .orderBy(col("pos"))
    }),

    // polars linear_spaces / datetime_ranges / time_ranges (the plural,
    // per-row-list range builders; time lists emitted as HH:mm:ss
    // strings — the honest mapping, Spark has no TIME dtype). Same
    // scalar-projection discipline as range_int_lists.
    "range_more_lists" -> ((s, d) => {
      val n = (col("r_regionkey") % 3 + 2).cast("int")    // num samples ≥ 2
      val span = (col("r_regionkey") + 1).cast("double")
      // closed-both linspace, emitted as 1e6-scaled longs (exact csv —
      // no double-repr dependence)
      val lin = transform(sequence(lit(0), n - 1), i =>
        round((col("r_regionkey").cast("double") + i.cast("double") * span /
          (n - 1).cast("double")) * 1e6).cast("long"))
      val t0 = "timestamp'2024-03-01 06:30:00'"
      val start = s"timestampadd(DAY, cast(r_regionkey as int), $t0)"
      val hours = expr(
        s"transform(sequence($start, timestampadd(HOUR, cast(r_regionkey % 3 as int) + 1, $start), " +
          "interval 1 hour), x -> date_format(x, 'yyyy-MM-dd HH:mm:ss'))")
      val times = expr(
        s"transform(sequence($t0, timestampadd(MINUTE, 30 * cast(r_regionkey % 4 as int), $t0), " +
          "interval 30 minute), x -> date_format(x, 'HH:mm:ss'))")
      t(s, d, "region").select(
          col("r_regionkey"),
          size(lin).as("n_lin"),
          try_element_at(lin, lit(1)).as("lin_first"),
          try_element_at(lin, lit(-1)).as("lin_last"),
          array_join(transform(lin, _.cast("string")), ",").as("lin_csv"),
          expr(s"date_format($start, 'yyyy-MM-dd HH:mm:ss')").as("dt_start"),
          array_join(hours, ",").as("dt_csv"),
          array_join(times, ",").as("time_csv"))
        .orderBy(col("r_regionkey"))
    }),

    // Johnson–Lindenstrauss random projection (Achlioptas sign matrix,
    // 64 → 16 dims): the standard 4× embedding-compression step before
    // clustering/ANN at corpus scale. The matrix is seeded from md5
    // parities so the SQL oracle rebuilds it bit-identically; the key
    // emits the first four components plus the projected/original
    // squared norms — pinning the whole transform, not a sample of it.
    "sim_random_projection" -> ((s, d) => {
      val p = signMatrix(16, 64)
      val e = col("e")
      val ys = p.map(row => dotProduct64(e, row))
      val sq = ys.map(y => y * y).reduce(_ + _)
      t(s, d, "embeddings")
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("e"))
        .select(col("vec_id"),
          (round(ys(0) * 1e6) / 1e6).as("y0"),
          (round(ys(1) * 1e6) / 1e6).as("y1"),
          (round(ys(2) * 1e6) / 1e6).as("y2"),
          (round(ys(3) * 1e6) / 1e6).as("y3"),
          (round(sq * 1e6) / 1e6).as("proj_sq"),
          (round(graft.functions.dotProduct(e, e) * 1e6) / 1e6).as("x_sq"))
        .orderBy(col("vec_id"))
    })
  )

  private def dotProduct64(vec: Column, row: Array[Double]): Column =
    graft.functions.dotProduct(vec, array(row.map(lit): _*))

  val oracle: Map[String, String] = Map(

    "win_rolling_corr" ->
      """WITH t AS (
        | SELECT l_orderkey, l_linenumber, l_extendedprice AS x,
        |   l_quantity AS y,
        |  count(*) OVER w AS n,
        |  sum(l_extendedprice) OVER w AS sx,
        |  sum(l_quantity) OVER w AS sy,
        |  sum(l_extendedprice * l_quantity) OVER w AS sxy,
        |  sum(l_extendedprice * l_extendedprice) OVER w AS sxx,
        |  sum(l_quantity * l_quantity) OVER w AS syy
        | FROM lineitem WHERE l_suppkey <= 20
        | WINDOW w AS (PARTITION BY l_suppkey
        |   ORDER BY l_shipdate, l_orderkey, l_linenumber
        |   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
        |SELECT l_orderkey, l_linenumber,
        | round((CASE WHEN n > 1
        |   THEN (sxy - sx * sy / n) / (n - 1) END) * 1e4) / 1e4 + 0.0
        |   AS roll_cov,
        | round((CASE WHEN n > 1
        |   AND (sxx - sx * sx / n) / (n - 1) > 1e-12
        |   AND (syy - sy * sy / n) / (n - 1) > 1e-12
        |   THEN (sxy - sx * sy / n) / (n - 1)
        |     / sqrt(((sxx - sx * sx / n) / (n - 1))
        |          * ((syy - sy * sy / n) / (n - 1))) END) * 1e6) / 1e6 + 0.0
        |   AS roll_corr
        |FROM t ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "range_int_lists" ->
      """WITH t AS (
        | SELECT o_orderkey,
        |  range(o_custkey % 5, o_custkey % 5 + o_orderkey % 4) AS ints,
        |  [strftime(x, '%Y-%m-%d')
        |   FOR x IN generate_series(o_orderdate,
        |     o_orderdate + to_days((o_orderkey % 3)::INT),
        |     INTERVAL 1 DAY)] AS dates
        | FROM orders WHERE o_orderkey <= 2000)
        |SELECT o_orderkey,
        | len(ints)::INT AS n_int,
        | ints[1] AS int_first,
        | ints[-1] AS int_last,
        | coalesce(list_sum(ints), 0)::BIGINT AS int_sum,
        | coalesce(array_to_string(ints, ','), '') AS int_csv,
        | len(dates)::INT AS n_date,
        | dates[-1] AS date_last,
        | array_to_string(dates, ',') AS date_csv
        |FROM t ORDER BY o_orderkey""".stripMargin,

    "text_dsir_resample" ->
      // Gumbel form: es_key = RAW logw − ln(−ln u) (not the rounded
      // logw emission), integer-scaled, ties to doc_id — the k-th-row
      // boundary is deterministic. NULL-text docs have NULL logw and
      // are dropped on both sides (isNotNull / tk IS NOT NULL).
      s"""WITH ${QueriesMisc12.dsirCtes},
        |sel AS (
        |  SELECT t.doc_id, t.lang,
        |    round((coalesce(ws.w, 0.0)
        |      - ln(-ln(('0x' || substr(md5(t.doc_id::VARCHAR), 1, 15))::BIGINT
        |              / 1152921504606846976.0))) * 1e6) / 1e6 + 0.0 AS es_key
        |  FROM tok t LEFT JOIN ws USING (doc_id)
        |  WHERE t.tk IS NOT NULL),
        |top AS (SELECT * FROM sel ORDER BY es_key DESC, doc_id LIMIT 50)
        |SELECT doc_id, lang, es_key FROM top ORDER BY doc_id""".stripMargin,

    "misc_cbrt_last_distinct" ->
      """SELECT event_id,
        | round(cbrt(value) * 1e6) / 1e6 + 0.0 AS cbrt_v,
        | row_number() OVER (PARTITION BY event_type
        |   ORDER BY ts DESC, event_id DESC) = 1 AS is_last
        |FROM events WHERE user_id <= 10
        |ORDER BY event_id""".stripMargin,

    "misc_arg_sort_by" ->
      """SELECT pos, orig_idx FROM (
        |  SELECT o_orderkey AS orig_idx,
        |    CAST(row_number() OVER (ORDER BY o_totalprice DESC,
        |      o_orderdate ASC, o_orderkey ASC) AS INTEGER) AS pos
        |  FROM orders WHERE o_orderkey <= 200)
        |ORDER BY pos""".stripMargin,

    "range_more_lists" ->
      """WITH t AS (
        | SELECT r_regionkey,
        |  (r_regionkey % 3 + 2)::INT AS n,
        |  (r_regionkey + 1)::DOUBLE AS span,
        |  TIMESTAMP '2024-03-01 06:30:00' + to_days(r_regionkey::INT)
        |    AS strt
        | FROM region),
        |l AS (
        | SELECT r_regionkey, n, strt,
        |  [CAST(round((r_regionkey + i * span / (n - 1)) * 1e6) AS BIGINT)
        |   FOR i IN generate_series(0, n - 1)] AS lin,
        |  [strftime(x, '%Y-%m-%d %H:%M:%S')
        |   FOR x IN generate_series(strt,
        |     strt + to_hours((r_regionkey % 3)::INT + 1),
        |     INTERVAL 1 HOUR)] AS hrs,
        |  [strftime(x, '%H:%M:%S')
        |   FOR x IN generate_series(TIMESTAMP '2024-03-01 06:30:00',
        |     TIMESTAMP '2024-03-01 06:30:00'
        |       + to_minutes(30 * (r_regionkey % 4)::INT),
        |     INTERVAL 30 MINUTE)] AS tms
        | FROM t)
        |SELECT r_regionkey,
        | len(lin)::INT AS n_lin,
        | lin[1] AS lin_first,
        | lin[-1] AS lin_last,
        | array_to_string(lin, ',') AS lin_csv,
        | strftime(strt, '%Y-%m-%d %H:%M:%S') AS dt_start,
        | array_to_string(hrs, ',') AS dt_csv,
        | array_to_string(tms, ',') AS time_csv
        |FROM l ORDER BY r_regionkey""".stripMargin,

    "sim_ivf_trained" ->
      // c1 = the KMeans round replayed (the SAME shared CTE constant as
      // sim_kmeans_train — QueriesMisc12.kmeansReplayCtes), then the
      // ivfTopK shape: corpus cells by raw-cosine argmax (ties to
      // smaller cid), queries probe their 2 nearest cells.
      s"""WITH ${QueriesMisc12.kmeansReplayCtes},
        |cells AS (
        |  SELECT vec_id, e, cid FROM (
        |    SELECT v.vec_id, v.e, c.cid,
        |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
        |        -(list_dot_product(v.e, c.cvec)
        |          / (sqrt(list_dot_product(v.e, v.e))
        |             * sqrt(list_dot_product(c.cvec, c.cvec)))) ASC,
        |        c.cid ASC) AS rn
        |    FROM v CROSS JOIN c1 c) WHERE rn = 1),
        |q AS (
        |  SELECT vec_id AS query_id, e AS qv, cid FROM (
        |    SELECT v.vec_id, v.e, c.cid,
        |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
        |        -(list_dot_product(v.e, c.cvec)
        |          / (sqrt(list_dot_product(v.e, v.e))
        |             * sqrt(list_dot_product(c.cvec, c.cvec)))) ASC,
        |        c.cid ASC) AS rn
        |    FROM v CROSS JOIN c1 c WHERE v.vec_id <= 2) WHERE rn <= 2),
        |scored AS (
        |  SELECT q.query_id, d.vec_id,
        |    round(list_dot_product(d.e, q.qv)
        |      / (sqrt(list_dot_product(d.e, d.e))
        |         * sqrt(list_dot_product(q.qv, q.qv))), 4) AS cosine
        |  FROM cells d JOIN q ON d.cid = q.cid)
        |SELECT query_id, vec_id, cosine, rank FROM (
        |  SELECT query_id, vec_id, cosine,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, vec_id) AS INTEGER) AS rank
        |  FROM scored)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "sim_random_projection" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |pm AS (
        |  SELECT i, [CASE WHEN ('0x' || substr(md5(i::VARCHAR || ','
        |        || j::VARCHAR), 1, 8))::BIGINT % 2 = 0
        |      THEN 0.25 ELSE -0.25 END
        |    FOR j IN generate_series(1, 64)] AS prow
        |  FROM generate_series(0, 15) AS t(i)),
        |proj AS (
        |  SELECT vec_id, i, list_dot_product(e, prow) AS y
        |  FROM v CROSS JOIN pm),
        |agg AS (
        |  SELECT vec_id, sum(y * y) AS sq,
        |    max(CASE WHEN i = 0 THEN y END) AS y0,
        |    max(CASE WHEN i = 1 THEN y END) AS y1,
        |    max(CASE WHEN i = 2 THEN y END) AS y2,
        |    max(CASE WHEN i = 3 THEN y END) AS y3
        |  FROM proj GROUP BY vec_id)
        |SELECT a.vec_id,
        | round(y0 * 1e6) / 1e6 + 0.0 AS y0,
        | round(y1 * 1e6) / 1e6 + 0.0 AS y1,
        | round(y2 * 1e6) / 1e6 + 0.0 AS y2,
        | round(y3 * 1e6) / 1e6 + 0.0 AS y3,
        | round(sq * 1e6) / 1e6 AS proj_sq,
        | round(list_dot_product(v.e, v.e) * 1e6) / 1e6 AS x_sq
        |FROM agg a JOIN v USING (vec_id) ORDER BY a.vec_id""".stripMargin
  )
}
