package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.queries.util._
import graft.{functions => gf}
import graft.ml.Similarity

/** Round-3 plan-level widening: EWM, peaks, qcut/hist, product agg,
  * arbitrary-expression aggs, right/null-safe joins, merge-sorted concat,
  * TPC-H Q3/Q5 through the SQL frontend, CSV/JSON round-trips, IVF ANN,
  * multimodal feature-stub plumbing.
  */
object QueriesExtra2 {

  val queries: Map[String, Q] = Map(
    // polars ewm_mean(alpha=0.5, adjust=true) per order, linenumber order
    // (reference crates/polars-ops/src/series/ops/ewm.rs). Dyadic weights +
    // integral quantities → exact doubles on both engines.
    "win_ewm_mean" -> ((s, d) => {
      val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"))
      t(s, d, "lineitem").filter(col("l_orderkey") <= 2000).select(
        col("l_orderkey"), col("l_linenumber"),
        round(gf.ewmMeanRows(col("l_quantity"), w, span = 16, alpha = 0.5), 6).as("ewm"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // polars peak_max/peak_min (crates/polars-core/src/chunked_array/peaks.rs)
    "win_peaks" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, d, "events").filter(col("user_id") <= 20).select(
        col("event_id"), col("user_id"),
        gf.peakMax(col("value"), w).as("pk_max"),
        gf.peakMin(col("value"), w).as("pk_min"))
        .orderBy(col("event_id"))
    }),

    // polars qcut (crates/polars-ops/src/series/ops/cut.rs): bin by quantile
    // BREAKS, not a global ntile — the breaks aggregate broadcasts and the
    // binning is a map-side comparison, so the op distributes at any scale
    // (the r3 ntile form was a single-task window). Breaks are exact
    // percentiles here to stay oracle-matched; at 100 TB swap in
    // approx_percentile — same plan shape, bounded memory.
    "math_qcut" -> ((s, d) => {
      val cust = t(s, d, "customer")
      val breaks = cust.agg(
        percentile(col("c_acctbal"), lit(0.25)).as("b1"),
        percentile(col("c_acctbal"), lit(0.5)).as("b2"),
        percentile(col("c_acctbal"), lit(0.75)).as("b3"))
      cust.crossJoin(broadcast(breaks))
        .select(col("c_custkey"),
          (lit(1) +
            when(col("c_acctbal") > col("b1"), 1).otherwise(0) +
            when(col("c_acctbal") > col("b2"), 1).otherwise(0) +
            when(col("c_acctbal") > col("b3"), 1).otherwise(0)).as("quartile"))
        .withColumn("q_label",
          concat(lit("q"), col("quartile").cast("string")))
        .orderBy(col("c_custkey"))
    }),

    // polars hist (crates/polars-ops/src/chunked_array/hist.rs): fixed-width
    // bins from global min/max — bounds agg broadcast, identical fp both sides
    "math_hist" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val bounds = li.agg(min(col("l_extendedprice")).as("mn"),
        max(col("l_extendedprice")).as("mx"))
      li.crossJoin(broadcast(bounds))
        .select(least(floor((col("l_extendedprice") - col("mn")) /
          ((col("mx") - col("mn")) / 10)), lit(9.0)).cast("long").as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as("n"))
        .orderBy(col("bin"))
    }),

    // polars product agg (FunctionExpr::Product): fold-multiply over the
    // group's collected values — exact for integral doubles < 2^53
    "agg_product" -> ((s, d) =>
      t(s, d, "lineitem").filter(col("l_orderkey") <= 2000)
        .groupBy(col("l_orderkey"))
        .agg(aggregate(collect_list(col("l_quantity")), lit(1.0),
          (acc, x) => acc * x).as("qty_product"))
        .orderBy(col("l_orderkey"))),

    // polars arbitrary expressions inside agg (SURVEY §2.5): filtered sum,
    // sorted head-k list, conditional count — all in ONE groupBy pass.
    // The list lands as a '|'-joined fixed-scale decimal string: the driver's
    // pandas comparator can't hash array cells, and decimal→string rendering
    // (unlike double→string) is identical across engines.
    "agg_expr_general" -> ((s, d) =>
      t(s, d, "lineitem").groupBy(col("l_returnflag")).agg(
        round(sum(when(col("l_discount") > 0.05,
          col("l_extendedprice") * (lit(1) - col("l_discount")))), 2).as("hi_rev"),
        array_join(transform(
          slice(sort_array(collect_list(col("l_quantity")), asc = false), 1, 3),
          x => x.cast("decimal(18,2)").cast("string")), "|").as("top3_qty"),
        count(when(col("l_discount") > 0.05, lit(1))).as("n_hi"))
        .orderBy(col("l_returnflag"))),

    "join_right" -> ((s, d) =>
      t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
        .join(t(s, d, "customer").select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"), "right")
        .select(col("c_custkey"), col("c_mktsegment"), col("o_orderkey"))
        .orderBy(col("c_custkey").asc_nulls_last, col("o_orderkey").asc_nulls_last)),

    // null-safe equality join (polars join nulls_equal / Operator::EqValidity)
    "join_null_safe" -> ((s, d) => {
      val a = t(s, d, "nation")
        .select(col("n_nationkey").as("a_key"), nullif(col("n_regionkey"), lit(2)).as("a_reg"))
      val b = t(s, d, "nation")
        .select(col("n_nationkey").as("b_key"), nullif(col("n_regionkey"), lit(2)).as("b_reg"))
      a.join(b, col("a_reg") <=> col("b_reg"))
        .select(col("a_key"), col("b_key"))
        .orderBy(col("a_key"), col("b_key"))
    }),

    // polars merge_sorted: two key-sorted frames merged on the key
    "concat_merge_sorted" -> ((s, d) => {
      val odd = t(s, d, "orders").filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), col("o_orderdate")).orderBy(col("o_orderdate"))
      val even = t(s, d, "orders").filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_orderdate")).orderBy(col("o_orderdate"))
      graft.ops.MergeSorted.merge(odd, even, col("o_orderdate"), col("o_orderkey"))
    }),

    // SQL frontend: TPC-H Q3 shape (shared dialect — same text runs on DuckDB)
    "sql_tpch_q3" -> ((s, d) => {
      t(s, d, "customer").createOrReplaceTempView("customer")
      t(s, d, "orders").createOrReplaceTempView("orders")
      t(s, d, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(QueriesExtra2.q3Sql)
    }),

    "sql_tpch_q5" -> ((s, d) => {
      Seq("customer", "orders", "lineitem", "supplier", "nation", "region")
        .foreach(n => t(s, d, n).createOrReplaceTempView(n))
      s.sql(QueriesExtra2.q5Sql)
    }),

    // CSV sink + scan round-trip (SURVEY §2.2): written with Spark's writer,
    // read back with the source schema — values must survive bit-exact
    "io_csv_roundtrip" -> ((s, d) => {
      val src = t(s, d, "supplier")
      val tmp = s"/tmp/graft_io/csv_supplier"
      src.write.mode("overwrite").option("header", "true").csv(tmp)
      s.read.schema(src.schema).option("header", "true").csv(tmp)
        .orderBy(col("s_suppkey"))
    }),

    // NDJSON sink + scan round-trip
    "io_json_roundtrip" -> ((s, d) => {
      val src = t(s, d, "part")
      val tmp = s"/tmp/graft_io/json_part"
      src.write.mode("overwrite").json(tmp)
      s.read.schema(src.schema).json(tmp)
        .orderBy(col("p_partkey"))
    }),

    // IVF ANN (nprobe=1): centroids = first 8 vectors (collected: 8 rows),
    // corpus bucketed by nearest centroid, search only the query's bucket.
    // The scale story vs brute force: candidate set shrinks ~C×.
    "sim_ivf_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"),
          transform(col("embedding"), x => x.cast("double")).as("cvec"))
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
        .sortBy(_._1).toSeq
      val db = emb.filter(col("vec_id") >= 8)
      val qs = emb.filter(col("vec_id").between(8, 10))
        .select(col("vec_id").as("query_id"), col("embedding"))
      Similarity.ivfTopK(db, qs, "vec_id", "embedding", "query_id", centroids, k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Multimodal feature-extraction stub: deterministic fake embedding from
    // md5 bytes (the real decoder is a Pandas-UDF/mapInPandas slot — libs
    // not in this container; SURVEY north-star M6). Spark-side plumbing
    // (schema, batch shape, codegen'd hash) is real.
    "multimodal_embed_stub" -> ((s, d) => {
      val h = md5(col("text"))
      val feat = transform(sequence(lit(0), lit(3)), i =>
        round((conv(h.substr(i * 8 + 1, lit(8)), 16, 10).cast("long") % 1000)
          / lit(1000.0), 3))
      t(s, d, "documents").select(
        col("doc_id"),
        array_join(transform(feat, x => x.cast("decimal(6,3)").cast("string")), "|")
          .as("feat"),
        col("n_chars"))
        .orderBy(col("doc_id"))
    })
  )

  val q3Sql: String =
    """SELECT l_orderkey,
      | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      | o_orderdate
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15'
      |  AND l_shipdate > TIMESTAMP '1998-03-15'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  val q5Sql: String =
    // revenue is summed as EXACT integer 1e-4 dollars (price and discount
    // are 2dp, so round(·*100) is integral and each product is exact in a
    // double; the bigint sum is then order-independent and engine-
    // identical — the float sum's last-ulp jitter flipped a cent-rounding
    // boundary at sf1). round(x/100.0)/100 re-emits 2dp dollars: both
    // engines round halves away from zero, so even an exact N.5 agrees.
    """SELECT n_name,
      | round(cast(sum(cast(round(l_extendedprice * 100)
      |   * round((1 - l_discount) * 100) as bigint)) as double) / 100.0)
      |   / 100 AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  val oracle: Map[String, String] = Map(
    // adjust=true EWM with α=1/2: weight (1-α)^(i-j) = 2^-i · 2^j — the 2^j
    // form avoids underflow; groups are ≤7 rows so 2^rn stays tiny
    "win_ewm_mean" ->
      """WITH t AS (
        | SELECT l_orderkey, l_linenumber, l_quantity,
        |  row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS rn
        | FROM lineitem WHERE l_orderkey <= 2000)
        |SELECT l_orderkey, l_linenumber,
        | round(sum(l_quantity * power(2.0, rn)) OVER w
        |   / sum(power(2.0, rn)) OVER w, 6) AS ewm
        |FROM t
        |WINDOW w AS (PARTITION BY l_orderkey ORDER BY rn
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY 1, 2""".stripMargin,

    "win_peaks" ->
      """SELECT event_id, user_id,
        | (prev IS NULL OR value > prev) AND (next IS NULL OR value > next) AS pk_max,
        | (prev IS NULL OR value < prev) AND (next IS NULL OR value < next) AS pk_min
        |FROM (SELECT event_id, user_id, value,
        |  lag(value) OVER w AS prev, lead(value) OVER w AS next
        | FROM events WHERE user_id <= 20
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |ORDER BY event_id""".stripMargin,

    "math_qcut" ->
      """WITH b AS (
        | SELECT quantile_cont(c_acctbal, 0.25) AS b1,
        |        quantile_cont(c_acctbal, 0.5)  AS b2,
        |        quantile_cont(c_acctbal, 0.75) AS b3
        | FROM customer)
        |SELECT c_custkey,
        | CAST(1 + (c_acctbal > b1)::INT + (c_acctbal > b2)::INT
        |        + (c_acctbal > b3)::INT AS INTEGER) AS quartile,
        | 'q' || CAST(1 + (c_acctbal > b1)::INT + (c_acctbal > b2)::INT
        |        + (c_acctbal > b3)::INT AS VARCHAR) AS q_label
        |FROM customer, b ORDER BY c_custkey""".stripMargin,

    "math_hist" ->
      """WITH b AS (SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx
        |  FROM lineitem)
        |SELECT CAST(least(floor((l_extendedprice - mn) / ((mx - mn) / 10)), 9) AS BIGINT) AS bin,
        | count(*) AS n
        |FROM lineitem, b GROUP BY 1 ORDER BY 1""".stripMargin,

    "agg_product" ->
      """SELECT l_orderkey, product(l_quantity) AS qty_product
        |FROM lineitem WHERE l_orderkey <= 2000
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "agg_expr_general" ->
      """SELECT l_returnflag,
        | round(sum(CASE WHEN l_discount > 0.05
        |   THEN l_extendedprice * (1 - l_discount) END), 2) AS hi_rev,
        | array_to_string(list_transform((list(l_quantity ORDER BY l_quantity DESC))[1:3],
        |   x -> CAST(CAST(x AS DECIMAL(18,2)) AS VARCHAR)), '|') AS top3_qty,
        | count(CASE WHEN l_discount > 0.05 THEN 1 END) AS n_hi
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "join_right" ->
      """SELECT c_custkey, c_mktsegment, o_orderkey
        |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        |ORDER BY c_custkey NULLS LAST, o_orderkey NULLS LAST""".stripMargin,

    "join_null_safe" ->
      """SELECT a.n_nationkey AS a_key, b.n_nationkey AS b_key
        |FROM (SELECT n_nationkey, nullif(n_regionkey, 2) AS reg FROM nation) a
        |JOIN (SELECT n_nationkey, nullif(n_regionkey, 2) AS reg FROM nation) b
        | ON a.reg IS NOT DISTINCT FROM b.reg
        |ORDER BY a_key, b_key""".stripMargin,

    "concat_merge_sorted" ->
      """SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderkey % 2 = 1
        |UNION ALL
        |SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderkey % 2 = 0
        |ORDER BY o_orderdate, o_orderkey""".stripMargin,

    "sql_tpch_q3" -> q3Sql,
    "sql_tpch_q5" -> q5Sql,

    "io_csv_roundtrip" ->
      "SELECT * FROM supplier ORDER BY s_suppkey",

    "io_json_roundtrip" ->
      "SELECT * FROM part ORDER BY p_partkey",

    "sim_ivf_topk" ->
      """WITH cent AS (
        | SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec
        | FROM embeddings WHERE vec_id < 8),
        |db AS (SELECT vec_id, embedding::DOUBLE[] AS v
        | FROM embeddings WHERE vec_id >= 8),
        |assigned AS (
        | SELECT vec_id, v, cid FROM (
        |  SELECT db.vec_id, db.v, cent.cid,
        |   row_number() OVER (PARTITION BY db.vec_id ORDER BY
        |    -(list_dot_product(db.v, cent.cvec)
        |      / (sqrt(list_dot_product(db.v, db.v))
        |         * sqrt(list_dot_product(cent.cvec, cent.cvec)))) ASC, cent.cid ASC) AS rn
        |  FROM db CROSS JOIN cent)
        | WHERE rn = 1),
        |q AS (SELECT vec_id AS query_id, v AS qv, cid FROM assigned
        | WHERE vec_id BETWEEN 8 AND 10),
        |scored AS (
        | SELECT q.query_id, d.vec_id,
        |  round(list_dot_product(d.v, q.qv)
        |    / (sqrt(list_dot_product(d.v, d.v))
        |       * sqrt(list_dot_product(q.qv, q.qv))), 4) AS cosine
        | FROM assigned d JOIN q ON d.cid = q.cid)
        |SELECT query_id, vec_id, cosine, rank FROM (
        | SELECT query_id, vec_id, cosine,
        |  CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY cosine DESC, vec_id) AS INTEGER) AS rank
        | FROM scored)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "multimodal_embed_stub" ->
      """SELECT doc_id,
        | array_to_string(list_transform(generate_series(0, 3), i ->
        |   CAST(CAST(round((('0x' || substr(md5(text), i*8 + 1, 8))::BIGINT % 1000)
        |     / 1000.0, 3) AS DECIMAL(6,3)) AS VARCHAR)), '|') AS feat,
        | n_chars
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
