package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.ops.{AlignFrames, JsonNormalize}
import graft.ml.Similarity
import util._

/** Round-11 additions. Batch 1 (the round-9 verdict's missing list):
  * json_normalize, align_frames, the oracle-pinned LSH bucket cap.
  * Batch 2 (fresh py-polars `__all__` sweep): concat_arr (`arr_concat`),
  * the parquet metadata readers (`io_parquet_rowgroups/schema`).
  * Batch 3 (beyond reference): int8 embedding quantization
  * (`sim_int8_quantize`). */
object QueriesMisc10 {

  // same fixed hyperplanes as QueriesText (sin((i+1)*p), p ∈ {7,13,29}) so
  // the oracle can recompute them in SQL
  private val planes: Seq[Array[Double]] = Seq(7, 13, 29).map { p =>
    Array.tabulate(64)(i => math.sin((i + 1).toDouble * p))
  }

  val queries: Map[String, Q] = Map(

    // polars json_normalize (py-polars/src/polars/convert/normalize.py):
    // documents metadata re-encoded as a nested JSON string (2 levels of
    // nesting, one key present only on doc_id%3==0 rows), then flattened
    // back by the op — schema INFERRED by the distributed reader, keys
    // joined with ".". The oracle computes the flattened values straight
    // from the base columns, so the whole encode→infer→parse→flatten
    // round-trip must be value-exact, nulls included.
    "misc_json_normalize" -> ((s, d) => {
      val docs = t(s, d, "documents").filter(col("doc_id") < 4000)
      val payload = to_json(struct(
        col("lang").as("lang"),
        struct(
          col("source").as("source"),
          struct(
            col("n_chars").as("n"),
            (col("n_chars") % 10).as("bucket")).as("chars")).as("meta"),
        when(col("doc_id") % 3 === 0, col("doc_id") * 2).as("opt")))
      val framed = docs.select(col("doc_id"), payload.as("payload"))
      JsonNormalize.normalize(framed, "payload", schema = None)
        .select(col("doc_id"), col("lang"), col("`meta.source`"),
          col("`meta.chars.n`"), col("`meta.chars.bucket`"), col("opt"))
        .orderBy(col("doc_id"))
    }),

    // json_normalize max_level: the SAME payload flattened with a depth
    // budget of 2 — meta.chars stays a JSON-encoded string (polars runs
    // the remainder through its JSON encoder). Spark's to_json and
    // DuckDB's canonical JSON agree on compact key:value rendering of
    // integer fields, so the string is oracle-comparable.
    "misc_json_normalize_lvl" -> ((s, d) => {
      val docs = t(s, d, "documents").filter(col("doc_id") < 4000)
      val payload = to_json(struct(
        col("lang").as("lang"),
        struct(
          col("source").as("source"),
          struct(
            col("n_chars").as("n"),
            (col("n_chars") % 10).as("bucket")).as("chars")).as("meta")))
      val framed = docs.select(col("doc_id"), payload.as("payload"))
      JsonNormalize.normalize(framed, "payload", schema = None, maxLevel = 2)
        .select(col("doc_id"), col("lang"), col("`meta.source`"),
          col("`meta.chars`"))
        .orderBy(col("doc_id"))
    }),

    // polars align_frames (py-polars/src/polars/functions/eager.py:819):
    // three frames with overlapping + disjoint key ranges aligned on
    // o_orderkey (full strategy). The aligned frames are row-aligned by
    // construction, so the key emits them horizontally stacked — the
    // null-injection sites prove alignment (each frame keeps nulls where
    // it lacked the key).
    "misc_align_frames" -> ((s, d) => {
      val ord = t(s, d, "orders")
      val f1 = ord.filter(col("o_orderkey") <= 3000)
        .select(col("o_orderkey"), col("o_totalprice").as("price1"))
      val f2 = ord.filter(col("o_orderkey").between(2000, 5000))
        .select(col("o_orderkey"), col("o_custkey").as("cust2"))
      val f3 = ord.filter(col("o_orderkey") >= 4500)
        .filter(col("o_orderkey") <= 6000)
        .select(col("o_orderkey"), col("o_orderstatus").as("status3"))
      val aligned = AlignFrames.align(Seq(f1, f2, f3), Seq("o_orderkey"))
      // hstack on the shared spine key: every aligned frame carries the
      // same key set, so equi-joining them back is lossless
      aligned.reduce((a, b) => a.join(b, Seq("o_orderkey"), "full"))
        .orderBy(col("o_orderkey"))
    }),

    // The LSH bucket cap (embeddingNearDups maxBucketFraction),
    // oracle-pinned per the round-9 verdict: cap = ⌊rows/8⌋ — the exact
    // uniform share across the 8 buckets — so over-populated buckets drop
    // and the result provably depends on the pruning at EVERY SF (sf0.01
    // keeps 3 of 8 buckets, sf0.1 keeps 5 of 8). The cap is the 100 TB
    // safety valve: it bounds the per-bucket self-join quadratically
    // before the shuffle. The fraction form keeps construction plan-only
    // (the total is an in-plan one-row aggregate, not an eager count()).
    "sim_lsh_capped" -> ((s, d) =>
      Similarity.embeddingNearDups(t(s, d, "embeddings"), "vec_id",
        "embedding", planes, threshold = 0.3, maxBucketFraction = 1.0 / 8)
        .orderBy(col("id_a"), col("id_b"))),

    // Beyond-reference training-data op: symmetric per-vector int8
    // embedding quantization (ml/Quantize — pure codegen HOFs, no
    // shuffle). The key pins the FULL arithmetic cross-engine: the scale,
    // the first code, the exact integer self-dot of the codes, the
    // int8-cosine against the corpus vector 0, and an invariant boolean
    // that quantized cosine stays within 0.03 of the exact f64 cosine
    // (the practical int8 ANN error envelope at dim=64). Both engines
    // round doubles half away from zero, so codes match exactly.
    "sim_int8_quantize" -> ((s, d) => {
      import graft.ml.Quantize
      val ed = transform(col("embedding"), x => x.cast("double"))
      val base = t(s, d, "embeddings").select(col("vec_id"), ed.as("e"))
      val q = Quantize.withInt8(base, "e")
      // the reference vector's norms are constants: precompute them on the
      // one-row broadcast side instead of re-aggregating per corpus row
      val q0 = q.filter(col("vec_id") === 0).select(
        col("q8").as("qref"),
        sqrt(Quantize.int8Dot(col("q8"), col("q8")).cast("double")).as("qrefn"),
        col("e").as("eref"),
        graft.functions.l2Norm(col("e")).as("erefn"))
      val approx = Quantize.int8Dot(col("q8"), col("qref")).cast("double") /
        (sqrt(col("qnorm").cast("double")) * col("qrefn"))
      val exact = graft.functions.dotProduct(col("e"), col("eref")) /
        (graft.functions.l2Norm(col("e")) * col("erefn"))
      q.filter(col("vec_id") > 0).crossJoin(broadcast(q0))
        .withColumn("qnorm", Quantize.int8Dot(col("q8"), col("q8")))
        .select(col("vec_id"),
          (round(col("q8_scale") * 1e8) / 1e8).as("scale8"),
          element_at(col("q8"), 1).cast("int").as("code1"),
          col("qnorm"),
          (round(approx * 10000) / 10000).as("cos_q"),
          (abs(approx - exact) <= 0.03).as("cos_close"))
        .orderBy(col("vec_id"))
    }),

    // polars read_parquet_metadata's row-group surface
    // (sources/ParquetMeta.rowGroups — footer-only fan-out, one task per
    // file). Row-group layout is writer-specific, so the oracle checks
    // INVARIANTS that hold for any layout of the same table: group row
    // counts sum to the table's cardinality, every group carries the full
    // 11-leaf lineitem column set, and at least one group exists.
    "io_parquet_rowgroups" -> ((s, d) =>
      graft.sources.ParquetMeta.rowGroups(s, s"$d/lineitem.parquet")
        .agg(sum(col("num_rows")).as("total_rows"),
          min(col("num_columns")).as("min_cols"),
          max(col("num_columns")).as("max_cols"),
          (count(lit(1)) >= 1).as("has_groups"))),

    // polars read_parquet_schema (ParquetMeta.schemaOf): the leaf-column
    // physical schema is a property of the TABLE, not the writer — the
    // oracle pins the full name → parquet physical type map verbatim.
    "io_parquet_schema" -> ((s, d) =>
      graft.sources.ParquetMeta.schemaOf(s, s"$d/lineitem.parquet")
        .select(col("name"), col("physical_type"))
        .distinct()
        .orderBy(col("name"))),

    // polars concat_arr (functions/as_datatype.py:555 —
    // LazyFrame.concatArr): an embedding slice + two reshaped scalars
    // into one width-4 array; a null array input nulls the whole row
    // (vec_id % 7 == 0 fixture rows). The array is emitted as its scalar
    // projections (width + every element) because NO key may dump a raw
    // list column: arrow list child names differ across engines
    // ("element" vs "l"), a driver hash-surface skew of the same class as
    // the decimal float64 story. float→double casts are exact — bit-exact
    // compare, no rounding.
    "arr_concat" -> ((s, d) => {
      val ed = transform(col("embedding"), x => x.cast("double"))
      val head2 = when(col("vec_id") % 7 === 0, lit(null))
        .otherwise(slice(ed, 1, 2))
      graft.dsl.LazyFrame(
        t(s, d, "embeddings")
          .select(col("vec_id"), col("label"), head2.as("head2")))
        .concatArr("arr", Seq(col("head2"),
          col("label").cast("double"), col("vec_id").cast("double")), 4)
        .df.select(col("vec_id"), size(col("arr")).as("arr_w"),
          element_at(col("arr"), 1).as("e1"),
          element_at(col("arr"), 2).as("e2"),
          element_at(col("arr"), 3).as("e3"),
          element_at(col("arr"), 4).as("e4"))
        .orderBy(col("vec_id"))
    })
  )

  val oracle: Map[String, String] = Map(

    "misc_json_normalize" ->
      """SELECT doc_id, lang, source AS "meta.source",
        | n_chars AS "meta.chars.n", n_chars % 10 AS "meta.chars.bucket",
        | CASE WHEN doc_id % 3 = 0 THEN doc_id * 2 END AS opt
        |FROM documents WHERE doc_id < 4000 ORDER BY doc_id""".stripMargin,

    "misc_json_normalize_lvl" ->
      // key order: Spark's distributed JSON inference sorts struct fields
      // alphabetically, and to_json renders schema order — bucket, n
      """SELECT doc_id, lang, source AS "meta.source",
        | '{"bucket":' || (n_chars % 10) || ',"n":' || n_chars || '}'
        |   AS "meta.chars"
        |FROM documents WHERE doc_id < 4000 ORDER BY doc_id""".stripMargin,

    "misc_align_frames" ->
      """WITH f1 AS (SELECT o_orderkey, o_totalprice AS price1 FROM orders
        |            WHERE o_orderkey <= 3000),
        | f2 AS (SELECT o_orderkey, o_custkey AS cust2 FROM orders
        |        WHERE o_orderkey BETWEEN 2000 AND 5000),
        | f3 AS (SELECT o_orderkey, o_orderstatus AS status3 FROM orders
        |        WHERE o_orderkey BETWEEN 4500 AND 6000),
        | spine AS (SELECT o_orderkey FROM f1 UNION
        |           SELECT o_orderkey FROM f2 UNION
        |           SELECT o_orderkey FROM f3)
        |SELECT s.o_orderkey, f1.price1, f2.cust2, f3.status3
        |FROM spine s
        |LEFT JOIN f1 USING (o_orderkey)
        |LEFT JOIN f2 USING (o_orderkey)
        |LEFT JOIN f3 USING (o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "sim_int8_quantize" ->
      // NULLIF zero-vector guard mirrors int8Scale's null-scale path
      // (codes all-zero, scale8 null); reference norms precompute in `r`
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |q AS (SELECT vec_id, e,
        |  NULLIF(list_max(list_transform(e, x -> abs(x))), 0) / 127.0
        |    AS scale FROM v),
        |c AS (SELECT vec_id, e, scale,
        |  CASE WHEN scale IS NULL THEN list_transform(e, x -> 0.0)
        |       ELSE list_transform(e, x -> round(x / scale)) END AS q8
        |  FROM q),
        |r AS (SELECT q8 AS qref, sqrt(list_dot_product(q8, q8)) AS qrefn,
        |  e AS eref, sqrt(list_dot_product(e, e)) AS erefn
        |  FROM c WHERE vec_id = 0)
        |SELECT c.vec_id,
        | round(scale * 1e8) / 1e8 AS scale8,
        | q8[1]::INT AS code1,
        | list_dot_product(q8, q8)::BIGINT AS qnorm,
        | round(list_dot_product(q8, qref)
        |   / (sqrt(list_dot_product(q8, q8)) * qrefn) * 10000) / 10000 AS cos_q,
        | abs(list_dot_product(q8, qref)
        |   / (sqrt(list_dot_product(q8, q8)) * qrefn)
        |  - list_dot_product(e, eref)
        |   / (sqrt(list_dot_product(e, e)) * erefn)) <= 0.03 AS cos_close
        |FROM c CROSS JOIN r WHERE c.vec_id > 0
        |ORDER BY c.vec_id""".stripMargin,

    "io_parquet_rowgroups" ->
      """SELECT count(*) AS total_rows, 11::BIGINT AS min_cols,
        | 11::BIGINT AS max_cols, TRUE AS has_groups
        |FROM lineitem""".stripMargin,

    // the leaf schema is static for the lineitem table at every SF (the
    // sf1 replica preserves it), so the oracle pins it as literals — a
    // path-literal parquet_schema() call would not survive the driver's
    // table-view harness
    "io_parquet_schema" ->
      """SELECT * FROM (VALUES
        | ('l_discount', 'DOUBLE'), ('l_extendedprice', 'DOUBLE'),
        | ('l_linenumber', 'INT32'), ('l_linestatus', 'BYTE_ARRAY'),
        | ('l_orderkey', 'INT64'), ('l_partkey', 'INT64'),
        | ('l_quantity', 'DOUBLE'), ('l_returnflag', 'BYTE_ARRAY'),
        | ('l_shipdate', 'INT64'), ('l_suppkey', 'INT64'),
        | ('l_tax', 'DOUBLE')) t(name, physical_type)
        |ORDER BY name""".stripMargin,

    "arr_concat" ->
      """SELECT vec_id,
        | len(arr)::INT AS arr_w, arr[1] AS e1, arr[2] AS e2,
        | arr[3] AS e3, arr[4] AS e4
        |FROM (SELECT vec_id,
        |  -- the CASE wraps the whole concat: DuckDB's || treats a NULL
        |  -- list as empty, where Spark concat (and polars concat_arr)
        |  -- null the row
        |  CASE WHEN vec_id % 7 = 0 THEN NULL
        |       ELSE embedding[1:2]::DOUBLE[]
        |         || [label::DOUBLE, vec_id::DOUBLE] END AS arr
        |  FROM embeddings)
        |ORDER BY vec_id""".stripMargin,

    "sim_lsh_capped" -> {
      def dotSql(p: Int) =
        s"list_sum(list_transform(generate_series(1, len(e)), i -> e[i] * sin(i * $p)))"
      val bucket = Seq(7, 13, 29).zipWithIndex.map { case (p, idx) =>
        s"(CASE WHEN round(${dotSql(p)} * 1e6) >= 0 THEN ${1L << idx} ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         |b AS (SELECT vec_id, e, $bucket AS bucket FROM v),
         |keep AS (SELECT bucket FROM b GROUP BY bucket
         |         HAVING count(*) <= (SELECT count(*) // 8 FROM b)),
         |p AS (SELECT vec_id, e, bucket FROM b SEMI JOIN keep USING (bucket))
         |SELECT id_a, id_b, cosine FROM (
         | SELECT a.vec_id AS id_a, c.vec_id AS id_b,
         |  round(list_dot_product(a.e, c.e)
         |    / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(c.e, c.e)))
         |    * 10000) / 10000 AS cosine
         | FROM p a JOIN p c ON a.bucket = c.bucket AND a.vec_id < c.vec_id)
         |WHERE cosine >= 0.3 ORDER BY id_a, id_b""".stripMargin
    }
  )
}
