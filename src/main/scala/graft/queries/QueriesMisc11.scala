package graft.queries

import org.apache.spark.sql.functions._
import graft.ml.SemDedup
import graft.text.Ranking
import graft.{functions => gf}
import util._

/** Round-11 batch 4 — beyond-reference training-data curation ops:
  * SemDeDup semantic deduplication (Abbas et al. 2023), Okapi BM25
  * relevance scoring, and per-document TF-IDF top terms (the
  * inverted-index shape). */
object QueriesMisc11 {

  val queries: Map[String, Q] = Map(

    // polars inverse + hyperbolic trig (Expr.arccos/arcsin/arctan/cot/
    // degrees/radians/sinh/cosh/tanh/arcsinh/arccosh/arctanh — reference
    // dsl/function_expr/trigonometry.rs). Domains arranged from the
    // bounded l_discount/l_tax columns (acos/asin/atanh need |x| ≤ 1,
    // acosh needs x ≥ 1). DuckDB has no hyperbolics — the oracle uses
    // the exp/ln closed forms; at |x| ≤ 1.1 they agree with libm well
    // inside the round-8 envelope.
    "math_trig_full" -> ((s, d) =>
      t(s, d, "lineitem").filter(col("l_orderkey") <= 1000).select(
        col("l_orderkey"), col("l_linenumber"),
        round(acos(col("l_discount")), 8).as("acos_d"),
        round(asin(col("l_discount")), 8).as("asin_d"),
        round(atan(col("l_tax")), 8).as("atan_t"),
        round(cot(col("l_tax") + lit(0.01)), 8).as("cot_t"),
        round(degrees(col("l_discount")), 8).as("deg_d"),
        round(radians(col("l_quantity")), 8).as("rad_q"),
        round(sinh(col("l_discount")), 8).as("sinh_d"),
        round(cosh(col("l_discount")), 8).as("cosh_d"),
        round(tanh(col("l_tax")), 8).as("tanh_t"),
        round(asinh(col("l_discount")), 8).as("asinh_d"),
        round(acosh(col("l_quantity") + lit(1.0)), 8).as("acosh_q"),
        round(atanh(col("l_tax")), 8).as("atanh_t"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // polars bitwise_leading_ones / bitwise_trailing_ones — the ones
    // duals of the green math_bit_counts zeros key: leading/trailing
    // zeros of the complement (x = −1 yields 64). y goes negative, so
    // the sign-bit path is exercised on both duals.
    "math_bit_ones" -> ((s, d) =>
      t(s, d, "part").filter(col("p_partkey") <= 2000)
        .select(col("p_partkey"),
          col("p_partkey").cast("long").as("x"),
          (col("p_partkey").cast("long") - 1000L).as("y"))
        .select(col("p_partkey"),
          gf.bitLeadingOnes(col("x")).as("lead1_x"),
          gf.bitTrailingOnes(col("x")).as("trail1_x"),
          gf.bitLeadingOnes(col("y")).as("lead1_y"),
          gf.bitTrailingOnes(col("y")).as("trail1_y"))
        .orderBy(col("p_partkey"))),

    // Sketch-based decontamination (Dedup.contaminationHitsBloom — Spark's
    // native Bloom runtime-filter aggregate + inline might_contain probe,
    // no join): bench = every doc_id%31==0 document VERBATIM (still in
    // the corpus, so real 13-gram contamination exists and the exact hit
    // set is SQL-computable). The sketch's false-positive set is not
    // oracle-predictable, so the key pins the INVARIANTS that define a
    // Bloom filter: (1) the exact-contaminated doc count (vs the SQL
    // replica), (2) zero false negatives — every exact hit is flagged
    // with at least its exact hit count, (3) the false-positive overshoot
    // stays under 1% of the corpus (astronomically satisfied at this
    // sketch size; generous so the key never flakes).
    "text_decontaminate_bloom" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val bench = docs.filter(col("doc_id") % 31 === 0)
      val bloom = graft.text.Dedup.contaminationHitsBloom(
        docs, "doc_id", "text", bench, "text", w = 13)
        .select(col("doc_id"), col("n_hits").as("bloom_hits"))
      val exact = graft.text.Dedup.contaminationHits(
        docs, "doc_id", "text", bench, "text", w = 13)
        .select(col("doc_id"), col("n_hits").as("exact_hits"))
      // ONE full-outer join then one aggregate: the expensive corpus
      // shingle/probe pipelines each execute exactly once (the earlier
      // left-join + separate count re-ran `bloom` end to end)
      val joined = exact.join(bloom, Seq("doc_id"), "full")
      joined.agg(
          count(col("exact_hits")).as("n_exact_docs"),
          (count(when(col("exact_hits").isNotNull &&
            (col("bloom_hits").isNull ||
              col("bloom_hits") < col("exact_hits")), 1)) === 0)
            .as("no_false_neg"),
          count(col("bloom_hits")).as("__nb"))
        .crossJoin(broadcast(docs.select(count(lit(1)).as("__n"))))
        .select(col("n_exact_docs"), col("no_false_neg"),
          (col("__nb") <= col("n_exact_docs")
            + greatest(lit(1L), ceil(col("__n") * 0.01).cast("long")))
            .as("fp_bounded"))
    }),

    // polars write_ipc_stream / read_ipc_stream (io/ipc/functions.py
    // stream variants): the footer-less IPC STREAM framing through the
    // graft-ipc-stream DSv2 connector — one partition per file on read
    // (no block index to split on; the honest contract for a pipe
    // format), batch-streamed distributed write.
    "io_ipc_stream_roundtrip" -> ((s, d) => {
      val tmp = "/tmp/graft_io/ipcs_supplier"
      graft.sources.ArrowIpcStream.writeStream(t(s, d, "supplier"), tmp)
      s.read.format("graft-ipc-stream").load(tmp).orderBy(col("s_suppkey"))
    }),

    // polars rolling_median_by (Expr.rolling_median_by — the value-based
    // sibling of win_rolling_quantile's rows window and
    // win_rolling_by_value's sum/count/min): interpolated median over a
    // RANGE frame keyed on integer cents. Integer inputs make the
    // two-middle-element mean exact cross-engine.
    "win_rolling_median_by" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val cents = round(col("o_totalprice") * 100, 0).cast("long")
      val base = t(s, d, "orders").filter(col("o_custkey") <= 500)
        .select(col("o_orderkey"), col("o_custkey"), cents.as("cents"))
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("cents"))
        .rangeBetween(-5000000L, 0L)
      base.select(col("o_orderkey"), col("o_custkey"),
          round(expr("percentile(cents, 0.5)").over(w) * 100).cast("long")
            .as("roll_med_c"))
        .orderBy(col("o_orderkey"))
    }),

    // SemDeDup (arXiv:2303.09540): cluster on 8 fixed centroids (the
    // first 8 vectors, same convention as sim_ivf_topk), then remove
    // every vector dominated by a same-cluster semantic duplicate
    // (cosine ≥ 0.30 — lowered from the paper's 1−ε because the fixture
    // embeddings are near-random; at sf0.01 this removes 171 of 492, so
    // the dominance path is provably exercised). Keep-policy = the
    // paper's low-centroid-similarity exemplar, pairwise-dominance form
    // (ml/SemDedup). csim is integer-scaled to 6 decimals so assignment
    // and dominance are reproducible cross-engine.
    "sim_semdedup" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("e"))
      val centroids = emb.filter(col("vec_id") < 8)
        .collect()
        .map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toArray))
        .sortBy(_._1).toSeq
      SemDedup.semDedup(emb.filter(col("vec_id") >= 8), "vec_id", "e",
          centroids, threshold = 0.30)
        .orderBy(col("vec_id"))
    }),

    // Okapi BM25 for the literal query "hash join vector" (k1=1.2,
    // b=0.75, idf = ln(1 + (N−df+0.5)/(df+0.5))). The plan never
    // explodes or shuffles document rows: per-term tf is a codegen'd
    // array filter, and N/avgdl/df ride ONE broadcast one-row aggregate
    // (text/Ranking.bm25 — the 100 TB shape).
    "text_bm25" -> ((s, d) =>
      Ranking.bm25(t(s, d, "documents"), "doc_id", "text",
          Seq("hash", "join", "vector"))
        .orderBy(col("doc_id"))),

    // Efraimidis–Spirakis weighted sampling without replacement
    // (ops/Sampling.sampleWeighted): k=25 docs drawn
    // proportional-to-n_chars, deterministic via the md5 60-bit uniform.
    // The plan is a global TakeOrderedAndProject — no shuffle, no window.
    // The op ranks on (and emits) the integer-scaled selection key, so
    // the oracle pins the MATH, not just the chosen id set — and the
    // k-th-row boundary is libm-proof (see Sampling.sampleWeighted).
    "misc_sample_weighted" -> ((s, d) =>
      graft.ops.Sampling.sampleWeighted(
          t(s, d, "documents"), "doc_id", "n_chars", k = 25)
        .select(col("doc_id"), col("lang"), col("n_chars"), col("es_key"))
        .orderBy(col("doc_id"))),

    // Corpus-wide top-20 word trigrams by document frequency (distinct
    // docs containing the shingle — the corpus-stats signal dedup and
    // boilerplate detection read). One explode + one (shingle)-keyed
    // count agg + a global top-k: TakeOrderedAndProject, no full sort.
    // Ties pinned by shingle text ascending. Docs under 3 tokens are
    // excluded FIRST: Dedup.shingles' short-doc fallback emits the whole
    // doc as one pseudo-shingle, which would pollute a trigram stat
    // (crawl corpora are full of short/empty docs).
    "text_top_ngrams" -> ((s, d) =>
      t(s, d, "documents")
        .filter(size(graft.text.TextAnalysis.tokens(col("text"))) >= 3)
        .select(col("doc_id"),
          explode(array_distinct(graft.text.Dedup.shingles(col("text"), 3)))
            .as("ngram"))
        .groupBy(col("ngram")).agg(count(lit(1)).as("doc_freq"))
        .orderBy(col("doc_freq").desc, col("ngram").asc)
        .limit(20)),

    // Per-document top-3 TF-IDF terms over the full corpus vocabulary:
    // explode → (doc,term) tf shuffle → term-keyed df join → windowed
    // top-k, ties by term ascending on the ROUNDED score (deterministic
    // cross-engine). idf = ln(N/df).
    "text_tfidf_topk" -> ((s, d) =>
      Ranking.tfidfTopTerms(t(s, d, "documents").filter(col("doc_id") < 4000),
          "doc_id", "text", k = 3)
        .orderBy(col("doc_id"), col("rank")))
  )

  val oracle: Map[String, String] = Map(

    "math_trig_full" ->
      // DuckDB has no sinh/cosh/tanh/asinh/acosh/atanh — exp/ln closed
      // forms; all values O(1) so round-8 absorbs the ≤2-ulp difference
      """SELECT l_orderkey, l_linenumber,
        | round(acos(l_discount), 8) AS acos_d,
        | round(asin(l_discount), 8) AS asin_d,
        | round(atan(l_tax), 8) AS atan_t,
        | round(cot(l_tax + 0.01), 8) AS cot_t,
        | round(degrees(l_discount), 8) AS deg_d,
        | round(radians(l_quantity), 8) AS rad_q,
        | round((exp(l_discount) - exp(-l_discount)) / 2, 8) AS sinh_d,
        | round((exp(l_discount) + exp(-l_discount)) / 2, 8) AS cosh_d,
        | round((exp(l_tax) - exp(-l_tax))
        |       / (exp(l_tax) + exp(-l_tax)), 8) AS tanh_t,
        | round(ln(l_discount + sqrt(l_discount * l_discount + 1)), 8)
        |   AS asinh_d,
        | round(ln((l_quantity + 1.0)
        |       + sqrt((l_quantity + 1.0) * (l_quantity + 1.0) - 1)), 8)
        |   AS acosh_q,
        | round(0.5 * ln((1 + l_tax) / (1 - l_tax)), 8) AS atanh_t
        |FROM lineitem WHERE l_orderkey <= 1000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "math_bit_ones" ->
      """WITH t AS (
        | SELECT p_partkey, ~(p_partkey::BIGINT) AS nx,
        |        ~(p_partkey::BIGINT - 1000) AS ny
        | FROM part WHERE p_partkey <= 2000)
        |SELECT p_partkey,
        | (CASE WHEN nx = 0 THEN 64 ELSE 64 - length(bin(nx)) END)::INT
        |   AS lead1_x,
        | (CASE WHEN nx = 0 THEN 64 ELSE bit_count((nx & -nx) - 1) END)::INT
        |   AS trail1_x,
        | (CASE WHEN ny = 0 THEN 64 ELSE 64 - length(bin(ny)) END)::INT
        |   AS lead1_y,
        | (CASE WHEN ny = 0 THEN 64 ELSE bit_count((ny & -ny) - 1) END)::INT
        |   AS trail1_y
        |FROM t ORDER BY p_partkey""".stripMargin,

    "io_ipc_stream_roundtrip" ->
      "SELECT * FROM supplier ORDER BY s_suppkey",

    "text_decontaminate_bloom" ->
      // the booleans are the Bloom contract (no false negatives, bounded
      // overshoot) — constants on the oracle side by construction
      """WITH tok AS (
        | SELECT doc_id,
        |  list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |    x -> x <> '') AS toks
        | FROM documents),
        |b AS (SELECT DISTINCT array_to_string(toks[i:i+12], ' ') AS g
        | FROM tok, unnest(range(1, len(toks) - 11)) AS r(i)
        | WHERE doc_id % 31 = 0 AND len(toks) >= 13),
        |d AS (SELECT DISTINCT doc_id, array_to_string(toks[i:i+12], ' ') AS g
        | FROM tok, unnest(range(1, len(toks) - 11)) AS r(i)
        | WHERE len(toks) >= 13)
        |SELECT
        | (SELECT count(DISTINCT doc_id) FROM d JOIN b USING (g))
        |   AS n_exact_docs,
        | true AS no_false_neg,
        | true AS fp_bounded""".stripMargin,

    "win_rolling_median_by" ->
      // quantile_cont(0.5) shares percentile's pos = p·(n−1) definition;
      // ×100 integer scaling keeps the half-sum exact in both engines
      """WITH t AS (
        | SELECT o_orderkey, o_custkey,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        | FROM orders WHERE o_custkey <= 500)
        |SELECT o_orderkey, o_custkey,
        | CAST(round((quantile_cont(cents, 0.5) OVER
        |   (PARTITION BY o_custkey ORDER BY cents
        |    RANGE BETWEEN 5000000 PRECEDING AND CURRENT ROW)) * 100)
        |   AS BIGINT) AS roll_med_c
        |FROM t ORDER BY o_orderkey""".stripMargin,

    "sim_semdedup" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |cent AS (SELECT vec_id AS cid, e AS cvec FROM v WHERE vec_id < 8),
        |corp AS (SELECT vec_id, e FROM v WHERE vec_id >= 8),
        |scored AS (
        |  SELECT c.vec_id, c.e, cent.cid,
        |    round(list_dot_product(c.e, cent.cvec)
        |      / (sqrt(list_dot_product(c.e, c.e))
        |         * sqrt(list_dot_product(cent.cvec, cent.cvec))) * 1e6) / 1e6
        |      + 0.0 AS csim -- DuckDB round keeps IEEE -0.0; Spark never emits it
        |  FROM corp c CROSS JOIN cent),
        |asgn AS (
        |  SELECT vec_id, e, cid, csim FROM (
        |    SELECT *, row_number() OVER
        |      (PARTITION BY vec_id ORDER BY csim DESC, cid ASC) AS rn
        |    FROM scored) WHERE rn = 1)
        |SELECT a.vec_id, a.cid::INT AS cluster, a.csim
        |FROM asgn a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM asgn b
        |  WHERE b.cid = a.cid AND b.vec_id <> a.vec_id
        |    AND round(list_dot_product(a.e, b.e)
        |      / (sqrt(list_dot_product(a.e, a.e))
        |         * sqrt(list_dot_product(b.e, b.e))) * 1e4) / 1e4 >= 0.30
        |    AND (b.csim < a.csim
        |         OR (b.csim = a.csim AND b.vec_id < a.vec_id)))
        |ORDER BY a.vec_id""".stripMargin,

    "text_bm25" ->
      s"""WITH toks AS (
        |  SELECT doc_id, ${QueriesText.tokensSql} AS tk
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, len(tk) AS dl,
        |    len(list_filter(tk, x -> x = 'hash')) AS tf0,
        |    len(list_filter(tk, x -> x = 'join')) AS tf1,
        |    len(list_filter(tk, x -> x = 'vector')) AS tf2
        |  FROM toks),
        |st AS (
        |  SELECT count(*) AS n, avg(dl) AS avgdl,
        |    sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
        |    sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
        |    sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
        |  FROM tf)
        |SELECT doc_id, dl::INT AS dl,
        |  round((
        |    ln(1.0 + (n - df0 + 0.5) / (df0 + 0.5)) * tf0 * 2.2
        |      / (tf0 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
        |    + ln(1.0 + (n - df1 + 0.5) / (df1 + 0.5)) * tf1 * 2.2
        |      / (tf1 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
        |    + ln(1.0 + (n - df2 + 0.5) / (df2 + 0.5)) * tf2 * 2.2
        |      / (tf2 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))) * 1e4) / 1e4
        |    AS score
        |FROM tf CROSS JOIN st
        |ORDER BY doc_id""".stripMargin,

    "misc_sample_weighted" ->
      // + 0.0 normalizes DuckDB round's IEEE -0.0 BEFORE ranking, so the
      // ordering and the emitted value both match Spark's never--0.0 round
      """WITH t AS (
        | SELECT doc_id, lang, n_chars,
        |  round(ln(('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT
        |        / 1152921504606846976.0) / n_chars * 1e6) / 1e6 + 0.0
        |    AS es_key
        | FROM documents WHERE n_chars > 0),
        |top AS (SELECT * FROM t ORDER BY es_key DESC, doc_id LIMIT 25)
        |SELECT doc_id, lang, n_chars, es_key
        |FROM top ORDER BY doc_id""".stripMargin,

    "text_top_ngrams" ->
      s"""WITH sh AS (
         | SELECT doc_id, unnest(list_distinct(${QueriesText.shinglesSql(3)}))
         |   AS ngram
         | FROM documents
         | WHERE len(${QueriesText.tokensSql}) >= 3)
         |SELECT ngram, count(*) AS doc_freq
         |FROM sh GROUP BY 1
         |ORDER BY doc_freq DESC, ngram ASC LIMIT 20""".stripMargin,

    "text_tfidf_topk" ->
      s"""WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 4000),
        |pairs AS (
        |  SELECT doc_id, unnest(${QueriesText.tokensSql}) AS term
        |  FROM docs),
        |tf AS (SELECT doc_id, term, count(*) AS tfc
        |       FROM pairs GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS dfc FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS nd FROM docs),
        |scored AS (
        |  SELECT tf.doc_id, tf.term,
        |    round(tfc * ln(nd::DOUBLE / dfc) * 1e4) / 1e4 AS tfidf
        |  FROM tf JOIN df USING (term) CROSS JOIN n)
        |SELECT doc_id, term, tfidf, rank::INT AS rank FROM (
        |  SELECT *, row_number() OVER
        |    (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rank
        |  FROM scored)
        |WHERE rank <= 3
        |ORDER BY doc_id, rank""".stripMargin
  )
}
