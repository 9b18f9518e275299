package graft.queries

import org.apache.spark.sql.functions._
import graft.ml.KMeans
import graft.text.{Dsir, Ranking}
import util._

/** Round-11 batch 5 — the remaining training-data curation flagships:
  * distributed k-means training (the IVF coarse-quantizer trainer),
  * DSIR importance weights (Xie et al. 2023), and unigram-LM negative
  * log-likelihood scoring (the KenLM-perplexity-filter stand-in). */
object QueriesMisc12 {

  /** The first-k seed-centroid convention shared by the kmeans/IVF keys
    * (and SemDedup): collect k driver-side (cid, vector) pairs. */
  private[queries] def seedCentroids(
      emb: org.apache.spark.sql.DataFrame, k: Int): Seq[(Int, Array[Double])] =
    emb.filter(col("vec_id") < k)
      .collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toArray))
      .sortBy(_._1).toSeq

  /** One replayed Lloyd round as oracle CTEs (v → c0 → a1 → m1 → c1):
    * the assignment argmin orders on round(dist²·1e6) with ties to the
    * smaller cid, means snap to the 1e-6 grid, and — mirroring
    * `KMeans.recompute`'s empty-cell policy — a cluster that lost all
    * members keeps its SEED centroid (the LEFT JOIN coalesce; a
    * mean-only c1 would silently drop it and diverge from the engine
    * whenever two seed vectors coincide). Shared by sim_kmeans_train
    * and sim_ivf_trained so the snap discipline cannot drift. */
  private[queries] val kmeansReplayCtes: String =
    """v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      |c0 AS (SELECT vec_id::INT AS cid, e AS cvec FROM v WHERE vec_id < 4),
      |a1 AS (
      |  SELECT vec_id, e, cid FROM (
      |    SELECT v.vec_id, v.e, c.cid,
      |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
      |        round((list_dot_product(v.e, v.e)
      |               - 2 * list_dot_product(v.e, c.cvec)
      |               + list_dot_product(c.cvec, c.cvec)) * 1e6) ASC,
      |        c.cid ASC) AS rn
      |    FROM v CROSS JOIN c0 c) WHERE rn = 1),
      |m1 AS (
      |  SELECT cid, pos, round(avg(e[pos]) * 1e6) / 1e6 AS m
      |  FROM a1 CROSS JOIN range(1, 65) AS r(pos)
      |  GROUP BY cid, pos),
      |c1 AS (
      |  SELECT c0.cid, coalesce(mm.mvec, c0.cvec) AS cvec
      |  FROM c0 LEFT JOIN
      |    (SELECT cid, list(m ORDER BY pos) AS mvec FROM m1 GROUP BY cid) mm
      |    ON mm.cid = c0.cid)""".stripMargin

  /** The DSIR weight replay as oracle CTEs (tok → pairs → tab → tot →
    * lr → ex → ws): 64 md5-hashed unigram buckets, add-1 smoothing,
    * per-doc log-ratio sums. Shared by text_dsir_weights and the
    * end-to-end resample key so the bucket/smoothing math cannot
    * drift between them. */
  private[queries] val dsirCtes: String =
    s"""tok AS (
      |  SELECT doc_id, lang, ${QueriesText.tokensSql} AS tk FROM documents),
      |pairs AS (
      |  SELECT (lang = 'en')::INT AS t,
      |    ('0x' || substr(md5(u.term), 1, 8))::BIGINT % 64 AS b
      |  FROM tok, unnest(tk) AS u(term)),
      |tab AS (SELECT b, count(*) AS rawc, sum(t) AS tgtc
      |        FROM pairs GROUP BY b),
      |tot AS (SELECT sum(rawc) AS rtot, sum(tgtc) AS ttot FROM tab),
      |lr AS (SELECT b,
      |         ln((tgtc + 1.0) / (ttot + 64.0))
      |           - ln((rawc + 1.0) / (rtot + 64.0)) AS v
      |       FROM tab CROSS JOIN tot),
      |ex AS (SELECT doc_id,
      |         ('0x' || substr(md5(u.term), 1, 8))::BIGINT % 64 AS b
      |       FROM tok, unnest(tk) AS u(term)),
      |ws AS (SELECT doc_id, sum(v) AS w
      |       FROM ex JOIN lr USING (b) GROUP BY doc_id)""".stripMargin

  val queries: Map[String, Q] = Map(

    // Distributed Lloyd's k-means (ml/KMeans): k=4 centroids seeded from
    // the first four vectors (the sim_ivf_topk convention), ONE
    // assign+recompute round, final assignment under the recomputed
    // centroids. Per-iteration cost is a codegen'd per-row argmin plus a
    // k·dim-row aggregate — document rows never shuffle. The oracle
    // replays training exactly: the argmin orders on round(dist²·1e6)
    // with ties to the smaller cid, and recomputed centroid coordinates
    // snap to the same 1e-6 grid before reuse, so cross-engine float
    // jitter (~1e-13) cannot flip an assignment.
    "sim_kmeans_train" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("e"))
      val (_, asgn) =
        KMeans.train(emb, "vec_id", "e", seedCentroids(emb, 4), iters = 1)
      asgn.select(col("vec_id"), col("cluster"),
          (round(col("__d2") * 1e4) / 1e4).as("d2"))
        .orderBy(col("vec_id"))
    }),

    // DSIR importance weights (text/Dsir, arXiv:2302.03169): target =
    // English docs, raw = whole corpus, 64 md5-hashed unigram buckets,
    // add-1 smoothing. The ONLY exchange in the plan carries ≤64 rows
    // (the bucket table, folded to a one-row map and broadcast); scoring
    // is a per-row codegen'd fold over the token array. English docs
    // weigh positive, others negative — the sign split is the semantic
    // check, the 1e-6-scaled value pins the math.
    "text_dsir_weights" -> ((s, d) =>
      Dsir.importanceWeights(t(s, d, "documents"), "doc_id", "text",
          isTarget = col("lang") === "en", buckets = 64)
        .select(col("doc_id"), col("lang"), col("n_tok"),
          (round(col("dsir_logw") * 1e6) / 1e6).as("logw"))
        .orderBy(col("doc_id"))),

    // Unigram-LM mean negative log-likelihood (text/Ranking.unigramNll):
    // the corpus's own add-1-smoothed unigram model, scored per doc —
    // the cheap perplexity-filter stand-in. Two bounded shuffles (term
    // table + doc re-aggregate), exchange-reused on the term key.
    "text_unigram_ppl" -> ((s, d) =>
      Ranking.unigramNll(t(s, d, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("lang"), col("n_tok"),
          (round(col("nll") * 1e6) / 1e6).as("nll"))
        .orderBy(col("doc_id")))
  )

  val oracle: Map[String, String] = Map(

    "sim_kmeans_train" ->
      // replayed training (shared CTEs): a1 = assignment under the seed
      // centroids, c1 = snapped member means (seed kept for empty
      // cells), final = assignment under c1.
      s"""WITH $kmeansReplayCtes,
        |s2 AS (
        |  SELECT v.vec_id, c.cid,
        |    list_dot_product(v.e, v.e) - 2 * list_dot_product(v.e, c.cvec)
        |      + list_dot_product(c.cvec, c.cvec) AS d2
        |  FROM v CROSS JOIN c1 c),
        |a2 AS (
        |  SELECT vec_id, cid, d2 FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY
        |      round(d2 * 1e6) ASC, cid ASC) AS rn
        |    FROM s2) WHERE rn = 1)
        |SELECT vec_id, cid AS cluster, round(d2 * 1e4) / 1e4 + 0.0 AS d2
        |FROM a2 ORDER BY vec_id""".stripMargin,

    "text_dsir_weights" ->
      s"""WITH $dsirCtes
        |SELECT t.doc_id, t.lang, len(t.tk)::INT AS n_tok,
        |  CASE WHEN t.tk IS NULL THEN NULL
        |    ELSE round(coalesce(ws.w, 0.0) * 1e6) / 1e6 + 0.0 END AS logw
        |FROM tok t LEFT JOIN ws USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin,

    "text_unigram_ppl" ->
      s"""WITH tok AS (
        |  SELECT doc_id, lang, ${QueriesText.tokensSql} AS tk FROM documents),
        |ex AS (SELECT doc_id, u.term FROM tok, unnest(tk) AS u(term)),
        |vocab AS (SELECT term, count(*) AS c FROM ex GROUP BY term),
        |st AS (SELECT sum(c) AS tot, count(*) AS v FROM vocab),
        |sc AS (
        |  SELECT e.doc_id, count(*) AS n_tok,
        |    avg(-ln((vocab.c + 1.0) / (st.tot + 1.0 * st.v))) AS nll
        |  FROM ex e JOIN vocab USING (term) CROSS JOIN st
        |  GROUP BY e.doc_id)
        |SELECT t.doc_id, t.lang, coalesce(sc.n_tok, 0) AS n_tok,
        |  round(sc.nll * 1e6) / 1e6 + 0.0 AS nll
        |FROM tok t LEFT JOIN sc USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin
  )
}
