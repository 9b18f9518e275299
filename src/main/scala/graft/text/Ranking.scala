package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus ranking / relevance scoring for training-data pipelines:
  * Okapi BM25 against a literal query, and per-document TF-IDF top
  * terms (the inverted-index shape). Both are pure Column compositions
  * (codegen'd, no UDFs) sharing [[TextAnalysis]]'s whitespace token
  * convention (lowercase, trim, split on \s+, drop empties).
  *
  * Scale posture — the two ops deliberately take different plans:
  *
  *  - [[bm25]] never explodes the corpus. The query term set is a small
  *    literal, so per-term tf is a per-row codegen'd array filter
  *    (one column per term), and the corpus-level statistics the score
  *    needs — N, avgdl, and each term's document frequency — are ONE
  *    one-row aggregate, broadcast back with a crossJoin. Total cost:
  *    two passes over the text column (one for the stats row, one for
  *    scoring), zero shuffles of document rows. At 100 TB that is the
  *    plan you want: the only exchange carries a single row.
  *
  *  - [[tfidfTopTerms]] scores the WHOLE vocabulary, so it explodes to
  *    (doc, term) pairs, aggregates term frequencies (one shuffle on
  *    (doc, term)), joins per-term document frequencies (term-keyed,
  *    vocabulary-sized — small relative to the corpus, shuffle-bounded),
  *    and takes per-doc top-k with a window. This is the standard
  *    inverted-index build written as relational ops; each shuffle key
  *    is bounded by token count, never by pairs.
  */
object Ranking {

  private def tokens(text: Column): Column = TextAnalysis.tokens(text)

  /** Okapi BM25 scores for a literal query (k1/b per Robertson et al.;
    * idf = ln(1 + (N − df + 0.5)/(df + 0.5)), the standard
    * non-negative form). Emits (id, dl, score) with score
    * integer-scaled-rounded to 4 decimals for cross-engine stability.
    * Documents matching no query term score 0 (kept — filter upstream
    * if only hits are wanted). */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25: empty query")
    val toks = tokens(col(textCol))
    def tf(term: String): Column =
      size(filter(toks, t => t === lit(term)))
    val withTf = docs.select(
      col(idCol) +: size(toks).as("dl") +:
        queryTerms.zipWithIndex.map { case (t, i) => tf(t).as(s"__tf$i") }: _*)
    // One one-row stats aggregate: N, avgdl, df per query term.
    val stats = withTf.agg(
      count(lit(1)).as("__n"),
      avg(col("dl")).as("__avgdl") +:
        queryTerms.indices.map(i =>
          sum((col(s"__tf$i") > 0).cast("long")).as(s"__df$i")): _*)
    val scored = withTf.crossJoin(broadcast(stats))
    val score = queryTerms.indices.map { i =>
      val tfc = col(s"__tf$i").cast("double")
      val idf = log(lit(1.0) +
        (col("__n").cast("double") - col(s"__df$i") + lit(0.5)) /
          (col(s"__df$i") + lit(0.5)))
      idf * tfc * (lit(k1) + 1.0) /
        (tfc + lit(k1) * (lit(1.0) - lit(b) +
          lit(b) * col("dl").cast("double") / col("__avgdl")))
    }.reduce(_ + _)
    scored.select(col(idCol), col("dl"),
      (round(score * 1e4) / 1e4).as("score"))
  }

  /** Per-document top-k terms by TF-IDF (tf = term count in doc,
    * idf = ln(N / df), the classic smooth-free form — df ≥ 1 for any
    * emitted term so it is total). Ties order by term ascending.
    * Emits (id, term, tfidf, rank). */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int, minTermLen: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = docs.select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .filter(length(col("term")) >= minTermLen)
    val tf = pairs.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("__tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("__df"))
    val n = docs.select(count(lit(1)).as("__n"))
    val scored = tf.join(df, Seq("term")).crossJoin(broadcast(n))
      .select(col(idCol), col("term"),
        (round(col("__tf").cast("double") *
          log(col("__n").cast("double") / col("__df").cast("double")) * 1e4)
          / 1e4).as("tfidf"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Per-document mean negative log-likelihood under the corpus's OWN
    * add-alpha-smoothed unigram LM — the cheap stand-in for the KenLM
    * perplexity filter every pretraining pipeline runs (CCNet et al.):
    * boilerplate/repetitive docs score low, lexically odd docs score
    * high, and both tails get dropped by the caller's band filter.
    *
    * Plan: explode to (doc, term); the unigram table is the term-keyed
    * count aggregate (vocabulary-sized — bounded far below corpus size);
    * scoring joins the token stream back to the table ON THE SAME term
    * key (Catalyst reuses the exchange: both the aggregate and the join
    * shuffle hash on `__term`), then one doc-keyed aggregate. Two
    * bounded shuffles, no window, no driver state. Totals (token count,
    * vocab size) ride one broadcast one-row aggregate.
    *
    * Emits docs + `n_tok` + raw `nll` (mean over token instances of
    * −ln p; null for token-free docs — callers band-filter, so a
    * sentinel would poison the band edge). */
  def unigramNll(docs: DataFrame, idCol: String, textCol: String,
                 alpha: Double = 1.0): DataFrame = {
    val ex = docs.select(col(idCol), explode(tokens(col(textCol))).as("__term"))
    val vocab = ex.groupBy(col("__term")).agg(count(lit(1)).as("__c"))
    val stats = vocab.agg(sum(col("__c")).as("__tot"), count(lit(1)).as("__v"))
    val scored = ex.join(vocab, Seq("__term"))
      .crossJoin(broadcast(stats))
      .withColumn("__nll",
        -log((col("__c") + lit(alpha)) /
          (col("__tot") + lit(alpha) * col("__v"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tok"), avg(col("__nll")).as("nll"))
    docs.join(scored, Seq(idCol), "left")
      .withColumn("n_tok", coalesce(col("n_tok"), lit(0L)))
  }
}
