package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection via importance resampling (Xie et al. 2023,
  * arXiv:2302.03169): score every raw document by how much more likely its
  * hashed bag-of-unigrams is under a TARGET distribution (e.g. "looks like
  * the high-quality subset") than under the RAW corpus distribution, then
  * resample proportional to the importance weight. This is the standard
  * pretraining-corpus selection step between dedup and packing.
  *
  * Feature space: unigrams hashed into `buckets` buckets via the repo's
  * md5-prefix convention (first 8 hex digits as an integer — identical in
  * DuckDB, so the whole computation is oracle-replayable). Per-bucket
  * probabilities are add-alpha smoothed; a document's log-weight is
  *
  *   sum over tokens t of [ ln p_target(bucket(t)) − ln p_raw(bucket(t)) ]
  *
  * Execution shape (the 100 TB one): the bucket table is ONE aggregate of
  * the exploded token stream down to ≤`buckets` rows (map-side partial
  * aggregation collapses each partition to ≤`buckets` rows before the
  * shuffle), folded to a single map-typed row and broadcast back with a
  * crossJoin. Scoring is then a per-row codegen'd `aggregate` fold over
  * the token array against that map — document rows are NEVER shuffled
  * and never joined; the only exchange in the plan carries ≤`buckets`
  * rows. (Same stats-ride-one-tiny-row shape as [[Ranking.bm25]].)
  *
  * Resampling composes with [[graft.ops.Sampling.sampleWeightedLog]]
  * (Efraimidis–Spirakis in the Gumbel-top-k log form — rank on
  * logw − ln(−ln u), never exponentiating the log-weight) — the paper's
  * sampled-without-replacement step — so it is not duplicated here;
  * the `text_dsir_resample` key pins the composition end to end.
  */
object Dsir {

  /** Hashed feature bucket of a term: md5-prefix integer mod `buckets`
    * (non-negative — the prefix is 32 bits, so no pmod needed).
    * DuckDB twin: `('0x' || substr(md5(t), 1, 8))::BIGINT % buckets`. */
  def bucketOf(term: Column, buckets: Int): Column =
    conv(substring(md5(term), 1, 8), 16, 10).cast("long") % buckets

  /** Adds `n_tok` and `dsir_logw` to `docs`. `isTarget` marks the rows
    * whose token distribution defines the target; the raw distribution is
    * the whole frame (target ⊆ raw, per the paper's setup where the target
    * sample is drawn from the corpus being filtered). */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        isTarget: Column, buckets: Int = 64,
                        alpha: Double = 1.0): DataFrame = {
    require(buckets > 0, "dsir: buckets must be positive")
    val toks = TextAnalysis.tokens(col(textCol))
    val pairs = docs.select(isTarget.cast("long").as("__t"),
      explode(toks).as("__term"))
    val table = pairs
      .groupBy(bucketOf(col("__term"), buckets).as("__b"))
      .agg(count(lit(1)).as("__raw"), sum(col("__t")).as("__tgt"))
    // One row: totals + the per-bucket count map (≤`buckets` entries).
    val one = table.agg(
      sum(col("__raw")).as("__rtot"), sum(col("__tgt")).as("__ttot"),
      map_from_entries(collect_list(
        struct(col("__b"), struct(col("__raw"), col("__tgt"))))).as("__m"))

    val aB = alpha * buckets
    def logRatio(b: Column): Column = {
      val e = element_at(col("__m"), b) // null only for never-seen buckets
      val rawB = coalesce(e.getField("__raw"), lit(0L)).cast("double")
      val tgtB = coalesce(e.getField("__tgt"), lit(0L)).cast("double")
      log((tgtB + alpha) / (col("__ttot").cast("double") + aB)) -
        log((rawB + alpha) / (col("__rtot").cast("double") + aB))
    }
    docs.crossJoin(broadcast(one))
      .withColumn("n_tok", size(toks))
      .withColumn("dsir_logw",
        aggregate(toks, lit(0.0), (acc, t) => acc + logRatio(bucketOf(t, buckets))))
      .drop("__m", "__rtot", "__ttot")
  }
}
