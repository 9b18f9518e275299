package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling without RNG state and without windows.
  *
  * Mirrors the reference's seeded sampling surface
  * (`crates/polars-ops/src/chunked_array/random.rs`) with the recipe a
  * distributed engine actually wants: a content hash compared against a
  * threshold is reproducible across runs, engines, partitionings and
  * retries — no RNG state to synchronize, no `Window.partitionBy(stratum)`
  * that pins a dominant stratum (half a real corpus is "en") on one task.
  */
object Sampling {

  /** Uniform-in-[0,1) deterministic hash of `id`: the first 15 hex chars of
    * md5 (60 bits — exactly representable in a double) over 16^15. */
  def hashUniform(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long") /
      lit(1152921504606846976.0) // 16^15 = 2^60, exact as a double

  /** Stratified deterministic sampling, scale form: keep rows whose
    * [[hashUniform]] falls under a per-stratum cutoff
    * `ceil(n_s * frac) / n_s` — expected sample size matches the exact
    * rank form's `ceil(n_s * frac)` and every stratum (however small) has a
    * positive cutoff. One metadata-scale count aggregate, a broadcast join
    * of the per-stratum cutoffs, and a filter: the data is touched in a
    * single pass with NO window, so a dominant stratum costs nothing extra.
    *
    * The exact-per-stratum-size rank form (row_number over the stratum) is
    * the small-data cross-check (`misc_sample_stratified`); this is what to
    * run at corpus scale. */
  def sampleStratified(df: DataFrame, strata: Seq[String], idCol: String,
                       frac: Double): DataFrame = {
    require(frac > 0 && frac <= 1, s"frac must be in (0, 1], got $frac")
    val cuts = df.groupBy(strata.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      // ceil yields an exact integer, so the double division below is
      // bit-identical across engines (the oracle replays it in SQL)
      .withColumn("__cut", ceil(col("__n") * frac).cast("double") / col("__n"))
      .drop("__n")
    // the session seed (graft.Meta.setRandomSeed, polars set_random_seed)
    // folds into the hash input: a new seed draws a different — still
    // fully deterministic — sample, with no seed set the id hashes bare
    // (the oracle keys run seedless and replay the bare form in SQL)
    val id = graft.Meta.saltedId(df.sparkSession, col(idCol))
    df.join(broadcast(cuts), strata)
      .filter(hashUniform(id) < col("__cut"))
      .drop("__cut")
  }

  /** Efraimidis–Spirakis (2006) weighted sampling without replacement,
    * deterministic form: each row draws u = [[hashUniform]](id) and the
    * sample is the k rows maximizing u^(1/w) — implemented as the
    * monotone-equivalent key ln(u)/w (u < 1 so ln u < 0; a larger weight
    * divides the negative toward 0). Inclusion probability is
    * proportional-to-weight without replacement, the standard recipe for
    * quality-weighted corpus subsampling.
    *
    * Scale shape: one pass to compute keys (codegen'd md5 + ln), then a
    * global top-k — Spark plans TakeOrderedAndProject (per-partition
    * heaps, one k-row driver merge), so there is NO shuffle of the
    * corpus and NO window. Non-positive weights are excluded (their
    * formal key is -inf).
    *
    * The selection key is exposed as an `es_key` output column, and the
    * top-k ranks on its integer-scaled-to-1e-6 form (ties to the smaller
    * id): `ln` is only 1-ulp-accurate and differs between libm
    * implementations, so ranking raw keys could pick different k-th rows
    * on different engines — snapping the boundary keeps the SELECTION
    * bit-reproducible everywhere, the same discipline as
    * [[sampleStratified]]'s exact cutoffs. */
  def sampleWeighted(df: DataFrame, idCol: String, weightCol: String,
                     k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val id = graft.Meta.saltedId(df.sparkSession, col(idCol))
    df.filter(col(weightCol) > 0)
      .withColumn("es_key",
        round(log(hashUniform(id)) / col(weightCol).cast("double") * 1e6) / 1e6)
      .orderBy(col("es_key").desc, col(idCol).asc)
      .limit(k)
  }

  /** [[sampleWeighted]] for LOG-scale weights (the Gumbel-top-k form):
    * ranks descending on `logw − ln(−ln u)`, which selects the same set
    * as ES with w = exp(logw) — maximizing u^(1/w) ⟺ maximizing
    * ln(u)·e^(−logw) ⟺ minimizing ln(−ln u) − logw — but never
    * exponentiates the log-weight, so it cannot overflow (logw ≥ ~16
    * would collapse exp-form keys to round-to-0.0 ties) or underflow
    * (logw < −745 would zero the weight and silently drop the row).
    * This is the right entry point for DSIR-style log importance
    * weights. Same determinism contract: integer-scaled key, ties to
    * the smaller id, one global TakeOrderedAndProject. */
  def sampleWeightedLog(df: DataFrame, idCol: String, logWeightCol: String,
                        k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val id = graft.Meta.saltedId(df.sparkSession, col(idCol))
    df.filter(col(logWeightCol).isNotNull)
      .withColumn("es_key",
        round((col(logWeightCol).cast("double") -
          log(-log(hashUniform(id)))) * 1e6) / 1e6)
      .orderBy(col("es_key").desc, col(idCol).asc)
      .limit(k)
  }
}
