package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A fastText-style linear quality classifier, trained ON the cluster:
  * logistic regression over hashed unigram-frequency features via
  * full-batch gradient descent. This is the "model-based quality filter"
  * stage of a pretraining pipeline (GPT-3/LLaMA filtered CommonCrawl
  * against a high-quality reference corpus with exactly this shape:
  * hashed bag-of-words features → linear classifier → per-doc score);
  * the reference engine has no training surface at all, so the op is
  * beyond-reference.
  *
  * Features per document: x_b = count(tokens hashing to bucket b) / n_tok
  * for b < `buckets` (md5-prefix hashing — the repo convention DuckDB
  * replays verbatim), plus a constant bias component. Training is
  * full-batch GD on the logistic loss:
  *
  *   w ← w − η · mean_docs[ (σ(w·x) − y) · x ]
  *
  * Execution shape (the 100 TB one, same family as [[Dsir]] /
  * [[graft.ml.KMeans]]): features are SPARSE — per row, each token is
  * hashed ONCE, the bucket ids are sorted, and the sorted runs are
  * RLE-compressed into (bucket, frequency) entries, all in one
  * O(n_tok·log n_tok) pass with no per-bucket rescan (a dense
  * per-bucket `filter` would be O(buckets·n_tok) md5 calls per row —
  * a ~32,000× CPU multiplier at a realistic 2^18-bucket hashed BoW).
  * The weight vector lives on the DRIVER and rides into each iteration's
  * plan as an array literal; one iteration = ONE corpus scan whose only
  * shuffle is the exploded (bucket, residual·x) pairs hashing to ≤ dim
  * gradient rows — documents never shuffle, zero-feature dimensions
  * contribute exact 0.0 and are reconstructed driver-side. At 100 TB the
  * caller caches/checkpoints the featurized frame so iterations don't
  * re-read parquet.
  *
  * Determinism contract (what lets the DuckDB oracle replay training):
  * weights snap to the 1e-6 grid after every update — the KMeans snap
  * discipline — so cross-engine float-sum jitter (~1e-13) in the gradient
  * means cannot compound across iterations.
  */
object QualityClassifier {

  private val Snap = 1e6

  /** Half-away-from-zero to the 1e-6 grid — SQL round() semantics on both
    * engines (math.rint would round half-to-even and diverge). */
  private def snap(v: Double): Double =
    math.signum(v) * math.floor(math.abs(v) * Snap + 0.5) / Snap

  /** Featurize: sparse token-frequency entries as one array column `__xs`
    * of struct<b: long, v: double> — bucket ids ascending, v = count/n_tok,
    * plus the constant bias entry (b = `buckets`, v = 1.0) so the bias
    * dimension rides every fold/explode untreated. One pass per row:
    * hash each token once, sort, RLE the run boundaries. Rows with no
    * tokens are dropped (no features to score). Emitted columns: the
    * originals + `n_tok` + `__xs`. */
  def featurize(docs: DataFrame, textCol: String, buckets: Int): DataFrame = {
    val base = docs
      .withColumn("n_tok", size(TextAnalysis.tokens(col(textCol))))
      .filter(col("n_tok") > 0)
    val sortedIds = array_sort(
      transform(TextAnalysis.tokens(col(textCol)),
        t => Dsir.bucketOf(t, buckets)))
    base.withColumn("__ids", sortedIds)
      .withColumn("__starts",
        // 1-based positions where a new bucket-id run begins; the
        // greatest() keeps the i-1 probe in bounds (ANSI element_at
        // throws on 0) — at i=1 the first disjunct already decides.
        filter(sequence(lit(1), col("n_tok")), i =>
          (i === 1) || (element_at(col("__ids"), i) =!=
            element_at(col("__ids"), greatest(i - 1, lit(1))))))
      .withColumn("__xs",
        concat(
          zip_with(
            col("__starts"),
            // each run ends where the next begins; the last at n_tok+1
            concat(slice(col("__starts"), lit(2),
                greatest(size(col("__starts")) - 1, lit(0))),
              array(col("n_tok") + 1)),
            (s, e) => struct(
              element_at(col("__ids"), s).as("b"),
              ((e - s).cast("double") / col("n_tok").cast("double"))
                .as("v"))),
          array(struct(lit(buckets.toLong).as("b"), lit(1.0).as("v")))))
      .drop("__ids", "__starts")
  }

  /** w·x over the sparse entries: one fold, O(nnz) array-literal lookups. */
  private def sparseDot(xs: Column, w: Array[Double]): Column = {
    val wCol = array(w.map(lit): _*)
    aggregate(xs, lit(0.0),
      (acc, e) => acc + e("v") * element_at(wCol, e("b").cast("int") + 1))
  }

  /** `iters` GD steps from w = 0; returns (weights, scored frame with
    * `margin` = w·x and `score` = σ(margin)). `label` must be 0/1. */
  def train(docs: DataFrame, textCol: String, label: Column,
            buckets: Int = 8, iters: Int = 3, lr: Double = 1.0)
      : (Array[Double], DataFrame) = {
    require(buckets > 0 && iters >= 0, "qualityClassifier: bad hyperparams")
    // Persist the featurized frame: iterations must read MATERIALIZED
    // entries, not re-inline the featurize expression tree — projection
    // collapse would otherwise duplicate the HOF subtrees (which Spark
    // evaluates interpreted, outside codegen CSE) into every iteration's
    // residual + explode, recomputing tokens/md5/sort many times per row
    // (measured 364 s → 11 s at sf0.1). This is also the 100 TB shape:
    // GD iterations never re-read parquet.
    val f = featurize(docs, textCol, buckets).withColumn("__y",
      label.cast("int").cast("double"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dim = buckets + 1
    var w = new Array[Double](dim)
    for (_ <- 1 to iters) {
      val p = lit(1.0) / (lit(1.0) + exp(-sparseDot(col("__xs"), w)))
      // ONE corpus scan: residuals explode to (bucket, r·v) pairs and
      // hash-aggregate to ≤ dim rows. g_b = Σ r·x_b / N — docs where
      // x_b = 0 contribute exact 0.0 to the dense mean, so the sparse
      // sum divided by the total doc count (read off the always-present
      // bias bucket, v = 1.0 ⇒ count) is the same gradient.
      val g = f.select((p - col("__y")).as("__r"), col("__xs"))
        .select(col("__r"), explode(col("__xs")).as("__e"))
        .groupBy(col("__e")("b").as("b"))
        .agg(sum(col("__r") * col("__e")("v")).as("s"),
          count(lit(1)).as("c"))
        .collect()
      val n = g.find(_.getLong(0) == buckets.toLong)
        .map(_.getLong(2)).getOrElse(0L)
      require(n > 0, "qualityClassifier: no rows to train on")
      val sums = new Array[Double](dim)
      g.foreach(r => sums(r.getLong(0).toInt) = r.getDouble(1))
      w = Array.tabulate(dim)(i => snap(w(i) - lr * sums(i) / n))
    }
    val margin = sparseDot(col("__xs"), w)
    val scored = f.withColumn("margin", margin)
      .withColumn("score", lit(1.0) / (lit(1.0) + exp(-margin)))
      .drop("__xs", "__y")
    // Release the iteration cache now that the weights are final: disk-backed
    // persisted blocks are NOT LRU-evicted, so leaving this pinned would leak
    // cached blocks for the session lifetime (one leak per train() call).
    // Non-blocking: the scored frame recomputes the sparse one-pass featurize
    // once when the caller materializes it — a single cheap scan, vs the
    // iteration loop which is the path that genuinely needed the cache.
    f.unpersist(blocking = false)
    (w, scored)
  }
}
