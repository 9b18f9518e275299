package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.dotProduct

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
  * [[graft.ml.KMeans]]): the weight vector lives on the DRIVER and rides
  * into each iteration's plan as literals; one iteration = ONE corpus
  * scan producing a single (buckets+1)-column mean row via partial
  * aggregation — document rows never shuffle, nothing but that one tiny
  * row ever leaves the executors. At 100 TB the caller caches/checkpoints
  * the featurized frame so iterations don't re-read parquet.
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

  /** Featurize: token-frequency buckets + bias as one array column
    * `__x`; rows with no tokens are dropped (no features to score).
    * Emitted columns: the originals + `n_tok` + `__x`. */
  def featurize(docs: DataFrame, textCol: String, buckets: Int): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val nTok = size(toks)
    val xs = transform(sequence(lit(0), lit(buckets - 1)), b =>
      size(filter(toks, t =>
        Dsir.bucketOf(t, buckets) === b.cast("long"))).cast("double") /
        nTok.cast("double"))
    docs.withColumn("n_tok", nTok)
      .filter(col("n_tok") > 0)
      .withColumn("__x", concat(xs, array(lit(1.0))))
  }

  /** `iters` GD steps from w = 0; returns (weights, scored frame with
    * `margin` = w·x and `score` = σ(margin)). `label` must be 0/1. */
  def train(docs: DataFrame, textCol: String, label: Column,
            buckets: Int = 8, iters: Int = 3, lr: Double = 1.0)
      : (Array[Double], DataFrame) = {
    require(buckets > 0 && iters >= 0, "qualityClassifier: bad hyperparams")
    val f = featurize(docs, textCol, buckets).withColumn("__y",
      label.cast("int").cast("double"))
    val dim = buckets + 1
    var w = new Array[Double](dim)
    for (_ <- 1 to iters) {
      val wCol = array(w.map(lit): _*)
      val p = lit(1.0) / (lit(1.0) + exp(-dotProduct(col("__x"), wCol)))
      val g = (0 until dim).map(i =>
        avg((p - col("__y")) * element_at(col("__x"), i + 1)).as(s"g$i"))
      val row = f.agg(g.head, g.tail: _*).head() // ONE row: the gradient
      w = Array.tabulate(dim)(i => snap(w(i) - lr * row.getDouble(i)))
    }
    val wCol = array(w.map(lit): _*)
    val margin = dotProduct(col("__x"), wCol)
    (w, f.withColumn("margin", margin)
      .withColumn("score", lit(1.0) / (lit(1.0) + exp(-margin)))
      .drop("__x", "__y"))
  }
}
