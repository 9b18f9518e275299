package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.dotProduct

/** Distributed Lloyd's k-means over an embedding column (`Array[Double]`) —
  * the trainer for [[Similarity.ivfTopK]]'s centroid set (FAISS-IVF trains
  * its coarse quantizer exactly this way; reference analogue: polars users
  * run this step outside the engine, so this is a beyond-reference op).
  *
  * Execution shape (the Spark-MLlib shape, which is the right 100 TB one):
  * centroids are k×dim doubles — they live on the DRIVER between
  * iterations and ride into the plan as broadcast literals. Each iteration
  * is then
  *
  *   1. assignment: a per-row codegen'd argmin over the centroid literal
  *      array (no join, no shuffle — the same `transform` + `array_min`
  *      shape as [[Similarity.assignToCentroid]], but squared-L2), and
  *   2. recomputation: `posexplode` the members' vectors and aggregate
  *      `avg` by (cluster, position) — ONE shuffle whose key space is
  *      k·dim rows (k=4, dim=64 → 256 rows), collected back to the driver.
  *
  * Nothing but the k·dim aggregate ever leaves the executors, so the cost
  * per iteration is one scan + one tiny shuffle regardless of corpus size.
  * At 100 TB the caller should `.cache()` the projected (id, vec) frame so
  * iterations don't re-read parquet; the trainer itself stays
  * persistence-agnostic (2-3 scans at fixture scale are cheaper than
  * polluting the CacheManager under the bench harness).
  *
  * Determinism contract (what lets a DuckDB oracle replay training): the
  * assignment argmin orders on `round(dist² · 1e6)` with ties to the
  * smaller centroid id, and recomputed centroid coordinates are snapped to
  * the same 1e-6 grid before they become next-iteration literals — so
  * cross-engine (and run-to-run partial-aggregation-order) float jitter of
  * ~1e-13 cannot flip an assignment unless a point is genuinely
  * equidistant at the grid resolution.
  */
object KMeans {

  private val Snap = 1e6

  /** (snapped dist², cid, raw dist²) per centroid; `array_min` picks the
    * nearest (struct comparison is field-lexicographic, cid breaks ties —
    * raw is never reached because cids are distinct). */
  private[ml] def scoredL2(vec: Column, vn2: Column,
                       centroids: Seq[(Int, Array[Double])]): Column = {
    val cents = array(centroids.map { case (id, v) =>
      struct(lit(id).as("cid"), array(v.map(lit): _*).as("cvec"))
    }: _*)
    transform(cents, c => {
      val cvec = c.getField("cvec")
      val d2 = vn2 - lit(2.0) * dotProduct(vec, cvec) + dotProduct(cvec, cvec)
      struct(round(d2 * Snap).cast("long").as("d"),
        c.getField("cid").as("cid"), d2.as("raw"))
    })
  }

  /** Nearest-centroid assignment: (idCol, vecCol, cluster, __d2 raw). */
  def assign(df: DataFrame, idCol: String, vecCol: String,
             centroids: Seq[(Int, Array[Double])]): DataFrame = {
    require(centroids.nonEmpty, "kmeans: empty centroid set")
    val best = array_min(
      scoredL2(col(vecCol), dotProduct(col(vecCol), col(vecCol)), centroids))
    df.select(col(idCol), col(vecCol),
      best.getField("cid").as("cluster"),
      best.getField("raw").as("__d2"))
  }

  /** One mean-recompute: element-wise member mean per cluster, snapped to
    * the 1e-6 grid. Clusters that lost all members keep their previous
    * centroid (the standard empty-cell policy). The collect is k·dim rows. */
  private def recompute(assigned: DataFrame, vecCol: String,
                        prev: Seq[(Int, Array[Double])]): Seq[(Int, Array[Double])] = {
    val dim = prev.head._2.length
    val means = assigned
      .select(col("cluster"), posexplode(col(vecCol)).as(Seq("__pos", "__v")))
      .groupBy(col("cluster"), col("__pos"))
      .agg((round(avg(col("__v")) * Snap) / Snap).as("__m"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (cid, rows) =>
        val arr = new Array[Double](dim)
        rows.foreach(r => arr(r.getInt(1)) = r.getDouble(2))
        cid -> arr
      }
    prev.map { case (cid, old) => (cid, means.getOrElse(cid, old)) }
  }

  /** `iters` Lloyd rounds from `init`; returns (final centroids, final
    * assignment frame with columns idCol, cluster, __d2). */
  def train(df: DataFrame, idCol: String, vecCol: String,
            init: Seq[(Int, Array[Double])],
            iters: Int): (Seq[(Int, Array[Double])], DataFrame) = {
    var cents = init
    for (_ <- 1 to iters)
      cents = recompute(assign(df, idCol, vecCol, cents), vecCol, cents)
    (cents, assign(df, idCol, vecCol, cents).drop(vecCol))
  }
}
