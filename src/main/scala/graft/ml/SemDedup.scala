package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.cosineSimilarity

/** SemDeDup-style semantic deduplication (Abbas et al. 2023,
  * arXiv:2303.09540): cluster the corpus embeddings with fixed centroids,
  * then inside each cluster remove every vector that has a semantic
  * duplicate (cosine ≥ threshold) which the keep-policy prefers. The
  * paper keeps, per duplicate group, the item with the LOWEST cosine
  * similarity to its cluster centroid (the "most marginal" exemplar);
  * we implement the pairwise-dominance form of that rule — x is removed
  * iff some same-cluster y with cos(x,y) ≥ threshold has strictly lower
  * centroid-similarity (ties broken on the smaller id). Pairwise
  * dominance needs no sequential scan or connected components, is
  * deterministic, and is expressible in one within-cluster self-join —
  * the property that makes it both oracle-checkable (a SQL EXISTS) and
  * shuffle-bounded at 100 TB. It can remove slightly more than the
  * paper's greedy group scan (every non-minimum of a duplicate pair
  * goes, not just non-exemplars of a component), which is the
  * conservative direction for training-data curation.
  *
  * Scale posture: centroids are broadcast literals; the cluster
  * assignment and centroid-similarity are one codegen'd projection; the
  * self-join hash-partitions the corpus ONCE on the cluster id, and
  * both join sides project the same subplan (the `embeddingNearDups`
  * ReusedExchange shape). Cluster population is bounded by k — at
  * corpus scale pick k ≈ n / targetClusterSize exactly as the paper
  * does (they use k = 50k for LAION). `maxCluster` > 0 additionally
  * drops clusters larger than the cap before any pair materializes
  * (zero/dead embeddings all land in one cell and would otherwise form
  * a single n²/2 join group).
  */
object SemDedup {

  /** Assigned cluster id and cosine-to-that-centroid for a vector, as a
    * struct(cid, csim). Centroid choice = max cosine (min negated), ties
    * to the smaller cid; csim is integer-scaled-rounded to 6 decimals so
    * the assignment and the dominance rule are reproducible across
    * engines and summation orders. */
  def assignWithSim(vec: Column, centroids: Seq[(Int, Array[Double])]): Column = {
    val best = array_min(Similarity.scoredCentroids(vec, centroids, roundTo = 1e6))
    struct(best.getField("cid").as("cid"),
      (-best.getField("negsim")).as("csim"))
  }

  /** The kept rows after semantic dedup: (id, cluster, csim) for every
    * vector NOT dominated by a same-cluster semantic duplicate.
    * `threshold` is the duplicate cosine (the paper's 1 − ε). */
  def semDedup(df: DataFrame, idCol: String, vecCol: String,
               centroids: Seq[(Int, Array[Double])], threshold: Double,
               maxCluster: Int = 0): DataFrame = {
    val assigned0 = df.select(col(idCol), col(vecCol),
        assignWithSim(col(vecCol), centroids).as("__a"))
      .select(col(idCol), col(vecCol),
        col("__a.cid").as("cluster"), col("__a.csim").as("csim"))
    val assigned =
      if (maxCluster > 0) {
        val keep = assigned0.groupBy(col("cluster")).count()
          .filter(col("count") <= maxCluster).select(col("cluster"))
        assigned0.join(broadcast(keep), Seq("cluster"), "left_semi")
      } else assigned0
    val part = assigned.repartition(col("cluster"))
    val l = part.select(col("cluster"), col(idCol).as("__id_x"),
      col(vecCol).as("__vx"), col("csim").as("__cs_x"))
    val r = part.select(col("cluster"), col(idCol).as("__id_y"),
      col(vecCol).as("__vy"), col("csim").as("__cs_y"))
    // x is dominated by y: same cluster, near-duplicate, y is the
    // preferred exemplar (lower centroid-sim, ties to smaller id).
    // cheap dominance predicate FIRST: only the dominated direction of
    // each unordered pair (at most half the join output) pays the O(dim)
    // fused cosine kernel — CombineFilters keeps conjunct order
    val dominated = l.join(r, Seq("cluster"))
      .filter(col("__cs_y") < col("__cs_x") ||
        (col("__cs_y") === col("__cs_x") && col("__id_y") < col("__id_x")))
      .filter(
        (round(cosineSimilarity(col("__vx"), col("__vy")) * 1e4) / 1e4)
          >= threshold)
      .select(col("__id_x").as(idCol)).distinct()
    part.join(dominated, Seq(idCol), "left_anti")
      .select(col(idCol), col("cluster"), col("csim"))
  }
}
