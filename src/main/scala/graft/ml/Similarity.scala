package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{cosineSimilarity, dotProduct, l2Norm}

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k — a broadcast of the (small) query set
  * against the (huge) corpus, one pass, no shuffle of the corpus beyond the
  * final per-query top-k aggregation. This is the correct 100 TB baseline:
  * the corpus never self-joins.
  *
  * Scale path: IVF-style bucketing — assign each vector to its nearest of C
  * centroids (broadcast), search only matching buckets (nprobe=1 here);
  * recall/latency trade like FAISS-IVF. Centroids come from a sampled
  * k-means|| style seed or are caller-provided.
  */
object Similarity {

  /** Brute-force top-k: for each query vector, the k nearest corpus vectors
    * by cosine. `queries` is expected to be small → broadcast. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, qidCol: String,
                     k: Int): DataFrame = {
    val q = broadcast(queries.select(col(qidCol), col(vecCol).as("__qvec")))
    val scored = corpus.select(col(idCol), col(vecCol))
      .crossJoin(q)
      .withColumn("cosine", round(cosineSimilarity(col(vecCol), col("__qvec")), 4))
    val w = Window.partitionBy(col(qidCol)).orderBy(col("cosine").desc, col(idCol).asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col(qidCol), col(idCol), col("cosine"), col("__rn").as("rank"))
  }

  /** Shared centroid-scoring shape: the centroid set as a broadcast
    * literal array, each element scored to struct(negsim, cid) with the
    * codegen'd cosine kernel (negated so array_min/array_sort pick the
    * most-similar first, ties to the smaller cid). `roundTo` > 0
    * integer-scale-rounds the similarity first — callers whose
    * assignment must be reproducible across engines/summation orders
    * (SemDedup) snap the boundary; the IVF paths keep full precision. */
  private[ml] def scoredCentroids(vec: Column,
                                  centroids: Seq[(Int, Array[Double])],
                                  roundTo: Double = 0): Column = {
    val cents = array(centroids.map { case (id, v) =>
      struct(lit(id).as("cid"), array(v.map(lit): _*).as("cvec"))
    }: _*)
    transform(cents, c => {
      val sim = dotProduct(vec, c.getField("cvec")) /
        (l2Norm(vec) * l2Norm(c.getField("cvec")))
      val snapped = if (roundTo > 0) round(sim * roundTo) / roundTo else sim
      struct((-snapped).as("negsim"), c.getField("cid").as("cid"))
    })
  }

  /** Assign each vector to its nearest centroid id (IVF cell). Centroids are
    * a Seq of (id, vector) — broadcast as a literal array, evaluated with
    * codegen'd HOFs, no UDF. */
  def assignToCentroid(vec: Column, centroids: Seq[(Int, Array[Double])]): Column =
    array_min(scoredCentroids(vec, centroids)).getField("cid")

  /** The `nprobe` nearest centroid ids for a vector (FAISS-IVF multi-probe):
    * per-centroid cosine scored with the codegen'd kernel, array_sort on the
    * (negated-similarity, cid) structs, first nprobe cell ids. */
  def nearestCentroids(vec: Column, centroids: Seq[(Int, Array[Double])],
                       nprobe: Int): Column =
    transform(slice(array_sort(scoredCentroids(vec, centroids)), 1, nprobe),
      s => s.getField("cid"))

  /** IVF search: the corpus is bucketed once by nearest centroid; each
    * query probes its `nprobe` nearest cells (query side explodes — queries
    * are the small broadcast side, so replication is nprobe× a small set).
    * Equi-join on cell id → shuffle-bounded; each (query, corpus) pair
    * meets at most once because a corpus vector lives in exactly one cell.
    * nprobe = #centroids degenerates to exact brute force (spec-asserted);
    * recall rises monotonically with nprobe like FAISS-IVF. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, qidCol: String,
              centroids: Seq[(Int, Array[Double])], k: Int,
              nprobe: Int = 1): DataFrame = {
    val c = corpus.withColumn("__cell", assignToCentroid(col(vecCol), centroids))
    val q = broadcast(queries
      .withColumn("__cell",
        explode(nearestCentroids(col(vecCol), centroids, nprobe)))
      .select(col(qidCol), col("__cell"), col(vecCol).as("__qvec")))
    val scored = c.join(q, Seq("__cell"))
      .withColumn("cosine", round(cosineSimilarity(col(vecCol), col("__qvec")), 4))
    val w = Window.partitionBy(col(qidCol)).orderBy(col("cosine").desc, col(idCol).asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col(qidCol), col(idCol), col("cosine"), col("__rn").as("rank"))
  }

  /** Random-hyperplane LSH bucket id (b planes → b-bit signature) for
    * embedding-cosine near-dup detection: vectors in the same bucket are
    * near-duplicate candidates. Planes are deterministic literals.
    *
    * The sign test rounds the dot product to 6 decimals first: a vector
    * lying ULP-close to a hyperplane would otherwise bucket differently
    * across engines/summation orders (bucketing is a heuristic — snapping
    * the boundary costs nothing and makes the bit reproducible). */
  def lshBucket(vec: Column, planes: Seq[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      when(round(dotProduct(vec, array(p.map(lit): _*)) * 1e6) >= 0, lit(1L << i))
        .otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Embedding near-duplicate pairs: same LSH bucket AND cosine ≥ threshold.
    *
    * Pair generation is a bucket-keyed SELF-JOIN over ONE shared exchange:
    * the frame is hash-partitioned on `__bucket` once, and both join sides
    * are projections of that same subplan, so the join inserts no further
    * exchange and the duplicated subtree dedups to a ReusedExchange
    * (plan-pinned). The sort-merge join then STREAMS each bucket's i<j
    * cross pairs through the fused cosine kernel with spillable match
    * buffers — memory stays O(bucket·dim). The previous bucket-grouped
    * local pair-gen (collect_list → nested transform → explode), borrowed
    * from the text-LSH twin where BANDED buckets are small by construction,
    * materialized the entire O(bucket²·dim) pair array inside one row:
    * with a handful of hyperplanes a bucket holds n/2^planes vectors, and
    * the sf1 full-suite sweep (20k×64-dim vectors, 8 buckets ⇒ ~2 GB
    * single rows) OOM'd the heap on exactly that row. A vector lives in
    * exactly one bucket (single signature, not banded), so no pair can
    * repeat.
    *
    * `maxBucket` > 0 drops buckets larger than the cap BEFORE any pair
    * materializes: a degenerate bucket — zero/dead embeddings are common
    * at corpus scale and all share one signature — is otherwise a single
    * n²/2 join group. At 100 TB set the cap (e.g. 1000); oversized buckets
    * carry almost no near-dup signal. Bucket sizes are a tiny aggregate
    * (≤2^planes rows) broadcast as a semi-filter BEFORE the shuffle, so a
    * degenerate bucket's rows never ship through the exchange — and unlike
    * a count-over-bucket window above the shuffle, nothing re-runs once
    * per join side (the r9 review caught exactly that duplication).
    *
    * `maxBucketFraction` > 0 is the relative form: drop buckets holding
    * more than that fraction of all rows (floor semantics — count ≤
    * ⌊total·f⌋). The total is a one-row aggregate computed IN-PLAN and
    * broadcast-crossed into the bucket counts, so query construction
    * stays plan-only: no eager count() job, and cap and data cannot
    * drift apart between two passes over a live table. */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
                        planes: Seq[Array[Double]], threshold: Double,
                        maxBucket: Int = 0,
                        maxBucketFraction: Double = 0.0): DataFrame = {
    val b0 = df
      .select(col(idCol), col(vecCol), lshBucket(col(vecCol), planes).as("__bucket"))
    val pruned =
      if (maxBucket > 0 || maxBucketFraction > 0) {
        val counts = b0.groupBy(col("__bucket")).count()
        val keep =
          if (maxBucketFraction > 0)
            counts.crossJoin(broadcast(
                b0.select(count(lit(1)).as("__total"))))
              .filter(col("count") <=
                floor(col("__total") * lit(maxBucketFraction)))
              .select(col("__bucket"))
          else counts.filter(col("count") <= maxBucket).select(col("__bucket"))
        b0.join(broadcast(keep), Seq("__bucket"), "left_semi")
      } else b0
    val part = pruned.repartition(col("__bucket"))
    val l = part.select(col("__bucket"), col(idCol).as("id_a"), col(vecCol).as("__va"))
    val r = part.select(col("__bucket"), col(idCol).as("id_b"), col(vecCol).as("__vb"))
    l.join(r, Seq("__bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        // integer-scaled round: engines disagree on double round(x, 4) at
        // half-way ties, and this value feeds the threshold membership test
        (round(cosineSimilarity(col("__va"), col("__vb")) * 10000) / 10000)
          .as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
