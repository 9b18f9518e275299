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

  /** Assign each vector to its nearest centroid id (IVF cell). Centroids are
    * a Seq of (id, vector) — broadcast as a literal array, evaluated with
    * codegen'd HOFs, no UDF. */
  def assignToCentroid(vec: Column, centroids: Seq[(Int, Array[Double])]): Column = {
    val cents = array(centroids.map { case (id, v) =>
      struct(lit(id).as("cid"), array(v.map(lit): _*).as("cvec"))
    }: _*)
    val scored = transform(cents, c =>
      struct((-dotProduct(vec, c.getField("cvec")) /
        (l2Norm(vec) * l2Norm(c.getField("cvec")))).as("negsim"),
        c.getField("cid").as("cid")))
    array_min(scored).getField("cid")
  }

  /** The `nprobe` nearest centroid ids for a vector (FAISS-IVF multi-probe):
    * per-centroid cosine scored with the codegen'd kernel, array_sort on the
    * (negated-similarity, cid) structs, first nprobe cell ids. */
  def nearestCentroids(vec: Column, centroids: Seq[(Int, Array[Double])],
                       nprobe: Int): Column = {
    val cents = array(centroids.map { case (id, v) =>
      struct(lit(id).as("cid"), array(v.map(lit): _*).as("cvec"))
    }: _*)
    val scored = transform(cents, c =>
      struct((-dotProduct(vec, c.getField("cvec")) /
        (l2Norm(vec) * l2Norm(c.getField("cvec")))).as("negsim"),
        c.getField("cid").as("cid")))
    transform(slice(array_sort(scored), 1, nprobe), s => s.getField("cid"))
  }

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
    * Same shape as the text-LSH twin (`text/Dedup.pairsFromBuckets`):
    * bucket-grouped LOCAL pair generation instead of a bucket self-join —
    * the r6 join formulation evaluated the bucket hash and prune window
    * once per join side (two exchanges, double compute, probe-verified);
    * this groups each bucket's (id, vector) rows into one sorted array on
    * ONE `__bucket` shuffle, emits the i<j pairs locally, and scores the
    * fused cosine kernel per pair. A vector lives in exactly one bucket
    * (single signature, not banded), so no pair can repeat.
    *
    * `maxBucket` > 0 drops buckets larger than the cap BEFORE any pair
    * materializes: a degenerate bucket — zero/dead embeddings are common
    * at corpus scale and all share one signature — is otherwise a single
    * n²/2 task AND an unbounded collect_list row. At 100 TB set the cap
    * (e.g. 1000); oversized buckets carry almost no near-dup signal. The
    * prune window's hash partitioning on `__bucket` is exactly the
    * groupBy's partitioning — no extra shuffle. */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
                        planes: Seq[Array[Double]], threshold: Double,
                        maxBucket: Int = 0): DataFrame = {
    val b0 = df.select(col(idCol), col(vecCol), lshBucket(col(vecCol), planes).as("__bucket"))
    val b =
      if (maxBucket > 0)
        b0.withColumn("__bn",
          count(lit(1)).over(Window.partitionBy(col("__bucket"))))
          .filter(col("__bn") <= maxBucket).drop("__bn")
      else b0
    val xs = col("xs")
    b.groupBy(col("__bucket"))
      .agg(sort_array(collect_list(struct(col(idCol).as("i"), col(vecCol).as("v")))).as("xs"))
      .filter(size(xs) > 1)
      .select(explode(flatten(transform(xs, (x, i) =>
        transform(slice(xs, i + 2, size(xs)),
          y => struct(x.as("a"), y.as("b")))))).as("p"))
      .select(col("p.a.i").as("id_a"), col("p.b.i").as("id_b"),
        // integer-scaled round: engines disagree on double round(x, 4) at
        // half-way ties, and this value feeds the threshold membership test
        (round(cosineSimilarity(col("p.a.v"), col("p.b.v")) * 10000) / 10000)
          .as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
