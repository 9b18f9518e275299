package graft

import org.apache.spark.sql.functions._
import graft.ml.SemDedup
import graft.text.Ranking

/** SemDeDup semantic dedup and BM25/TF-IDF ranking: algebraic properties
  * against hand-computed references, keep-policy laws, and the plan
  * contracts that make them 100 TB-safe. */
class RankingSemDedupSpec extends SparkSpec {
  import spark.implicits._

  // --- SemDedup ---------------------------------------------------------

  private val centroids = Seq(
    0 -> Array(1.0, 0.0, 0.0),
    1 -> Array(0.0, 1.0, 0.0))

  test("semDedup keeps the low-centroid-sim exemplar of each duplicate pair") {
    // a and b are near-duplicates of each other in cluster 0; b hugs the
    // centroid harder, so the paper's keep-low policy drops b, keeps a.
    // c is alone in cluster 1 and survives untouched.
    val df = Seq(
      (1L, Array(0.9, 0.40, 0.0)),  // a: cluster 0, lower csim
      (2L, Array(0.9, 0.10, 0.0)),  // b: cluster 0, higher csim, dup of a
      (3L, Array(0.0, 1.0, 0.1))    // c: cluster 1
    ).toDF("id", "v")
    val kept = SemDedup.semDedup(df, "id", "v", centroids, threshold = 0.95)
      .orderBy("id").collect()
    assert(kept.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    assert(kept.head.getInt(1) == 0 && kept.last.getInt(1) == 1)
  }

  test("threshold above max pairwise cosine removes nothing") {
    val df = Seq(
      (1L, Array(1.0, 0.2, 0.0)),
      (2L, Array(0.8, 0.6, 0.0)),
      (3L, Array(0.0, 0.9, 0.4))
    ).toDF("id", "v")
    val kept = SemDedup.semDedup(df, "id", "v", centroids, threshold = 1.01)
    assert(kept.count() == 3)
  }

  test("exact duplicates: ties break to the smaller id") {
    val df = Seq(
      (7L, Array(1.0, 0.1, 0.0)),
      (9L, Array(1.0, 0.1, 0.0))   // identical vector, same csim
    ).toDF("id", "v")
    val kept = SemDedup.semDedup(df, "id", "v", centroids, threshold = 0.99)
      .collect()
    assert(kept.map(_.getLong(0)).toSeq == Seq(7L))
  }

  test("maxCluster drops over-populated clusters before pair generation") {
    val df = (1L to 10L).map(i => (i, Array(1.0, i * 0.001, 0.0))).toDF("id", "v")
      .union(Seq((99L, Array(0.0, 1.0, 0.0))).toDF("id", "v"))
    val kept = SemDedup.semDedup(df, "id", "v", centroids, threshold = 1.01,
      maxCluster = 5)
    // cluster 0 holds 10 > 5 -> dropped wholesale; only the singleton stays
    assert(kept.collect().map(_.getLong(0)).toSeq == Seq(99L))
  }

  test("kept set is a fixpoint: re-running semDedup on it removes nothing") {
    val df = (1L to 20L)
      .map(i => (i, Array(math.cos(i * 0.3), math.sin(i * 0.3), 0.2)))
      .toDF("id", "v")
    val once = SemDedup.semDedup(df, "id", "v", centroids, threshold = 0.98)
    val kept = once.join(df, "id").select(col("id"), col("v"))
    val twice = SemDedup.semDedup(kept, "id", "v", centroids, threshold = 0.98)
    assert(twice.count() == once.count())
  }

  test("cluster self-join reuses one exchange (ReusedExchange in the plan)") {
    // disable broadcast so the join plans the at-scale SMJ shape; AQE
    // applies exchange reuse when stages materialize, so execute first
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = (1L to 16L)
        .map(i => (i, Array(math.cos(i * 0.7), math.sin(i * 0.7), 0.1)))
        .toDF("id", "v")
      val out = SemDedup.semDedup(df, "id", "v", centroids, threshold = 0.9)
      out.queryExecution.toRdd.foreach(_ => ())
      val plan = out.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(plan.contains("ReusedExchange"),
        s"expected the two self-join sides to share one exchange:\n$plan")
    }
  }

  // --- BM25 -------------------------------------------------------------

  test("bm25 matches the closed-form score on a 3-doc corpus") {
    val docs = Seq(
      (1L, "spark spark hash"),
      (2L, "hash join"),
      (3L, "window sort")
    ).toDF("id", "text")
    val got = Ranking.bm25(docs, "id", "text", Seq("spark", "hash"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
    // N=3, avgdl=7/3; df(spark)=1, df(hash)=2
    val k1 = 1.2; val b = 0.75; val avgdl = 7.0 / 3.0
    def idf(df: Int) = math.log(1.0 + (3.0 - df + 0.5) / (df + 0.5))
    def term(tf: Int, dfc: Int, dl: Int) =
      idf(dfc) * tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * dl / avgdl))
    def exp(tfs: Seq[(Int, Int)], dl: Int) =
      math.round(tfs.map { case (tf, dfc) => term(tf, dfc, dl) }.sum * 1e4) / 1e4
    assert(got(0) == ((1L, 3, exp(Seq((2, 1), (1, 2)), 3))))
    assert(got(1) == ((2L, 2, exp(Seq((0, 1), (1, 2)), 2))))
    assert(got(2) == ((3L, 2, 0.0)))
  }

  test("bm25 plan shuffles no document rows (one-row broadcast stats only)") {
    val docs = (1L to 50L).map(i => (i, s"w$i hash join")).toDF("id", "text")
    val plan = Ranking.bm25(docs, "id", "text", Seq("hash"))
      .queryExecution.executedPlan.toString
    // the only join is the broadcast of the one-row stats aggregate
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"stats must ride a broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no row shuffle allowed:\n$plan")
  }

  test("bm25 is monotone in tf (more hits, higher score, same dl)") {
    val docs = Seq(
      (1L, "hash miss miss"),
      (2L, "hash hash miss"),
      (3L, "hash hash hash")
    ).toDF("id", "text")
    val s = Ranking.bm25(docs, "id", "text", Seq("hash"))
      .orderBy("id").collect().map(_.getDouble(2))
    assert(s(0) < s(1) && s(1) < s(2))
  }

  // --- TF-IDF -----------------------------------------------------------

  test("tfidfTopTerms ranks a doc's distinctive term first") {
    val docs = Seq(
      (1L, "common rare common"),
      (2L, "common other"),
      (3L, "common other")
    ).toDF("id", "text")
    val top = Ranking.tfidfTopTerms(docs, "id", "text", k = 1)
      .orderBy("id").collect()
    // 'common' is in every doc -> idf 0; 'rare' wins doc 1
    assert(top(0).getString(1) == "rare")
    val tfidf = top(0).getDouble(2)
    assert(math.abs(tfidf - math.round(math.log(3.0) * 1e4) / 1e4) < 1e-9)
  }

  // --- strip_chars char-class escaping ----------------------------------

  test("stripChars treats the char set literally: no ranges, no \\Q\\E leakage") {
    val df = Seq("QxE", "a-z-b", "\\path\\", "abc").toDF("s")
    val out = df.select(
      graft.functions.stripChars(col("s"), "aeiou").as("vowels"),
      // "a-z" is the SET {a,-,z}, never a range (polars semantics)
      graft.functions.stripChars(col("s"), "a-z").as("dashset"),
      graft.functions.stripChars(col("s"), "\\").as("bslash"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    // the pre-fix Pattern.quote escaping put literal Q/E/\ into the class,
    // which would have stripped the Q and E here
    assert(out == Seq(("QxE", "QxE", "QxE"),
      ("-z-b", "b", "a-z-b"),
      ("\\path\\", "\\path\\", "path"),
      ("bc", "bc", "abc")))
  }

  // --- Weighted sampling ------------------------------------------------

  test("sampleWeighted draws exactly k rows, deterministically, skipping w<=0") {
    val docs = (1L to 100L).map(i => (i, if (i % 10 == 0) 0L else i)).toDF("id", "w")
    val a = graft.ops.Sampling.sampleWeighted(docs, "id", "w", k = 7)
      .select("id").collect().map(_.getLong(0)).toSeq
    val b = graft.ops.Sampling.sampleWeighted(docs, "id", "w", k = 7)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(a == b && a.size == 7)
    assert(a.forall(_ % 10 != 0), "zero-weight rows must never be sampled")
  }

  test("sampleWeighted plans a global top-k (TakeOrderedAndProject, no window)") {
    val docs = (1L to 100L).map(i => (i, i)).toDF("id", "w")
    val plan = graft.ops.Sampling.sampleWeighted(docs, "id", "w", k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected per-partition heap top-k:\n$plan")
    assert(!plan.contains("Window"), s"no window allowed:\n$plan")
  }

  test("sampleWeighted favors heavy rows (proportional-to-weight law)") {
    // one row carries 10^6 times the weight of the other 99 combined:
    // its E–S key ln(u)/w is ~0 while the rest sit far below
    val docs = (1L to 99L).map(i => (i, 1L)).toDF("id", "w")
      .union(Seq((1000L, 100000000L)).toDF("id", "w"))
    val got = graft.ops.Sampling.sampleWeighted(docs, "id", "w", k = 1)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1000L))
  }

  test("tfidfTopTerms emits at most k rows per doc with dense ranks 1..k") {
    val docs = (1L to 8L).map(i => (i, s"a b c d$i e$i f$i")).toDF("id", "text")
    val out = Ranking.tfidfTopTerms(docs, "id", "text", k = 3)
    val byDoc = out.groupBy("id").agg(count(lit(1)).as("n"),
      min("rank").as("lo"), max("rank").as("hi")).collect()
    byDoc.foreach { r =>
      assert(r.getLong(1) <= 3 && r.getInt(2) == 1 && r.getInt(3) == r.getLong(1))
    }
  }
}
