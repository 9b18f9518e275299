package graft

import org.apache.spark.sql.functions._
import graft.ml.KMeans
import graft.text.{Dsir, Ranking}

/** Round-11 curation flagships: k-means training laws, DSIR weight
  * semantics, and unigram-LM NLL against hand-computed references. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  // --- KMeans -----------------------------------------------------------

  private val seed2 = Seq(0 -> Array(0.0, 0.0), 1 -> Array(10.0, 10.0))

  test("kmeans assignment is the snapped-L2 argmin, ties to smaller cid") {
    val df = Seq(
      (1L, Array(1.0, 0.0)),   // near centroid 0
      (2L, Array(9.0, 10.0)),  // near centroid 1
      (3L, Array(5.0, 5.0))    // exactly equidistant → cid 0
    ).toDF("id", "v")
    val a = KMeans.assign(df, "id", "v", seed2).orderBy("id").collect()
    assert(a.map(_.getInt(2)).toSeq == Seq(0, 1, 0))
    assert(a.head.getDouble(3) == 1.0) // dist² to (0,0) from (1,0)
  }

  test("one Lloyd round moves centroids to the snapped member means") {
    val df = Seq(
      (1L, Array(1.0, 1.0)), (2L, Array(3.0, 1.0)),     // cluster 0: mean (2,1)
      (3L, Array(9.0, 9.0)), (4L, Array(11.0, 9.0))     // cluster 1: mean (10,9)
    ).toDF("id", "v")
    val (cents, asgn) = KMeans.train(df, "id", "v", seed2, iters = 1)
    val c = cents.toMap
    assert(c(0).toSeq == Seq(2.0, 1.0) && c(1).toSeq == Seq(10.0, 9.0))
    // final assignment is against the RECOMPUTED centroids
    val d = asgn.orderBy("id").collect()
    assert(d.map(_.getInt(1)).toSeq == Seq(0, 0, 1, 1))
    assert(d.head.getDouble(2) == 1.0) // (1,1) to (2,1): dist² 1
  }

  test("a cluster that loses all members keeps its previous centroid") {
    val df = Seq((1L, Array(0.0, 1.0)), (2L, Array(1.0, 0.0))).toDF("id", "v")
    val far = Seq(0 -> Array(0.0, 0.0), 1 -> Array(100.0, 100.0))
    val (cents, _) = KMeans.train(df, "id", "v", far, iters = 2)
    assert(cents.toMap.apply(1).toSeq == Seq(100.0, 100.0))
    assert(cents.toMap.apply(0).toSeq == Seq(0.5, 0.5))
  }

  test("lloyd iterations never increase inertia (beyond snap tolerance)") {
    val pts = (0 until 40).map(i =>
      (i.toLong, Array((i % 7).toDouble, (i % 5).toDouble)))
    val df = pts.toDF("id", "v")
    val init = Seq(0 -> Array(0.0, 0.0), 1 -> Array(6.0, 4.0))
    def inertia(iters: Int): Double = {
      val (_, a) = KMeans.train(df, "id", "v", init, iters)
      a.agg(sum(col("__d2"))).collect()(0).getDouble(0)
    }
    val i1 = inertia(1); val i2 = inertia(2); val i3 = inertia(3)
    assert(i2 <= i1 + 1e-4 && i3 <= i2 + 1e-4)
  }

  // --- DSIR -------------------------------------------------------------

  test("dsir weights: target-only vocabulary scores positive, off-target negative") {
    val df = Seq(
      (1L, "alpha alpha beta", true),
      (2L, "alpha beta beta", true),
      (3L, "gamma delta gamma", false),
      (4L, "delta gamma delta", false)
    ).toDF("id", "text", "is_en")
    val w = Dsir.importanceWeights(df, "id", "text", col("is_en"),
        buckets = 256, alpha = 0.1)
      .select(col("id"), col("dsir_logw")).orderBy("id").collect()
    assert(w(0).getDouble(1) > 0 && w(1).getDouble(1) > 0)
    assert(w(2).getDouble(1) < 0 && w(3).getDouble(1) < 0)
  }

  test("dsir: token-free doc scores exactly 0 and n_tok 0") {
    val df = Seq((1L, "   ", true), (2L, "word", false)).toDF("id", "text", "t")
    val r = Dsir.importanceWeights(df, "id", "text", col("t"))
      .orderBy("id").collect()
    assert(r.head.getInt(r.head.fieldIndex("n_tok")) == 0)
    assert(r.head.getDouble(r.head.fieldIndex("dsir_logw")) == 0.0)
  }

  test("dsir hand-check: single shared token, half target") {
    // one token "x" appearing once in a target doc, once in a raw-only
    // doc: raw count 2, target count 1, B buckets, alpha 1.
    // logw(per token) = ln((1+1)/(1+B)) - ln((2+1)/(2+B))
    val B = 64
    val df = Seq((1L, "x", true), (2L, "x", false)).toDF("id", "text", "t")
    val expect = math.log(2.0 / (1 + B)) - math.log(3.0 / (2 + B))
    val got = Dsir.importanceWeights(df, "id", "text", col("t"), buckets = B)
      .filter(col("id") === 1).collect()(0)
    assert(math.abs(got.getDouble(got.fieldIndex("dsir_logw")) - expect) < 1e-12)
  }

  // --- unigram NLL ------------------------------------------------------

  test("unigramNll hand-check on a two-doc corpus") {
    // corpus tokens: a a b  |  b c   → counts a:2 b:2 c:1, tot 5, V 3,
    // alpha 1 → p(a)=3/8, p(b)=3/8, p(c)=2/8
    val df = Seq((1L, "a a b"), (2L, "b c")).toDF("id", "text")
    val r = Ranking.unigramNll(df, "id", "text")
      .select(col("id"), col("n_tok"), col("nll")).orderBy("id").collect()
    val p38 = -math.log(3.0 / 8); val p28 = -math.log(2.0 / 8)
    assert(r(0).getLong(1) == 3 && math.abs(r(0).getDouble(2) - p38) < 1e-12)
    assert(r(1).getLong(1) == 2 &&
      math.abs(r(1).getDouble(2) - (p38 + p28) / 2) < 1e-12)
  }

  test("unigramNll: token-free docs keep null nll, n_tok 0") {
    val df = Seq((1L, ""), (2L, "only words here")).toDF("id", "text")
    val r = Ranking.unigramNll(df, "id", "text").orderBy("id").collect()
    assert(r.head.getLong(r.head.fieldIndex("n_tok")) == 0)
    assert(r.head.isNullAt(r.head.fieldIndex("nll")))
  }

  // --- JL random projection (QueriesMisc13 helpers via the key) --------

  test("JL projection concentrates norms: proj_sq within 60% of x_sq for most rows") {
    // Achlioptas sign matrix, 64→16: E[proj_sq] = x_sq; at k=16 the
    // deviation is wide but bounded — check the median ratio lands near
    // 1, which would fail for any systematically-scaled-wrong matrix.
    val out = graft.queries.QueriesMisc13
      .queries("sim_random_projection")(spark, "/root/testdata/sf0.001")
      .select(col("proj_sq") / col("x_sq"))
    val ratios = out.collect().map(_.getDouble(0)).sorted
    val med = ratios(ratios.length / 2)
    assert(med > 0.4 && med < 1.6, s"median norm ratio $med")
  }

  test("rolling corr is bounded to [-1, 1] and cov row-1 is null") {
    val out = graft.queries.QueriesMisc13
      .queries("win_rolling_corr")(spark, "/root/testdata/sf0.001")
    val bad = out.filter(abs(col("roll_corr")) > 1.0 + 1e-9).count()
    assert(bad == 0)
    assert(out.filter(col("roll_cov").isNull).count() > 0)
  }

  test("is_last_distinct marks exactly one row per distinct value") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "a"), (4L, "a"), (5L, "b"))
      .toDF("i", "v")
    val out = df.select(col("i"), col("v"),
      graft.functions.isLastDistinct(col("v"), col("i")).as("l"))
    assert(out.filter(col("l")).collect().map(_.getLong(0)).sorted.toSeq
      == Seq(4L, 5L))
    // complement law: last along asc == first along desc
    val first = df.select(col("i"),
      graft.functions.isFirstDistinct(col("v"), -col("i")).as("f"))
    assert(first.filter(col("f")).collect().map(_.getLong(0)).sorted.toSeq
      == Seq(4L, 5L))
  }

  test("set_sorted and rechunk are identity no-ops on the plan") {
    val lf = graft.dsl.LazyFrame(Seq((1, "x")).toDF("a", "b"))
    assert(lf.setSorted("a").df.queryExecution.logical
      == lf.df.queryExecution.logical)
    assert(lf.rechunk().df.queryExecution.logical
      == lf.df.queryExecution.logical)
    assert(lf.shrinkToFit().df.queryExecution.logical
      == lf.df.queryExecution.logical)
  }

  test("seq variants, collect_schema, column index, estimated size") {
    val lf = graft.dsl.LazyFrame(Seq((1, "x"), (2, "y")).toDF("a", "b"))
    assert(lf.selectSeq(col("a")).df.columns.toSeq == Seq("a"))
    assert(lf.withColumnsSeq("c" -> (col("a") + 1)).df.columns.contains("c"))
    assert(lf.collectSchema.fieldNames.toSeq == Seq("a", "b"))
    assert(lf.getColumnIndex("b") == 1)
    intercept[IllegalArgumentException](lf.getColumnIndex("zz"))
    assert(lf.estimatedSize > 0)
  }

  test("fetch, rows_by_key, iter_slices, show, show_graph conveniences") {
    val lf = graft.dsl.LazyFrame(
      Seq((1, "x"), (2, "y"), (2, "z"), (3, "w")).toDF("a", "b"))
    assert(lf.fetch(2).length == 2)
    val byKey = lf.rowsByKey(Seq("a"))
    assert(byKey(Seq(2)).map(_.getString(1)).toSet == Set("y", "z"))
    val uniq = lf.rowsByKey(Seq("a"), unique = true)
    assert(uniq(Seq(2)).size == 1)
    val slices = lf.iterSlices(3).toSeq
    assert(slices.map(_.size) == Seq(3, 1))
    assert(lf.show(2).contains("shape:"))
    assert(lf.showGraph().nonEmpty)
  }

  test("frame-level order/agg/schema conveniences") {
    val lf = graft.dsl.LazyFrame(
      Seq((1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0)).toDF("k", "v"))
    assert(lf.reverse(col("k")).collectRows().head.getInt(0) == 4)
    assert(lf.firstRow(col("k")).collectRows().head.getInt(0) == 1)
    assert(lf.lastRow(col("k")).collectRows().head.getInt(0) == 4)
    assert(lf.clear().count() == 0 && lf.clear().schema == lf.schema)
    assert(lf.cloneFrame() eq lf)
    assert(lf.maxAll().head().getDouble(1) == 40.0)
    assert(lf.nullCount().head().getLong(0) == 0L)
    val tgt = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("z",
        org.apache.spark.sql.types.StringType)))
    val m = lf.matchToSchema(tgt)
    assert(m.columns == Seq("v", "z") && m.collectRows().forall(_.isNullAt(1)))
    val merged = lf.mergeSorted(
      graft.dsl.LazyFrame(Seq((5, 50.0)).toDF("k", "v")), col("k"))
    assert(merged.count() == 5)
  }

  test("dsir plan: the only exchange carries the bucket table, not documents") {
    val df = (1 to 50).map(i => (i.toLong, s"tok$i word common", i % 2 == 0))
      .toDF("id", "text", "t")
    val plan = Dsir.importanceWeights(df, "id", "text", col("t"))
      .queryExecution.executedPlan.toString
    // document rows are never hash-repartitioned: the only exchanges are
    // the ≤B-row bucket aggregate's and the one-row broadcast
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx <= 1, s"unexpected document shuffle:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"))
  }
}
