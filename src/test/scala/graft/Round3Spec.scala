package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{functions => gf}
import graft.ops.MergeSorted

class Round3Spec extends SparkSpec {
  import spark.implicits._

  test("ewmMeanRows matches the closed-form EWM (alpha=0.5, adjust=true)") {
    val df = Seq((1, 1, 10.0), (1, 2, 20.0), (1, 3, 30.0)).toDF("k", "o", "x")
    val w = Window.partitionBy($"k").orderBy($"o")
    val got = df.select($"o", gf.ewmMeanRows($"x", w, span = 8, alpha = 0.5).as("e"))
      .orderBy($"o").select("e").as[Double].collect().toSeq
    // y1=10; y2=(0.5*10+20)/1.5=16.666..; y3=(0.25*10+0.5*20+30)/1.75=24.2857..
    assert(math.abs(got(0) - 10.0) < 1e-9)
    assert(math.abs(got(1) - 50.0 / 3) < 1e-9)
    assert(math.abs(got(2) - 42.5 / 1.75) < 1e-9)
  }

  test("peakMax/peakMin are strict and edge-aware") {
    val df = Seq((1, 1.0), (2, 3.0), (3, 2.0), (4, 2.0), (5, 5.0)).toDF("o", "x")
    val w = Window.orderBy($"o")
    val r = df.select($"o", gf.peakMax($"x", w).as("mx"), gf.peakMin($"x", w).as("mn"))
      .orderBy($"o").as[(Int, Boolean, Boolean)].collect().toSeq
    assert(r.map(_._2) == Seq(false, true, false, false, true)) // peaks at 3.0 and 5.0
    assert(r.map(_._3) == Seq(true, false, false, false, false)) // valley only at edge 1.0
  }

  test("MergeSorted.merge yields the globally sorted union") {
    val a = Seq((1, "a"), (3, "c")).toDF("k", "v")
    val b = Seq((2, "b"), (4, "d")).toDF("k", "v")
    val m = MergeSorted.merge(a, b, $"k").as[(Int, String)].collect().toSeq
    assert(m == Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")))
  }

  test("ivfTopK finds the self vector at rank 1 within its cell") {
    val vecs = Seq(
      (0, Array(1.0f, 0.0f)), (1, Array(0.0f, 1.0f)), // centroids
      (10, Array(0.9f, 0.1f)), (11, Array(0.8f, 0.2f)), (12, Array(0.1f, 0.9f)))
      .toDF("vec_id", "embedding")
    val centroids = Seq((0, Array(1.0, 0.0)), (1, Array(0.0, 1.0)))
    val qs = vecs.filter($"vec_id" === 10)
      .select($"vec_id".as("query_id"), $"embedding")
    val r = graft.ml.Similarity
      .ivfTopK(vecs.filter($"vec_id" >= 10), qs, "vec_id", "embedding", "query_id",
        centroids, k = 2)
      .orderBy($"rank").select("vec_id").as[Int].collect().toSeq
    assert(r == Seq(10, 11)) // same-cell neighbors only; 12 lives in the other cell
  }
}
