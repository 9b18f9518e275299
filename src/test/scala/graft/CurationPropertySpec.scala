package graft

import org.apache.spark.sql.functions._
import scala.util.Random
import graft.ml.KMeans
import graft.text.{Dsir, Ranking, TextAnalysis}

/** Seeded-random property checks for the round-11 curation operators:
  * every op is re-computed with a naive driver-side reference over the
  * same generated corpus and compared exactly (within float tolerance).
  * Catches drift between the distributed plan and the documented math
  * that a fixture-pinned oracle key can miss. */
class CurationPropertySpec extends SparkSpec {
  import spark.implicits._

  private val words =
    Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")

  private def corpus(seed: Int, n: Int): Seq[(Long, String, Boolean)] = {
    val r = new Random(seed)
    (0 until n).map { i =>
      val len = r.nextInt(12)
      val text = Seq.fill(len)(words(r.nextInt(words.size))).mkString(" ")
      (i.toLong, text, r.nextBoolean())
    }
  }

  private def toks(s: String): Seq[String] =
    s.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq

  private def md5Bucket(term: String, b: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(term.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16) % b
  }

  test("dsir weights equal the naive bag-of-buckets reference on 20 seeded corpora") {
    for (seed <- 1 to 20) {
      val docs = corpus(seed, 30)
      val B = 16; val alpha = 1.0
      // naive reference
      val all = docs.flatMap { case (_, t, tgt) =>
        toks(t).map(w => (md5Bucket(w, B), tgt))
      }
      val raw = all.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
      val tgt = all.filter(_._2).groupBy(_._1).view.mapValues(_.size.toDouble).toMap
      val rtot = all.size.toDouble; val ttot = all.count(_._2).toDouble
      def lr(b: Long): Double =
        math.log((tgt.getOrElse(b, 0.0) + alpha) / (ttot + alpha * B)) -
          math.log((raw.getOrElse(b, 0.0) + alpha) / (rtot + alpha * B))
      val expect = docs.map { case (id, t, _) =>
        id -> toks(t).map(w => lr(md5Bucket(w, B))).sum
      }.toMap
      val got = Dsir.importanceWeights(
          docs.toDF("id", "text", "t"), "id", "text", col("t"), buckets = B)
        .select(col("id"), col("dsir_logw")).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      for ((id, w) <- expect)
        assert(math.abs(got(id) - w) < 1e-9, s"seed=$seed id=$id")
    }
  }

  test("unigram NLL equals the naive LM reference on 20 seeded corpora") {
    for (seed <- 21 to 40) {
      val docs = corpus(seed, 25)
      val all = docs.flatMap(d => toks(d._2))
      val counts = all.groupBy(identity).view.mapValues(_.size.toDouble).toMap
      val tot = all.size.toDouble; val v = counts.size.toDouble
      val expect = docs.map { case (id, t, _) =>
        val ts = toks(t)
        id -> (if (ts.isEmpty) None
               else Some(ts.map(w =>
                 -math.log((counts(w) + 1.0) / (tot + v))).sum / ts.size))
      }.toMap
      val got = Ranking.unigramNll(docs.toDF("id", "text", "t"), "id", "text")
        .select(col("id"), col("nll")).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .toMap
      for ((id, e) <- expect) (e, got(id)) match {
        case (None, None)       => ()
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-9, s"seed=$seed id=$id")
        case other              => fail(s"seed=$seed id=$id: $other")
      }
    }
  }

  test("kmeans assignment equals the naive snapped argmin on 10 seeded clouds") {
    for (seed <- 41 to 50) {
      val r = new Random(seed)
      val pts = (0 until 40).map(i =>
        (i.toLong, Array.fill(6)(r.nextDouble() * 10 - 5)))
      val cents = (0 until 3).map(c => c -> Array.fill(6)(r.nextDouble() * 10 - 5))
      def d2(a: Array[Double], b: Array[Double]) =
        a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      val expect = pts.map { case (id, p) =>
        id -> cents.minBy { case (cid, c) =>
          (math.round(d2(p, c) * 1e6), cid)
        }._1
      }.toMap
      val got = KMeans.assign(pts.toDF("id", "v"), "id", "v", cents)
        .select(col("id"), col("cluster")).collect()
        .map(r2 => r2.getLong(0) -> r2.getInt(1)).toMap
      assert(got == expect, s"seed=$seed")
    }
  }

  test("kmeans assignment plan has no exchange: the argmin is per-row") {
    val pts = (0 until 20).map(i => (i.toLong, Array(i.toDouble, 1.0)))
    val plan = KMeans.assign(pts.toDF("id", "v"), "id", "v",
        Seq(0 -> Array(0.0, 0.0), 1 -> Array(9.0, 1.0)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("Gumbel log-form sampling selects the ES set and survives extreme log weights") {
    // equivalence in the exp-safe range: same selected ids as ES on exp(logw)
    val r = new Random(7)
    val rows = (0 until 60).map(i => (i.toLong, r.nextDouble() * 8 - 4)) // logw in [-4,4]
    val df = rows.toDF("id", "logw").withColumn("w", exp(col("logw")))
    val es = graft.ops.Sampling.sampleWeighted(df, "id", "w", k = 15)
      .select("id").collect().map(_.getLong(0)).toSet
    val gm = graft.ops.Sampling.sampleWeightedLog(df, "id", "logw", k = 15)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(es == gm)
    // extreme log weights: exp-form would overflow/underflow; the log form
    // keeps all rows rankable and prefers the astronomically heavier ones
    val ext = Seq((1L, 1000.0), (2L, 900.0), (3L, -800.0), (4L, -900.0))
      .toDF("id", "logw")
    val top2 = graft.ops.Sampling.sampleWeightedLog(ext, "id", "logw", k = 2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(top2 == Set(1L, 2L))
  }

  test("tokens() matches the spec tokenizer on generated texts") {
    for (seed <- 51 to 60) {
      val docs = corpus(seed, 20)
      val got = docs.toDF("id", "text", "t")
        .select(col("id"), TextAnalysis.tokens(col("text")).as("tk"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
      docs.foreach { case (id, t, _) => assert(got(id) == toks(t)) }
    }
  }
}
