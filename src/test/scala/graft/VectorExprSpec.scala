package graft

import org.apache.spark.sql.functions._
import graft.{functions => gf}

/** Native dot/cosine kernels must be bit-identical to the HOF formulations
  * they replace (the DuckDB oracle reproduces the HOF math in SQL). */
class VectorExprSpec extends SparkSpec {

  private def vecs = {
    // float embeddings like the embeddings table; includes empty + null cases
    spark.sql(
      """SELECT * FROM VALUES
        |  (1, array(cast(1.5 as float), cast(-2.25 as float), cast(0.125 as float)),
        |      array(cast(0.5 as float), cast(4.0 as float), cast(-1.0 as float))),
        |  (2, array(cast(0.0 as float), cast(0.0 as float), cast(0.0 as float)),
        |      array(cast(1.0 as float), cast(2.0 as float), cast(3.0 as float))),
        |  (3, cast(array() as array<float>), cast(array() as array<float>)),
        |  (4, array(cast(1.0 as float), cast(null as float)),
        |      array(cast(1.0 as float), cast(2.0 as float))),
        |  (5, array(cast(1.0 as float)), array(cast(1.0 as float), cast(2.0 as float))),
        |  (6, cast(null as array<float>), array(cast(1.0 as float)))
        |AS t(id, a, b)""".stripMargin)
  }

  test("native dot equals HOF dot bit-for-bit (incl. null/empty/mismatch)") {
    val rows = vecs.select(col("id"),
      gf.dotProduct(col("a"), col("b")).as("native"),
      gf.dotProductHof(col("a"), col("b")).as("hof")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"null-ness mismatch id=${r.getInt(0)}")
      if (!r.isNullAt(1)) {
        val (n, h) = (r.getDouble(1), r.getDouble(2))
        assert(java.lang.Double.doubleToLongBits(n) == java.lang.Double.doubleToLongBits(h),
          s"value mismatch id=${r.getInt(0)}: $n vs $h")
      }
    }
  }

  test("native cosine equals HOF cosine bit-for-bit (non-degenerate rows)") {
    // ids 2 and 3 have zero norms: the HOF Divide throws under ANSI mode,
    // the native kernel gives IEEE NaN (checked in the next test)
    val rows = vecs.filter(!col("id").isin(2, 3)).select(col("id"),
      gf.cosineSimilarity(col("a"), col("b")).as("native"),
      gf.cosineSimilarityHof(col("a"), col("b")).as("hof")).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"null-ness mismatch id=${r.getInt(0)}")
      if (!r.isNullAt(1)) {
        val (n, h) = (r.getDouble(1), r.getDouble(2))
        assert(java.lang.Double.doubleToLongBits(n) == java.lang.Double.doubleToLongBits(h),
          s"value mismatch id=${r.getInt(0)}: $n vs $h")
      }
    }
  }

  test("native cosine is IEEE NaN on zero-norm/empty vectors (no ANSI throw)") {
    val rows = vecs.filter(col("id").isin(2, 3))
      .select(col("id"), gf.cosineSimilarity(col("a"), col("b")).as("native")).collect()
    assert(rows.length == 2)
    rows.foreach(r => assert(r.getDouble(1).isNaN, s"id=${r.get(0)} not NaN"))
  }

  test("cosine stays inside a codegen stage over a range source") {
    val df = spark.range(50)
      .select(transform(sequence(lit(0), lit(7)),
        i => (i + col("id")).cast("float")).as("a"))
      .select(col("a"), reverse(col("a")).as("b"))
    val tree = df.select(gf.cosineSimilarity(col("a"), col("b")).as("c"))
      .queryExecution.executedPlan.toString
    assert(tree.linesIterator.exists(l => l.contains("graft_cosine") && l.contains("*(")),
      s"graft_cosine not inside a codegen stage:\n$tree")
  }
}
