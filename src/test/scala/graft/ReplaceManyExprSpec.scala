package graft

import org.apache.spark.sql.functions._
import graft.{functions => gf}
import graft.queries.util
import graft.queries.QueriesMisc6

/** Native single-pass replace_many: equivalence with the chained form where
  * semantics coincide, and the reference's leftmost-first behavior where
  * they don't. */
class ReplaceManyExprSpec extends SparkSpec {

  test("native equals chained on the real documents table (20 patterns, both SFs)") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val docs = util.t(spark, dir, "documents")
      val mismatched = docs.select(
        gf.replaceMany(col("text"), QueriesMisc6.scrubPairs).as("native"),
        gf.replaceManyChained(col("text"), QueriesMisc6.scrubPairs).as("chained"))
        .filter(!(col("native") <=> col("chained")))
        .count()
      assert(mismatched == 0, s"$dir: $mismatched rows differ")
    }
  }

  test("leftmost-first semantics match the reference (aho-corasick LeftmostFirst)") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (1, 'Samwise'),
        |  (2, 'abc'),
        |  (3, 'ababab'),
        |  (4, cast(null as string)),
        |  (5, ''),
        |  (6, 'no match here!'),
        |  (7, 'Ünïcode straße ab über')
        |AS t(id, s)""".stripMargin)

    // same start position: FIRST-listed pattern wins, not longest
    val firstWins = df.select(col("id"),
      gf.replaceMany(col("s"), Seq("Sam" -> "X", "Samwise" -> "Y")).as("r"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(firstWins(1) == "Xwise")

    // longest wins only when listed first
    val longestFirst = df.select(col("id"),
      gf.replaceMany(col("s"), Seq("Samwise" -> "Y", "Sam" -> "X")).as("r"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(longestFirst(1) == "Y")

    // replacement text is never rescanned: a->b then b->c maps ab to bc
    // (the chained form would produce cc)
    val noRescan = df.select(col("id"),
      gf.replaceMany(col("s"), Seq("a" -> "b", "b" -> "c")).as("r"))
      .collect().map(r => r.getInt(0) -> Option(r.getString(1))).toMap
    assert(noRescan(2) == Some("bcc"))
    assert(noRescan(3) == Some("bcbcbc"))
    assert(noRescan(4).isEmpty)   // null in, null out
    assert(noRescan(5) == Some(""))
    assert(noRescan(6) == Some("no mbtch here!"))

    // leftmost wins across positions; overlap is consumed
    val overlap = df.select(col("id"),
      gf.replaceMany(col("s"), Seq("bc" -> "1", "ab" -> "2")).as("r"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(overlap(2) == "2c") // "ab" at 0 beats "bc" at 1 despite list order

    // utf-8 safety: multibyte text round-trips, ascii pattern inside it works
    val uni = df.filter(col("id") === 7).select(
      gf.replaceMany(col("s"), Seq("ab" -> "_", "straße" -> "St")).as("r"))
      .head().getString(0)
    assert(uni == "Ünïcode St _ über")
  }

  test("ascii case-insensitive flag folds ASCII letters only") {
    val r = spark.sql("SELECT 'FooBAR fooBar straße' AS s")
      .select(gf.replaceMany(col("s"),
        Seq("foobar" -> "X", "strasse" -> "Y"), asciiCaseInsensitive = true).as("r"))
      .head().getString(0)
    assert(r == "X X straße") // ß is not ASCII: strasse must NOT match straße
  }

  test("replace_many stays inside a codegen stage") {
    val tree = spark.range(100)
      .select(concat(lit("the quick fox "), col("id").cast("string")).as("s"))
      .select(gf.replaceMany(col("s"), Seq("quick" -> "slow", "fox" -> "dog")).as("r"))
      .queryExecution.executedPlan.toString
    assert(tree.linesIterator.exists(l => l.contains("graft_replace_many") && l.contains("*(")),
      s"graft_replace_many not inside a codegen stage:\n$tree")
  }
}
