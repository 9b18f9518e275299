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

  test("contains_any / extract_many / find_many match their regex formulations on real data") {
    val pats = QueriesMisc6.scrubPairs.take(8).map(_._1)
    val alt = pats.mkString("(", "|", ")")
    val docs = util.t(spark, "/root/testdata/sf0.01", "documents")
    val mismatched = docs.select(
      gf.containsAny(col("text"), pats).as("ca"),
      (coalesce(length(regexp_extract(col("text"), alt, 1)), lit(0)) > 0).as("ca_re"),
      gf.extractMany(col("text"), pats).as("em"),
      expr(s"regexp_extract_all(text, '$alt', 1)").as("em_re"),
      gf.findMany(col("text"), pats).as("fm"))
      .filter(!(col("ca") <=> col("ca_re")) || !(col("em") <=> col("em_re")))
      .count()
    assert(mismatched == 0)
  }

  test("extract/find overlapping and edge semantics") {
    val df = spark.sql("SELECT 'Samwise met Sam and samWISE' AS s")
    def em(pats: Seq[String], ov: Boolean, ci: Boolean = false): Seq[String] =
      df.select(gf.extractMany(col("s"), pats, ci, ov).as("r"))
        .head().getSeq[String](0)
    def fm(pats: Seq[String], ov: Boolean): Seq[Int] =
      df.select(gf.findMany(col("s"), pats, overlapping = ov).as("r"))
        .head().getSeq[Int](0)

    // non-overlapping leftmost-first: 'Sam' consumes, 'Samwise' never matches
    assert(em(Seq("Sam", "Samwise"), ov = false) == Seq("Sam", "Sam"))
    // listed first, the longer pattern wins at position 0
    assert(em(Seq("Samwise", "Sam"), ov = false) == Seq("Samwise", "Sam"))
    // overlapping reports both, ordered by (end, pattern index)
    assert(em(Seq("Sam", "Samwise"), ov = true) == Seq("Sam", "Samwise", "Sam"))
    // find_many returns byte offsets
    assert(fm(Seq("Sam", "Samwise"), ov = false) == Seq(0, 12))
    assert(fm(Seq("Sam", "Samwise"), ov = true) == Seq(0, 0, 12))
    // ascii case-insensitive extracts the INPUT slice, not the pattern
    assert(em(Seq("samwise"), ov = false, ci = true) == Seq("Samwise", "samWISE"))
    // null in, null out; no patterns present -> empty list
    val edge = spark.sql("SELECT cast(null as string) AS s")
      .select(gf.extractMany(col("s"), Seq("x")).as("r")).head()
    assert(edge.isNullAt(0))
    assert(df.select(gf.extractMany(col("s"), Seq("zzz")).as("r"))
      .head().getSeq[String](0).isEmpty)
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
